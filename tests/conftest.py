import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir():
    from camden_ray.fixture import ensure_fixture

    return ensure_fixture(300)


@pytest.fixture(scope="session")
def webtext_path(fixture_dir):
    return os.path.join(fixture_dir, "webtext")


@pytest.fixture(scope="session")
def dedup_result(webtext_path):
    """One shared full-pipeline run on the tiny fixture (html extraction on)."""
    from camden_ray.config import DedupConfig
    from camden_ray.pipelines.dedup import run_dedup

    return run_dedup(webtext_path, DedupConfig(), extract=True)
