"""Multimodal stage: real Ray plumbing, stubbed decode kernel."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from camden_ray.stages.multimodal import FEATURE_DIM, MediaDecoderActor, media_features


def _media_table() -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array([b"\x00\xff" * 50, b"hello world", b""], type=pa.binary()),
            "media_type": pa.array(["image", "audio", "video"], type=pa.string()),
        }
    )


def test_fake_decoder_schema_and_determinism(ray_session):
    ds = ray.data.from_arrow(_media_table())
    out1 = media_features(ds, concurrency=(1, 2)).to_pandas().sort_values("media_id")
    out2 = media_features(ds, concurrency=(1, 2)).to_pandas().sort_values("media_id")
    assert list(out1.columns) == [
        "media_id", "media_type", "n_bytes", "digest", "feature",
        "feature_hist",
    ]
    assert out1["n_bytes"].tolist() == [100, 11, 0]
    # deterministic across runs (and across actor processes)
    for c in ["digest", "n_bytes"]:
        assert out1[c].tolist() == out2[c].tolist()
    f1 = np.stack(out1["feature"].to_numpy())
    f2 = np.stack(out2["feature"].to_numpy())
    assert f1.shape == (3, FEATURE_DIM)
    assert np.array_equal(f1, f2)
    # feature of b"\x00\xff"*50: half the bytes in bucket 0, half in bucket 15
    assert f1[0][0] == pytest.approx(0.5)
    assert f1[0][15] == pytest.approx(0.5)
    # empty payload → zero vector, digest 0
    assert np.array_equal(f1[2], np.zeros(FEATURE_DIM))


def test_real_decoder_is_stubbed():
    actor = MediaDecoderActor(decoder="pil")
    with pytest.raises(NotImplementedError):
        actor(_media_table())
    with pytest.raises(ValueError):
        MediaDecoderActor(decoder="nope")
