"""Window-frame operators vs DuckDB on CRAFTED edge cases the driver
fixture cannot guarantee: duplicate timestamps inside one user (RANGE
peers), events exactly one hour apart (frame boundary inclusivity), and
negative values."""

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def events_dir(tmp_path):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes, seconds=0):
        return t0 + datetime.timedelta(minutes=minutes, seconds=seconds)

    rows = [
        # user 1: a tie pair (same ts), an exactly-1h-later event, and one
        # just outside the trailing hour
        (1, ts(0), 1, 10.0),
        (2, ts(0), 1, -2.5),          # peer of event 1 (RANGE includes it)
        (3, ts(60), 1, 7.004),        # exactly 1h after the tie pair
        (4, ts(120, 1), 1, 3.0),      # 60m01s after event 3 → alone
        # user 2: a NULL value first (SUM OVER skips it; the engine must
        # not NaN-poison the prefix sums), then a real value
        (5, ts(5), 2, None),
        (6, ts(10), 2, 0.005),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def _oracle(events_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{events_dir}/events.parquet')"
    )
    return (
        con.execute(sql).fetchdf().sort_values("event_id").reset_index(drop=True)
    )


def _run(fn, events_dir):
    df = fn(events_dir).to_pandas().sort_values("event_id").reset_index(drop=True)
    return df


def test_funnel_window_boundaries(ray_session, tmp_path):
    """Funnel conversion edges vs DuckDB: a view exactly 1h before the
    click converts (closed window), a view AFTER the click does not, and a
    simultaneous view converts."""
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes, seconds=0):
        return t0 + datetime.timedelta(minutes=minutes, seconds=seconds)

    rows = [
        (1, ts(0), 1, "view"), (2, ts(60), 1, "click"),     # exactly 1h → converts
        (3, ts(0), 2, "click"), (4, ts(1), 2, "view"),      # view after → no
        (5, ts(5), 3, "view"), (6, ts(5), 3, "click"),      # simultaneous → yes
        (7, ts(0), 4, "view"), (8, ts(60, 1), 4, "click"),  # 1h01s → no
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    from camden_ray.pipelines.queries import ORACLE_SQL, events_funnel

    got = (
        events_funnel(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = (
        con.execute(ORACLE_SQL["events_funnel"])
        .fetchdf()
        .sort_values("user_id")
        .reset_index(drop=True)[got.columns]
    )
    for c in got.columns:
        got[c] = got[c].astype(want[c].dtype)
    assert got.equals(want)
    conv = dict(zip(got.user_id, got.converted))
    assert conv == {1: 1, 2: 0, 3: 1, 4: 0}


def test_cumsum_ties_and_negatives(ray_session, events_dir):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_user_cumsum

    got = _run(events_user_cumsum, events_dir)
    want = _oracle(events_dir, ORACLE_SQL["events_user_cumsum"])
    want = want[got.columns]
    for c in got.columns:
        got[c] = got[c].astype(want[c].dtype)
    assert got.equals(want)
    # tie pair ordered by event_id: event 2's running sum includes event 1
    assert got.loc[got.event_id == 2, "cum_value_cents"].item() == 1000 - 250
    # NULL value: its own running sum is 0 (not INT64_MIN), later rows sane
    assert got.loc[got.event_id == 5, "cum_value_cents"].item() == 0
    assert got.loc[got.event_id == 6, "cum_value_cents"].item() == 1


def test_range_window_peers_and_boundaries(ray_session, events_dir):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_user_window

    got = _run(events_user_window, events_dir)
    want = _oracle(events_dir, ORACLE_SQL["events_user_window"])
    want = want[got.columns]
    for c in got.columns:
        got[c] = got[c].astype(want[c].dtype)
    assert got.equals(want)
    by_id = got.set_index("event_id")
    # RANGE peers: BOTH tie events see each other (w_cnt 2), regardless of
    # the (ts, event_id) sort order
    assert by_id.loc[1, "w_cnt"] == 2 and by_id.loc[2, "w_cnt"] == 2
    # exactly 1h back is INSIDE the frame (BETWEEN ... PRECEDING is closed)
    assert by_id.loc[3, "w_cnt"] == 3
    # 60m01s back is outside
    assert by_id.loc[4, "w_cnt"] == 1
