"""Round-4 session-6 operators vs DuckDB on CRAFTED edge cases: LAG null
semantics and tie ordering, pivot zero cells, anti-join three-way customer
split, KMV sketch exact-below-k regime, heavy-hitter strict threshold
boundary, and stopword-strip whitespace/null handling."""

import datetime
import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _oracle(d, sql, views=("events",)):
    con = duckdb.connect()
    for v in views:
        con.execute(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{d}/{v}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _eq(got, want, key):
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)[got.columns]
    for c in got.columns:
        got[c] = got[c].astype(want[c].dtype)
    assert got.equals(want), f"\ngot:\n{got}\nwant:\n{want}"
    return got


@pytest.fixture()
def lag_events_dir(tmp_path):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ts(seconds):
        return t0 + datetime.timedelta(seconds=seconds)

    rows = [
        # user 1: tie pair (gap 0 for the second, ordered by event_id),
        # then a 90-second gap
        (1, ts(0), 1, 10.0),
        (2, ts(0), 1, 2.5),
        (3, ts(90), 1, 7.0),
        # user 2: NULL value first (the follower's prev_value_cents must be
        # NULL, not 0), single-event users get all-NULL lag columns
        (4, ts(5), 2, None),
        (5, ts(6), 2, 1.0),
        (6, ts(7), 3, 4.0),
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


def test_user_lag_nulls_and_ties(ray_session, lag_events_dir):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_user_lag

    got = events_user_lag(lag_events_dir).to_pandas()
    want = _oracle(lag_events_dir, ORACLE_SQL["events_user_lag"])
    got = _eq(got, want, "event_id")
    by_id = got.set_index("event_id")
    # first row per user: both lag columns NULL
    for eid in (1, 4, 6):
        assert np.isnan(by_id.loc[eid, "gap_us"])
        assert np.isnan(by_id.loc[eid, "prev_value_cents"])
    # tie pair: event 2 follows event 1 (event_id tiebreak), gap 0
    assert by_id.loc[2, "gap_us"] == 0
    assert by_id.loc[2, "prev_value_cents"] == 1000
    assert by_id.loc[3, "gap_us"] == 90_000_000
    # a NULL previous VALUE stays NULL even though the previous ROW exists
    assert by_id.loc[5, "gap_us"] == 1_000_000
    assert np.isnan(by_id.loc[5, "prev_value_cents"])


def test_pivot_zero_cells_and_absent_hours(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_pivot

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, t0.replace(hour=3), "view"),
        (2, t0.replace(hour=3), "view"),
        (3, t0.replace(hour=3), "click"),
        (4, t0.replace(hour=17), "error"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = events_pivot(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_pivot"])
    got = _eq(got, want, "hour")
    # hours with no events are dropped (GROUP BY semantics), zero cells kept
    assert sorted(got["hour"]) == [3, 17]
    h3 = got.set_index("hour").loc[3]
    assert h3["n_total"] == 3 and h3["n_view"] == 2 and h3["n_click"] == 1
    assert h3["n_error"] == 0 and h3["n_purchase"] == 0


def test_customers_without_orders_three_way(ray_session, tmp_path):
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        customers_without_orders,
    )

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"], pa.string()),
            "c_mktsegment": pa.array(["S1", "S1", "S2"], pa.string()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11], pa.int64()),
            "o_custkey": pa.array([1, 2], pa.int64()),
            # cust 1 has an urgent order, cust 2 only a non-urgent one,
            # cust 3 none at all → 2 and 3 survive the anti-join
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"], pa.string()),
        }
    )
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = customers_without_orders(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path),
        ORACLE_SQL["customers_without_orders"],
        views=("customer", "orders"),
    )
    got = _eq(got, want, "c_custkey")
    assert sorted(got["c_custkey"]) == [2, 3]


def test_kmv_exact_below_k_and_estimate(ray_session, tmp_path):
    from camden_ray.pipelines.queries import (
        _KMV_K,
        ORACLE_SQL,
        events_approx_distinct,
    )

    def write(users):
        t = pa.table(
            {
                "event_id": pa.array(range(len(users)), pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2026, 1, 1)] * len(users),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(["view"] * len(users), pa.string()),
                "value": pa.array([1.0] * len(users), pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")

    # below k distinct: the sketch IS the exact distinct set
    write([7, 7, 8, 9, 9, 9])
    got = events_approx_distinct(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_approx_distinct"])
    _eq(got, want, "k")
    assert got["est"].item() == 3

    # above k: estimate matches the oracle bit-for-bit and lands within the
    # KMV error envelope (~1/sqrt(64) ≈ 12.5%; generous band for one draw)
    write(list(range(1000)) * 2)
    got = events_approx_distinct(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_approx_distinct"])
    _eq(got, want, "k")
    assert 600 <= got["est"].item() <= 1600


def test_heavy_hitters_strict_threshold(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, corpus_heavy_hitters

    # 1000 tokens total: "hot" ×10 (10·500 > 1000 → heavy), "edge" ×2
    # (2·500 == 1000 → strictly NOT heavy), 988 distinct cold fillers
    words = ["hot"] * 10 + ["edge"] * 2 + [f"w{i}" for i in range(988)]
    rng = np.random.default_rng(7)
    rng.shuffle(words)
    docs, step = [], 50
    for i in range(0, len(words), step):
        docs.append(" ".join(words[i : i + step]))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = corpus_heavy_hitters(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path), ORACLE_SQL["corpus_heavy_hitters"], views=("documents",)
    )
    got = _eq(got, want, "tk")
    assert list(got["tk"]) == ["hot"] and got["cnt"].item() == 10


def test_stopword_strip_boundaries(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, doc_stopword_strip

    texts = [
        "the cat in a hat",          # leading stopword + interior runs
        "theory is not a math",      # \b: 'theory'/'math' untouched
        "a the an of",               # all-stopword → empty string
        "",                          # empty
        None,                        # null → treated as ''
        "x  the   y",                # pre-existing space runs collapse
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = doc_stopword_strip(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path), ORACLE_SQL["doc_stopword_strip"], views=("documents",)
    )
    got = _eq(got, want, "doc_id")
    by_id = got.set_index("doc_id")

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert by_id.loc[0, "clean_md5"] == md5("cat hat")
    assert by_id.loc[0, "n_removed"] == 3
    assert by_id.loc[1, "clean_md5"] == md5("theory not math")
    assert by_id.loc[2, "clean_md5"] == md5("")
    assert by_id.loc[4, "clean_md5"] == md5("")
    assert by_id.loc[5, "clean_md5"] == md5("x y")


def test_rollup_levels(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, orders_priority_rollup

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
            "o_orderpriority": pa.array(
                ["1-URGENT", "1-URGENT", "1-URGENT", "5-LOW"], pa.string()
            ),
            "o_orderstatus": pa.array(["O", "F", "O", "O"], pa.string()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.5], pa.float64()),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = orders_priority_rollup(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path), ORACLE_SQL["orders_priority_rollup"], views=("orders",)
    )
    got = _eq(got, want, ["o_orderpriority", "o_orderstatus", "n"])
    # grand total row: both group columns NULL
    grand = got[got.o_orderpriority.isna() & got.o_orderstatus.isna()]
    assert len(grand) == 1 and grand.n.item() == 4
    assert grand.sum_cents.item() == 6550
    # per-priority subtotal for 1-URGENT sums its two status rows
    sub = got[(got.o_orderpriority == "1-URGENT") & got.o_orderstatus.isna()]
    assert sub.n.item() == 3 and sub.sum_cents.item() == 6000


def test_value_rank_ties_and_nulls(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_value_rank

    t0 = datetime.datetime(2026, 1, 1)
    vals = [5.0, 5.0, 7.0, None, None, 1.0]
    t = pa.table(
        {
            "event_id": pa.array(range(1, 7), pa.int64()),
            "ts": pa.array([t0] * 6, pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(["view"] * 6, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = events_value_rank(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_value_rank"])
    got = _eq(got, want, "event_id")
    by_id = got.set_index("event_id")
    # ties share a rank, RANK leaves a gap, DENSE_RANK does not
    assert by_id.loc[1, "value_rank"] == by_id.loc[2, "value_rank"] == 2
    assert by_id.loc[3, "value_rank"] == 4
    assert by_id.loc[3, "value_dense_rank"] == 3
    # NULLs sort last and are peers of each other
    assert by_id.loc[4, "value_rank"] == by_id.loc[5, "value_rank"] == 5
    assert by_id.loc[4, "value_dense_rank"] == 4
    assert by_id.loc[6, "value_rank"] == 1


def test_anti_join_distributed_fallback_parity(ray_session, tmp_path, monkeypatch):
    """Forcing the broadcast cap to 0 routes the anti-join through the
    distributed hash_join path; the result must be identical (the house
    cap-fallback contract)."""
    import camden_ray.pipelines.queries as q

    rng = np.random.default_rng(31)
    nc = 60
    cust = pa.table(
        {
            "c_custkey": pa.array(range(nc), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(nc)], pa.string()),
            "c_mktsegment": pa.array(["S"] * nc, pa.string()),
        }
    )
    ck = rng.integers(0, nc, size=200)
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(200), pa.int64()),
            "o_custkey": pa.array(ck, pa.int64()),
            "o_orderpriority": pa.array(
                np.where(rng.random(200) < 0.3, "1-URGENT", "5-LOW")
            ),
        }
    )
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")

    def run():
        return (
            q.customers_without_orders(str(tmp_path))
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )

    broadcast = run()
    monkeypatch.setattr(q, "_ANTI_BROADCAST_MAX_KEYS", 0)
    distributed = run()
    assert len(broadcast) > 0
    assert broadcast.equals(distributed)


def test_embedding_dim_stats_crafted(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, embedding_dim_stats

    embs = [
        [0.5, -1.25, 3.0],
        [1.5, 2.75, -0.5],
        [-2.0, 0.0, 1.0],
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(3), pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array([0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = embedding_dim_stats(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path), ORACLE_SQL["embedding_dim_stats"], views=("embeddings",)
    )
    got = _eq(got, want, "dim")
    by_dim = got.set_index("dim")
    assert by_dim.loc[1, "sum_fp"] == 0  # 0.5 + 1.5 - 2.0
    assert by_dim.loc[2, "min_fp"] == -1_250_000
    assert by_dim.loc[2, "max_fp"] == 2_750_000
    assert (by_dim["n"] == 3).all()


def test_rollup_empty_input_grand_total(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, orders_priority_rollup

    orders = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_orderpriority": pa.array([], pa.string()),
            "o_orderstatus": pa.array([], pa.string()),
            "o_totalprice": pa.array([], pa.float64()),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = orders_priority_rollup(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path), ORACLE_SQL["orders_priority_rollup"], views=("orders",)
    )
    # SQL ROLLUP emits the () grouping set even over an empty table
    assert len(got) == len(want) == 1
    assert got["n"].item() == 0 and pd_isna(got["sum_cents"].item())


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_value_rank_nan_vs_null_distinct_peers(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_value_rank

    t0 = datetime.datetime(2026, 1, 1)
    vals = [float("nan"), None, float("nan"), 2.0]
    t = pa.table(
        {
            "event_id": pa.array(range(1, 5), pa.int64()),
            "ts": pa.array([t0] * 4, pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["view"] * 4, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = events_value_rank(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_value_rank"])
    got = _eq(got, want, "event_id")
    by_id = got.set_index("event_id")
    # number < NaN-peers < NULL: three distinct peer groups
    assert by_id.loc[4, "value_rank"] == 1
    assert by_id.loc[1, "value_rank"] == by_id.loc[3, "value_rank"] == 2
    assert by_id.loc[2, "value_rank"] == 4
    assert by_id.loc[2, "value_dense_rank"] == 3


def test_anti_join_null_keys_not_exists(ray_session, tmp_path):
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        customers_without_orders,
    )

    cust = pa.table(
        {
            "c_custkey": pa.array([1, None, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"], pa.string()),
            "c_mktsegment": pa.array(["S"] * 3, pa.string()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11], pa.int64()),
            "o_custkey": pa.array([1, None], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"], pa.string()),
        }
    )
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = customers_without_orders(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path),
        ORACLE_SQL["customers_without_orders"],
        views=("customer", "orders"),
    )
    # NOT EXISTS: the null-key customer and cust 3 survive; a null-key
    # urgent order matches nobody
    got = _eq(got, want, ["c_name"])
    assert sorted(got["c_name"]) == ["b", "c"]


def test_hash_join_plan_time_validation(ray_session):
    import ray.data
    from camden_ray.stages.cojoin import hash_join

    li = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    )
    rs = ray.data.from_arrow(
        pa.table({"k": pa.array(["x"], pa.string()), "w": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError, match="type mismatch"):
        hash_join(li, rs, on="k")
    ri = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "w": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError, match="meaningless"):
        hash_join(li, ri, on="k", how="anti", right_unique_by="w")


def test_supplier_nation_revenue_inner_semantics(ray_session, tmp_path):
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        supplier_nation_revenue,
    )

    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_suppkey": pa.array([10, 10, 11, 99], pa.int64()),  # 99 orphan
            "l_extendedprice": pa.array([100.0, 50.5, 7.25, 1000.0]),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array([10, 11, 12], pa.int64()),  # 12: no sales
            "s_name": pa.array(["sa", "sb", "sc"], pa.string()),
            "s_nationkey": pa.array([1, 2, 1], pa.int64()),
            "s_acctbal": pa.array([0.0, 0.0, 0.0]),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([1, 2], pa.int64()),
            "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
            "n_regionkey": pa.array([0, 0], pa.int64()),
        }
    )
    for name, t in [("lineitem", lineitem), ("supplier", supplier), ("nation", nation)]:
        pq.write_table(t, tmp_path / f"{name}.parquet")
    got = supplier_nation_revenue(str(tmp_path)).to_pandas()
    want = _oracle(
        str(tmp_path),
        ORACLE_SQL["supplier_nation_revenue"],
        views=("lineitem", "supplier", "nation"),
    )
    got = _eq(got, want, "n_name")
    by = got.set_index("n_name")
    # orphan suppkey 99 dropped (inner), supplier 12 has no sales row
    assert by.loc["ALPHA", "n_suppliers"] == 1
    assert by.loc["ALPHA", "sum_price_cents"] == 15050
    assert by.loc["BETA", "sum_price_cents"] == 725


def test_user_setops_three_way(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, events_user_setops

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (1, 1, "view"), (2, 1, "purchase"),       # both
        (3, 2, "view"), (4, 2, "click"),          # view_only (click ignored)
        (5, 3, "purchase"),                       # purchase_only
        (6, 4, "error"),                          # in neither set → absent
        (7, None, "view"),                        # NULL user → excluded
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = events_user_setops(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_user_setops"])
    got = _eq(got, want, "user_id")
    assert dict(zip(got.user_id, got.set_op)) == {
        1: "both", 2: "view_only", 3: "purchase_only"
    }


def test_orders_monthly_boundaries(ray_session, tmp_path):
    from camden_ray.pipelines.queries import ORACLE_SQL, orders_monthly

    ts = [
        datetime.datetime(2025, 12, 31, 23, 59, 59),
        datetime.datetime(2026, 1, 1, 0, 0, 0),
        datetime.datetime(2026, 1, 31, 12, 0, 0),
    ]
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(3), pa.int64()),
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
            "o_orderdate": pa.array(ts, pa.timestamp("us")),
            "o_totalprice": pa.array([10.005, 20.0, 30.0], pa.float64()),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    got = orders_monthly(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["orders_monthly"], views=("orders",))
    got = _eq(got, want, "ym")
    by = got.set_index("ym")
    # year boundary: Dec 31 23:59:59 is its own month bucket
    assert by.loc[202512, "n"] == 1 and by.loc[202601, "n"] == 2
    assert by.loc[202601, "sum_cents"] == 5000


def test_quantile_cont_matches_native(ray_session, tmp_path):
    """The integer closed form ×100 equals DuckDB's native float
    quantile_cont ×100 on a fractional-position fixture, and handles
    n=1 and NULL lengths."""
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        corpus_chars_quantile_cont,
    )

    # 10 non-null values → p = q·9 has remainder r=50/r=10, so the
    # INTERPOLATION branch is exercised against native quantile_cont
    lens = [3, 1, 4, 1, 5, 9, 2, 6, 5, 7, None]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(lens)), pa.int64()),
            "text": pa.array(["x"] * len(lens), pa.string()),
            "n_chars": pa.array(lens, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = corpus_chars_quantile_cont(str(tmp_path))
    want = _oracle(
        str(tmp_path),
        ORACLE_SQL["corpus_chars_quantile_cont"],
        views=("documents",),
    )
    _eq(got.copy(), want, "n_docs")
    con = duckdb.connect()
    native50, native90 = con.execute(
        "SELECT quantile_cont(x, 0.5), quantile_cont(x, 0.9) FROM "
        "(SELECT unnest(?) AS x)",
        [[v for v in lens if v is not None]],
    ).fetchone()
    assert got["p50_x100"].item() == round(native50 * 100)
    assert got["p90_x100"].item() == round(native90 * 100)

    pq.write_table(t.slice(0, 1), tmp_path / "documents.parquet")
    one = corpus_chars_quantile_cont(str(tmp_path))
    assert one["n_docs"].item() == 1 and one["p50_x100"].item() == 300


def test_user_first_last_tiebreak(ray_session, lag_events_dir):
    """Simultaneous first events resolve by event_id (deterministic
    FIRST_VALUE), single-event users are their own first AND last."""
    from camden_ray.pipelines.queries import (
        ORACLE_SQL,
        events_user_first_last,
    )
    import pyarrow.parquet as pqq

    # reuse the lag fixture but give the tie pair distinct types
    t = pqq.read_table(f"{lag_events_dir}/events.parquet")
    types = ["view", "click", "purchase", "view", "error", "signup"]
    t = t.append_column("event_type", pa.array(types, pa.string()))
    pqq.write_table(t, f"{lag_events_dir}/events.parquet")
    got = events_user_first_last(lag_events_dir).to_pandas()
    want = _oracle(lag_events_dir, ORACLE_SQL["events_user_first_last"])
    got = _eq(got, want, "user_id")
    by = got.set_index("user_id")
    # tie at t0: event_id 1 ("view") wins first place over event_id 2
    assert by.loc[1, "first_type"] == "view"
    assert by.loc[1, "last_type"] == "purchase" and by.loc[1, "n"] == 3
    assert by.loc[3, "first_type"] == by.loc[3, "last_type"] == "signup"
    assert by.loc[3, "first_ts_us"] == by.loc[3, "last_ts_us"]


def test_user_path_null_skip(ray_session, tmp_path):
    """string_agg semantics: null elements skipped without separator,
    all-null group → NULL path, count still counts every row."""
    from camden_ray.pipelines.queries import ORACLE_SQL, events_user_path

    t0 = datetime.datetime(2026, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        (1, ts(0), 1, "view"), (2, ts(1), 1, None), (3, ts(2), 1, "click"),
        (4, ts(0), 2, None),                       # all-null user
        (5, ts(0), 3, "b"), (6, ts(0), 3, "a"),    # tie → event_id order
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
    got = events_user_path(str(tmp_path)).to_pandas()
    want = _oracle(str(tmp_path), ORACLE_SQL["events_user_path"])
    got = _eq(got, want, "user_id")
    by = got.set_index("user_id")
    assert by.loc[1, "path"] == "view>click" and by.loc[1, "n"] == 3
    assert by.loc[2, "path"] is None or pd_isna(by.loc[2, "path"])
    assert by.loc[3, "path"] == "b>a"
