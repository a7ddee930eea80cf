"""Relational + windowed operators over the driver tables.

The reference has NO joins/windows (SURVEY.md §2 "Categories with NO reference
implementation") — these are the operations a training-data pipeline needs
around the dedup core, each expressed with the partitioning pattern that
survives 100 TB:

* broadcast join   — small dimension side ``ray.put`` once, looked up inside
                     ``map_batches`` (never a shuffle, never re-shipped per
                     batch): :func:`orders_by_segment`,
                     :func:`customer_region_counts`.
* shuffle join     — both sides large: native ``Dataset.join`` hash shuffle:
                     :func:`lineitem_part_revenue`.
* sessionization   — per-key ordered window with gap break: hash-partition by
                     user into coarse partitions, ONE Arrow-native vectorized
                     pass per partition (same physical plan as
                     stages/candidates.py): :func:`events_sessions`.
* count-distinct   — groupby-key then count groups (distributed; never a
                     driver-side set): :func:`events_distinct_users`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from camden_ray.pipelines.common import cents, read_table, table_path

SESSION_GAP_MIN = 30


def orders_by_segment(sf_dir: str):
    """Revenue per market segment: broadcast-join orders ⨝ customer.

    customer is the small side: loaded once on the driver, ``ray.put`` as a
    custkey→segment dict, read zero-copy from the local object store by every
    map task.
    """
    import pyarrow.compute as pc

    cust = pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    # broadcast the two Arrow arrays, not a Python dict: the lookup inside
    # each task is then pc.index_in + take (C kernels, no per-row dict gets)
    seg_ref = ray.put(
        (cust["c_custkey"].combine_chunks(), cust["c_mktsegment"].combine_chunks())
    )

    def add_segment(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(seg_ref)
        idx = pc.index_in(t["o_custkey"], value_set=keys)
        return pa.table(
            {
                "c_mktsegment": vals.take(idx),
                "price_cents": cents(t["o_totalprice"]),
            }
        )

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    return ds.map_batches(add_segment, batch_format="pyarrow").groupby(
        "c_mktsegment"
    ).aggregate(
        Count(alias_name="n_orders"), Sum("price_cents", alias_name="sum_cents")
    )


def customer_region_counts(sf_dir: str):
    """Customers per region: two chained broadcast lookups (nation, region
    are tiny dimensions — a shuffle join would be wasteful at any scale)."""
    nation = pq.read_table(
        table_path(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        table_path(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    )
    import pyarrow.compute as pc

    # pre-compose nation→region-name on the driver (both dims are tiny),
    # broadcast as Arrow arrays; per-task lookup is index_in + take
    nkeys = nation["n_nationkey"].combine_chunks()
    nreg = nation["n_regionkey"].combine_chunks()
    ridx = pc.index_in(nreg, value_set=region["r_regionkey"].combine_chunks())
    n2name = region["r_name"].combine_chunks().take(ridx)
    lookup_ref = ray.put((nkeys, n2name))

    def add_region(t: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        idx = pc.index_in(t["c_nationkey"], value_set=keys)
        return pa.table({"r_name": names.take(idx)})

    ds = read_table(sf_dir, "customer", columns=["c_nationkey"])
    return ds.map_batches(add_region, batch_format="pyarrow").groupby(
        "r_name"
    ).aggregate(Count(alias_name="n_cust"))


def lineitem_part_revenue(sf_dir: str):
    """Discounted revenue per part brand: native hash-shuffle join (both
    sides non-trivial), columns pruned and revenue pre-computed BEFORE the
    join so the shuffle moves 2 columns, not 11."""

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_partkey": t["l_partkey"], "rev_cents": cents(rev)})

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(prep, batch_format="pyarrow")
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = li.join(
        part,
        join_type="inner",
        num_partitions=16,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    return joined.groupby("p_brand").aggregate(
        Count(alias_name="n_items"), Sum("rev_cents", alias_name="sum_rev_cents")
    )


def orders_top_revenue(sf_dir: str):
    """TPC-H Q3-shaped three-table pipeline: top-10 unshipped-revenue orders
    for one market segment before a date cutoff. Composes BOTH join
    strategies where each belongs: the filtered customer key set is a
    broadcast SEMI-join into the orders scan (dimension-sized, never
    shuffled), then orders ⨝ lineitem runs as a native hash-shuffle join
    with lineitem pre-reduced to (l_orderkey, rev_cents) — the shuffle
    moves 2 columns. The final top-K is a skinny order-grain aggregate →
    sort → limit with a deterministic (revenue DESC, orderkey ASC)
    tie-break."""
    import datetime

    seg, cutoff = "BUILDING", datetime.datetime(1998, 1, 1)

    cust = pq.read_table(
        table_path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = (
        cust.filter(pc.equal(cust["c_mktsegment"], seg))["c_custkey"]
        .combine_chunks()
    )
    keys_ref = ray.put(keys)

    def filt_orders(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        m = pc.and_(
            pc.is_in(t["o_custkey"], value_set=ks),
            pc.less(t["o_orderdate"], pa.scalar(cutoff)),
        )
        return t.filter(m).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(filt_orders, batch_format="pyarrow")

    def prep_li(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_cents": cents(rev)})

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_li, batch_format="pyarrow")

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]
    ).aggregate(Sum("rev_cents", alias_name="revenue_cents"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority", "revenue_cents"]
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["revenue_cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def events_sessions(sf_dir: str):
    """Sessionization: per-user event runs split at > 30-minute gaps.

    The streaming-window analogue in batch form: hash-partition by user_id
    into coarse partitions, then one Arrow-native vectorized pass per
    partition (C-speed sort by (user_id, ts, event_id), gap/user-change
    breaks via diff; sessions are contiguous runs after the sort, so
    session_start/n_events fall out of the break positions directly — no
    groupby, no pandas detour).
    """
    from camden_ray.config import DedupConfig
    from camden_ray.stages.candidates import default_partitions, partition_map

    P = default_partitions(DedupConfig())  # scales with cluster CPUs
    gap = np.timedelta64(SESSION_GAP_MIN, "m")

    def add_pkey(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "pkey", pa.array((uid % P).astype(np.int64), type=pa.int64())
        )

    def sessionize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            # types from the (empty) input so all blocks agree on schema
            return pa.table(
                {"user_id": t["user_id"], "session_start": t["ts"],
                 "n_events": pa.array([], type=pa.int64())}
            )
        t = t.combine_chunks()  # multi-key sort over the reduce concat's
        # chunks is ~2.5x the contiguous sort (see candidates.py grouper)
        order = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        )
        t = t.take(order)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        big_gap = np.r_[False, (ts[1:] - ts[:-1]) > gap]
        starts = np.flatnonzero(new_user | big_gap)
        n_events = np.diff(np.r_[starts, len(uid)])
        first = t.take(pa.array(starts, type=pa.int64()))
        return pa.table(
            {"user_id": first["user_id"], "session_start": first["ts"],
             "n_events": pa.array(n_events, type=pa.int64())}
        )

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return partition_map(
        ds.map_batches(add_pkey, batch_format="pyarrow"),
        P,
        sessionize,
        batch_format="pyarrow",
    )


def events_asof_view(sf_dir: str):
    """As-of join — an operator Ray Data has no native form of (SURVEY.md
    §2's custom-operator class): every 'click' event is joined to the same
    user's most recent 'view' at-or-before it (ties on ts broken by max
    view event_id; clicks with no prior view drop — inner as-of semantics).

    Scale shape: both sides co-hash-partition by user_id in ONE exchange
    (they travel as one table tagged by kind), then each partition runs one
    vectorized merge: sort by (user_id, ts, kind, event_id) — views sort
    before clicks at equal ts so the match is inclusive — a single
    ``maximum.accumulate`` forward-fills the latest view position, and a
    per-user segment-start guard voids fills that leak across users. No
    per-user Python, no pairwise blowup on hot users (the oracle's
    equi-join + window does O(clicks·views) per user; this is O(n log n)
    per partition).
    """
    from camden_ray.config import DedupConfig
    from camden_ray.stages.candidates import default_partitions, partition_map

    P = default_partitions(DedupConfig())

    def add_pkey(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["view", "click"]))
        t = t.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        kind = pc.equal(t["event_type"], "click").cast(pa.int8())
        t = t.drop_columns(["event_type"]).append_column("kind", kind)
        return t.append_column(
            "pkey", pa.array((uid % P).astype(np.int64), type=pa.int64())
        )

    def asof(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "view_event_id": pa.array([], type=pa.int64()),
                    "gap_us": pa.array([], type=pa.int64()),
                }
            )
        t = t.combine_chunks()
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("kind", "ascending"),  # views (0) before clicks (1) at equal ts
                ("event_id", "ascending"),
            ],
        )
        t = t.take(order)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        is_click = t["kind"].to_numpy(zero_copy_only=False) == 1
        n = len(uid)
        pos = np.arange(n, dtype=np.int64)
        last_view = np.maximum.accumulate(np.where(~is_click, pos, -1))
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        seg_start = np.maximum.accumulate(np.where(new_user, pos, 0))
        hit = is_click & (last_view >= seg_start)
        vp = last_view[hit]
        return pa.table(
            {
                "event_id": pa.array(eid[hit], type=pa.int64()),
                "view_event_id": pa.array(eid[vp], type=pa.int64()),
                "gap_us": pa.array(
                    (ts[hit] - ts[vp]).astype("timedelta64[us]").astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    return partition_map(
        ds.map_batches(add_pkey, batch_format="pyarrow"),
        P,
        asof,
        batch_format="pyarrow",
    )


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` column per batch
    (stdlib json inside map_batches — no driver-side loop) and aggregate the
    extracted field per event type."""
    import json

    def extract(t: pa.Table) -> pa.Table:
        ks = []
        for p in t["props"].to_pylist():
            try:
                v = json.loads(p).get("k") if p else None
            except (ValueError, AttributeError):
                v = None
            ks.append(v)
        return pa.table(
            {
                "event_type": t["event_type"],
                "k": pa.array(ks, type=pa.int64()),
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow"
    )
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("k", alias_name="sum_k"),
    )


def events_distinct_users(sf_dir: str):
    """Count-distinct via shuffle (groupby user, count groups) — the
    distributed form; a driver-side set would not survive 10^12 rows."""
    n = (
        read_table(sf_dir, "events", columns=["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="c"))
        .count()
    )
    return pd.DataFrame({"n_users": [int(n)]})


ORACLE_SQL_RELATIONAL = {
    "orders_by_segment": """
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "customer_region_counts": """
        SELECT r_name, count(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "orders_top_revenue": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_cents DESC, o_orderkey
        LIMIT 10
    """,
    "lineitem_part_revenue": """
        SELECT p_brand, count(*) AS n_items,
               CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                   AS sum_rev_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "events_sessions": """
        WITH o AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "events_distinct_users": """
        SELECT count(DISTINCT user_id) AS n_users FROM events
    """,
    "events_asof_view": """
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
             v AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'view'),
             j AS (SELECT c.event_id, v.event_id AS view_event_id,
                          epoch_us(c.ts) - epoch_us(v.ts) AS gap_us,
                          row_number() OVER (
                              PARTITION BY c.event_id
                              ORDER BY v.ts DESC, v.event_id DESC) AS rn
                   FROM c JOIN v
                     ON c.user_id = v.user_id AND v.ts <= c.ts)
        SELECT event_id, view_event_id, gap_us FROM j WHERE rn = 1
    """,
    "events_props_stats": """
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
}
