"""Candidate-pair generation: the engine's shuffle stages.

Generalizes camden's single mutex-guarded hash-grouping
(/root/reference/src/scanner.rs:17-49,61-63) into real hash shuffles with
explicit skew handling (north_rule: "explicit groupby-aggregate shuffles keyed
on LSH band buckets with salted repartitioning for skewed hot buckets").

The shared primitive is :func:`salted_star_edges`: group rows by an int64
key, but first count bucket sizes, salt-split buckets above ``bucket_cap``
into ``num_salts`` sub-buckets (so no reduce task receives a pathological
group), emit star edges to the per-(sub-)bucket hub (min url — the
deterministic replacement of camden's nondeterministic keep-first,
/root/reference/src/operations.rs:50), and link sub-bucket hubs with a second
tiny groupby over one representative row per sub-bucket.

Cost model: star emission is O(|bucket|) rows per bucket (never O(n²));
all-pairs verification is only used for groups ≤ ``allpairs_cap``.

Edges schema (unified across methods):
    a: string, b: string  (a < b), est: float64, method: string
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from camden_ray.config import DedupConfig
from camden_ray.functions.hashing import mix64

EDGE_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("est", pa.float64()), ("method", pa.string())]
)

_SALT_MIX = np.uint64(0xD6E8FEB86659FD93)


def _empty_group_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": pd.Series([], dtype="int64"),
            "kind": pd.Series([], dtype="object"),
            "a": pd.Series([], dtype="object"),
            "b": pd.Series([], dtype="object"),
            "est": pd.Series([], dtype="float64"),
            "vsig": pd.Series([], dtype="object"),
        }
    )


def _group_out(
    key: int, kinds: list[str], aa: list[str], bb: list[str], ests: list[float], vsigs: list[bytes]
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": pd.Series([key] * len(aa), dtype="int64"),
            "kind": pd.Series(kinds, dtype="object"),
            "a": pd.Series(aa, dtype="object"),
            "b": pd.Series(bb, dtype="object"),
            "est": pd.Series(ests, dtype="float64"),
            "vsig": pd.Series(vsigs, dtype="object"),
        }
    )


def estimate_jaccard(vsigs: np.ndarray, hub_idx: int) -> np.ndarray:
    """Fraction of agreeing signature components vs the hub row."""
    return (vsigs == vsigs[hub_idx][None, :]).mean(axis=1)


def _pairwise_est(vsigs: np.ndarray) -> np.ndarray:
    """(n,n) matrix of pairwise signature-agreement fractions."""
    return (vsigs[:, None, :] == vsigs[None, :, :]).mean(axis=2)


def make_bucket_grouper(cfg: DedupConfig, verified: bool, emit_reps: bool):
    """Build the map_groups fn for one (possibly salted) bucket.

    verified=True  → rows carry a ``vsig`` binary column; edges kept when the
                     signature-estimated Jaccard ≥ τ − margin.
    verified=False → bucket membership IS the dup criterion (exact digests,
                     shared L-grams): est = 1.0.
    emit_reps      → hot (salted) sub-buckets additionally emit one ``rep``
                     row (the hub + its vsig) for the cross-salt linking pass.
    """
    tau = cfg.jaccard_threshold - cfg.verify_margin
    allpairs_cap = 16
    vp = cfg.verify_perms

    def grouper(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        is_salted = bool(n) and int(df["salt"].iloc[0]) >= 0
        if n < 2 and not (is_salted and emit_reps and n == 1):
            return _empty_group_out()
        order = np.argsort(df["url"].to_numpy())
        urls = df["url"].to_numpy()[order]
        key = int(df["key"].iloc[0])
        kinds: list[str] = []
        aa: list[str] = []
        bb: list[str] = []
        ests: list[float] = []
        vsigs_out: list[bytes] = []

        if verified:
            raw = df["vsig"].to_numpy()[order]
            vs = np.frombuffer(b"".join(raw), dtype=np.uint64).reshape(n, vp)
            if n <= allpairs_cap:
                est = _pairwise_est(vs)
                for i in range(n):
                    for j in range(i + 1, n):
                        if est[i, j] >= tau:
                            kinds.append("edge")
                            aa.append(urls[i])
                            bb.append(urls[j])
                            ests.append(float(est[i, j]))
                            vsigs_out.append(b"")
            else:
                est = estimate_jaccard(vs, 0)
                for j in range(1, n):
                    if est[j] >= tau:
                        kinds.append("edge")
                        aa.append(urls[0])
                        bb.append(urls[j])
                        ests.append(float(est[j]))
                        vsigs_out.append(b"")
            hub_sig = raw[0]
        else:
            for j in range(1, n):
                kinds.append("edge")
                aa.append(urls[0])
                bb.append(urls[j])
                ests.append(1.0)
                vsigs_out.append(b"")
            hub_sig = b""

        if emit_reps and is_salted:
            kinds.append("rep")
            aa.append(urls[0])
            bb.append("")
            ests.append(0.0)
            vsigs_out.append(hub_sig)
        return _group_out(key, kinds, aa, bb, ests, vsigs_out)

    return grouper


def salted_star_edges(
    rows: "ray.data.Dataset",
    cfg: DedupConfig,
    method: str,
    verified: bool,
) -> "ray.data.Dataset":
    """rows(key:int64, url:string[, vsig:binary]) → edges(a,b,est,method).

    Three-phase skew-aware grouping:
      1. bucket-size aggregate (cheap count shuffle) → broadcast hot-key set;
      2. salt hot rows (salt = mix(url-hash) % num_salts), group on
         gkey = key ⊕ mixed salt, star-link within (sub-)buckets;
      3. tiny second groupby over hot-bucket representatives links sub-hubs.
    """
    sizes = rows.groupby("key").aggregate(Count(alias_name="cnt"))
    hot = sizes.map_batches(
        lambda t: t.filter(pc.greater(t["cnt"], cfg.bucket_cap)),
        batch_format="pyarrow",
    )
    hot_keys = frozenset(
        int(k) for batch in hot.iter_batches(batch_format="pyarrow") for k in batch["key"].to_pylist()
    )
    hot_ref = ray.put(hot_keys)
    num_salts = np.uint64(cfg.num_salts)

    def add_salt(t: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = t["key"].to_numpy(zero_copy_only=False)
        salts = np.full(len(t), -1, dtype=np.int64)
        if hk:
            mask = np.fromiter((int(k) in hk for k in keys), count=len(t), dtype=bool)
            if mask.any():
                urls = t["url"].to_pylist()
                uh = np.array(
                    [hash(u) & 0x7FFFFFFFFFFFFFFF for u in urls], dtype=np.uint64
                )
                uh = mix64(uh * _SALT_MIX)
                salts[mask] = (uh[mask] % num_salts).astype(np.int64)
        gkey = keys.view(np.uint64).copy()
        m = salts >= 0
        gkey[m] = mix64(
            gkey[m] ^ ((salts[m].view(np.uint64) + np.uint64(1)) * _SALT_MIX)
        )
        out = t.append_column("salt", pa.array(salts, type=pa.int64()))
        return out.append_column("gkey", pa.array(gkey.view(np.int64), type=pa.int64()))

    salted = rows.map_batches(add_salt, batch_format="pyarrow")
    grouped = salted.groupby("gkey").map_groups(
        make_bucket_grouper(cfg, verified=verified, emit_reps=True),
        batch_format="pandas",
    )

    edges = grouped.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "edge")).select(["a", "b", "est"]),
        batch_format="pyarrow",
    )

    # phase 3: link sub-bucket hubs of each hot bucket (≤ num_salts rows/key)
    reps = grouped.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "rep")),
        batch_format="pyarrow",
    )

    def rep_add_cols(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["kind", "b", "est"])
        t = t.rename_columns(["key", "url", "vsig"])
        t = t.append_column("salt", pa.array([-1] * len(t), type=pa.int64()))
        return t

    rep_rows = reps.map_batches(rep_add_cols, batch_format="pyarrow")
    rep_grouped = rep_rows.groupby("key").map_groups(
        make_bucket_grouper(cfg, verified=verified, emit_reps=False),
        batch_format="pandas",
    )
    rep_edges = rep_grouped.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "edge")).select(["a", "b", "est"]),
        batch_format="pyarrow",
    )

    def stamp(t: pa.Table) -> pa.Table:
        return t.append_column("method", pa.array([method] * len(t), type=pa.string()))

    return edges.union(rep_edges).map_batches(stamp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Branch row builders (signature table → keyed candidate rows)
# ---------------------------------------------------------------------------


def exact_rows(sig_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(digest, url) rows for exact dedup (camden G1 at row granularity)."""

    def build(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["digest"], "url": t["url"]})

    return sig_ds.map_batches(build, batch_format="pyarrow")


def make_band_expander(cfg: DedupConfig):
    """sig table → LSH band rows: 1 doc → num_bands rows (key, url, vsig)."""
    from camden_ray.functions.hashing import band_hashes

    nb = cfg.num_bands
    npms = cfg.num_perms
    vp = cfg.verify_perms

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.int64()),
                    "url": pa.array([], type=pa.string()),
                    "vsig": pa.array([], type=pa.binary()),
                }
            )
        sig_col = t["sig"].to_pylist()
        sigs = np.frombuffer(b"".join(sig_col), dtype=np.uint64).reshape(n, npms)
        bh = band_hashes(sigs, nb)  # (n, nb)
        # fold the band index into the key so ONE int64 groupby key suffices
        band_salt = mix64((np.arange(nb, dtype=np.uint64) + np.uint64(1)) * _SALT_MIX)
        keys = mix64(bh ^ band_salt[None, :]).reshape(-1)
        urls = t["url"].to_pylist()
        vsig = [s[: vp * 8] for s in sig_col]
        return pa.table(
            {
                "key": pa.array(keys.view(np.int64), type=pa.int64()),
                "url": pa.array(np.repeat(urls, nb), type=pa.string()),
                "vsig": pa.array([vsig[i] for i in range(n) for _ in range(nb)], type=pa.binary()),
            }
        )

    return expand


def make_lgram_expander(cfg: DedupConfig):
    """sig table → substring candidate rows: one row per sampled L-gram."""

    def expand(t: pa.Table) -> pa.Table:
        lg = t["lgrams"]
        if isinstance(lg, pa.ChunkedArray):
            lg = lg.combine_chunks()
        flat = lg.flatten()
        parent = lg.value_parent_indices()
        urls = t["url"].take(parent)
        return pa.table({"key": flat, "url": urls})

    return expand


def make_simhash_expander(cfg: DedupConfig):
    """sig table → two-level pigeonhole rows (Manku et al. WWW'07).

    Hamming radius ≤ 3 over 64 bits: 4 primary blocks of 16 bits (≥ 1 equal),
    then the complementary 48 bits split into 4 sub-blocks of 12 (≥ 1 equal)
    — 16 tables, key = mix(table_idx, block value, sub-block value).
    Emits (key, url, simhash) rows: 16 per doc.
    """
    B = cfg.simhash_blocks  # 4
    bw = cfg.simhash_bits // B  # 16
    sw = (cfg.simhash_bits - bw) // B  # 12

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        keys = np.empty((n, B * B), dtype=np.uint64)
        mask_b = np.uint64((1 << bw) - 1)
        mask_s = np.uint64((1 << sw) - 1)
        for i in range(B):
            block = (sh >> np.uint64(i * bw)) & mask_b
            # complement bits: everything except block i, packed contiguously
            lo = sh & (np.uint64((1 << (i * bw)) - 1) if i else np.uint64(0))
            hi = sh >> np.uint64((i + 1) * bw)
            comp = lo | (hi << np.uint64(i * bw))
            for j in range(B):
                sub = (comp >> np.uint64(j * sw)) & mask_s
                tbl = np.uint64(i * B + j + 1)
                with np.errstate(over="ignore"):
                    keys[:, i * B + j] = mix64(
                        (block << np.uint64(20)) ^ sub ^ (tbl * _SALT_MIX)
                    )
        urls = t["url"].to_pylist()
        return pa.table(
            {
                "key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "url": pa.array(np.repeat(urls, B * B), type=pa.string()),
                "simhash": pa.array(np.repeat(sh.view(np.int64), B * B), type=pa.int64()),
            }
        )

    return expand


_POPCNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming_matrix(v: np.ndarray) -> np.ndarray:
    """(n,n) pairwise Hamming distances between uint64 simhashes."""
    x = np.bitwise_xor.outer(v, v)
    return _POPCNT_LUT[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)


def make_simhash_grouper(cfg: DedupConfig):
    """map_groups fn: pairwise Hamming ≤ radius within a pigeonhole bucket.

    Buckets above ``simhash_group_cap`` are chunked after sorting by simhash
    value (documented approximation: cross-chunk pairs in oversized buckets
    are candidates in other tables w.h.p.).
    """
    radius = cfg.hamming_radius
    cap = cfg.simhash_group_cap
    bits = float(cfg.simhash_bits)

    def grouper(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="object"),
                    "b": pd.Series([], dtype="object"),
                    "est": pd.Series([], dtype="float64"),
                }
            )
        order = np.lexsort((df["url"].to_numpy(), df["simhash"].to_numpy()))
        urls = df["url"].to_numpy()[order]
        sh = df["simhash"].to_numpy()[order].view(np.uint64)
        aa: list[str] = []
        bb: list[str] = []
        ests: list[float] = []
        for lo in range(0, n, cap):
            chunk = slice(lo, min(n, lo + cap))
            hv = hamming_matrix(sh[chunk])
            ii, jj = np.nonzero(np.triu(hv <= radius, k=1))
            cu = urls[chunk]
            for i, j in zip(ii.tolist(), jj.tolist()):
                x, y = cu[i], cu[j]
                if y < x:
                    x, y = y, x
                aa.append(x)
                bb.append(y)
                ests.append(1.0 - float(hv[i, j]) / bits)
        return pd.DataFrame(
            {
                "a": pd.Series(aa, dtype="object"),
                "b": pd.Series(bb, dtype="object"),
                "est": pd.Series(ests, dtype="float64"),
            }
        )

    return grouper


def simhash_edges(sig_ds: "ray.data.Dataset", cfg: DedupConfig) -> "ray.data.Dataset":
    rows = sig_ds.map_batches(make_simhash_expander(cfg), batch_format="pyarrow")
    grouped = rows.groupby("key").map_groups(
        make_simhash_grouper(cfg), batch_format="pandas"
    )

    def stamp(t: pa.Table) -> pa.Table:
        return t.append_column("method", pa.array(["simhash"] * len(t), type=pa.string()))

    return grouped.map_batches(stamp, batch_format="pyarrow")
