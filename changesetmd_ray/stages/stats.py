"""Distributed order statistics (north_rule addition).

:func:`exact_quantiles` — EXACT quantiles of a numeric column without a
global sort: the all-to-all a ``ds.sort`` would pay is replaced by three
streaming passes whose shuffled volume is tiny,

1. count + min/max (nulls/NaN excluded — SQL aggregate parity),
2. a fixed-bin histogram over [min, max] (one vectorized ``bincount``
   per batch, partials are ``num_bins`` ints per block),
3. ``(value, count)`` partials restricted to the few bins that contain
   target ranks, combined distributed, resolved driver-side by
   cumulative count.

Rank semantics = SQL ``percentile_disc`` / DuckDB ``quantile_disc``:
0-based index ``max(0, ceil(q·n) − 1)`` into the sorted non-null
values (verified against DuckDB). Values are SELECTED, never averaged,
so doubles match the SQL oracle bit-exactly.

Scale notes: pass-3 volume is bounded by the distinct values inside the
target bins (ties collapse to one ``(value, count)`` row per batch);
a pathological single-bin value mass therefore costs one row, not the
mass. Skewed-range data (one outlier stretching [min, max]) degrades
bin resolution, not correctness — the target-bin collection simply
grows; raise ``num_bins`` if pass 3 ever dominates.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from changesetmd_ray.text.hashing import splitmix64


def _clean(batch: pa.Table, col: str) -> np.ndarray:
    """Non-null (and non-NaN) values in the column's NATIVE dtype —
    int64 columns must not round-trip through float64, which silently
    corrupts values above 2^53 and would break the module's exactness
    guarantee."""
    arr = batch[col]
    valid = ~np.asarray(pc.is_null(arr).combine_chunks())
    x = arr.fill_null(0).to_numpy(zero_copy_only=False)
    if np.issubdtype(x.dtype, np.floating):
        valid &= ~np.isnan(x)
    return x[valid]


def exact_quantiles(
    ds,
    *,
    col: str,
    qs: list[float],
    num_bins: int = 4096,
    combine_parts: int = 16,
) -> pa.Table:
    """→ pyarrow Table ``(q, value)``, one row per requested quantile
    (``value`` null when the column has no non-null rows; ``value``
    keeps the column's arrow type — values are selected, never
    averaged)."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
    pruned = ds.select_columns([col])
    out_type = ds.schema().base_schema.field(col).type

    def p1(batch: pa.Table) -> pa.Table:
        x = _clean(batch, col)
        if len(x) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.nulls(1, out_type),
                             "hi": pa.nulls(1, out_type)})
        return pa.table({"n": pa.array([len(x)], pa.int64()),
                         "lo": pa.array([x.min()], out_type),
                         "hi": pa.array([x.max()], out_type)})

    parts = pruned.map_batches(p1, batch_format="pyarrow", batch_size=None).take_all()
    n = sum(r["n"] for r in parts)
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.nulls(len(qs), out_type)})
    lo = min(r["lo"] for r in parts if r["lo"] is not None)
    hi = max(r["hi"] for r in parts if r["hi"] is not None)
    ranks = [max(0, math.ceil(q * n) - 1) for q in qs]
    if lo == hi:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array([lo] * len(qs), out_type)})

    # binning happens in float64 — only bin ASSIGNMENT, applied with
    # the identical arithmetic in every pass, so precision loss cannot
    # break correctness; the collected VALUES stay in the native dtype
    flo = float(lo)
    width = (float(hi) - flo) / num_bins
    if not width > 0.0:
        # lo != hi but float(hi) == float(lo): distinct int64 values
        # inside one float64 ulp (possible above 2^53). Binning cannot
        # separate them — use a single bin explicitly (pass 3 collects
        # the distinct values of that bin, which is exactly this range)
        # instead of letting bin_of divide by zero into NaN casts.
        width = math.inf

    def bin_of(x: np.ndarray) -> np.ndarray:
        return np.clip(
            ((x.astype(np.float64) - flo) / width).astype(np.int64), 0, num_bins - 1
        )

    def p2(batch: pa.Table) -> pa.Table:
        x = _clean(batch, col)
        counts = np.bincount(bin_of(x), minlength=num_bins)
        return pa.table({"h": pa.array([counts.tolist()], pa.list_(pa.int64()))})

    hist = np.zeros(num_bins, dtype=np.int64)
    for r in pruned.map_batches(p2, batch_format="pyarrow", batch_size=None).take_all():
        hist += np.asarray(r["h"], dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(hist)])  # cum[b] = count below bin b
    target_bins = sorted({int(np.searchsorted(cum, r, "right") - 1) for r in ranks})
    tb = np.asarray(target_bins, dtype=np.int64)

    def p3(batch: pa.Table) -> pa.Table:
        x = _clean(batch, col)
        b = bin_of(x)
        mask = np.isin(b, tb)
        u, c = np.unique(x[mask], return_counts=True)
        return pa.table({"value": pa.array(u, out_type),
                         "cnt": pa.array(c, pa.int64())})

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("value").aggregate([("cnt", "sum")])
        return g.rename_columns(["value", "cnt"])

    rows = (
        pruned.map_batches(p3, batch_format="pyarrow", batch_size=None)
        .repartition(combine_parts)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    vals = np.asarray([r["value"] for r in rows])
    cnts = np.asarray([r["cnt"] for r in rows], dtype=np.int64)
    # merge duplicates across combine partitions (np.unique sorts)
    u, inv = np.unique(vals, return_inverse=True)
    csum = np.zeros(len(u), dtype=np.int64)
    np.add.at(csum, inv, cnts)
    ub = bin_of(u)
    out = []
    for r in ranks:
        b = int(np.searchsorted(cum, r, "right") - 1)
        within = r - cum[b]  # 0-based rank inside bin b
        m = ub == b
        cc = np.cumsum(csum[m])
        out.append(u[m][int(np.searchsorted(cc, within, "right"))])
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(out, out_type)})


# --------------------------------------------------------- HLL sketch

def _hll_registers(keys: np.ndarray, p: int) -> np.ndarray:
    """HyperLogLog register array (2^p uint8) for a batch of int keys —
    fully vectorized: bucket = top p hash bits, rank = leading-zero
    count of the rest + 1 (computed with log2 on the remaining bits)."""
    h = splitmix64(keys.astype(np.uint64))
    m = 1 << p
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - p)) - 1)
    # rank = (64-p) - floor(log2(rest)) for rest>0, else 64-p+1
    nz = rest > 0
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # float64 log2 is exact for position extraction up to 2^53;
        # top bits beyond that are found via a 32-bit split
        hi = (rest >> np.uint64(32)).astype(np.uint64)
        top = np.where(hi > 0, hi, rest).astype(np.float64)
        shift = np.where(hi > 0, 32, 0)
        pos = np.zeros(len(h), dtype=np.int64)
        pos[nz] = np.floor(np.log2(top[nz])).astype(np.int64) + shift[nz]
        rank[nz] = ((64 - p) - pos[nz]).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = len(regs)
    # HLL paper constants for small m; asymptotic formula above m=64
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return float(est)


def exact_distinct_count(ds, *, col: str, num_buckets: int = 64) -> int:
    """EXACT ``count(distinct col)`` for an integer column, distributed:
    each block reduces to its unique values list-packed by value-hash
    bucket (one packed row per (block, bucket) rides the all-to-all, not
    one row per value), each bucket group counts its global uniques, and
    only ``num_buckets`` count rows reach the driver. The bounded-error
    audit companion to :func:`hll_distinct`."""
    from changesetmd_ray.text.dedup import _pack_by_bucket
    from changesetmd_ray.text.hashing import check_pow2

    check_pow2(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch[col]
        valid = ~np.asarray(pc.is_null(col_arr).combine_chunks())
        k = np.unique(
            col_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)[valid]
        )
        b = (splitmix64(k.view(np.uint64)) & np.uint64(num_buckets - 1)).astype(np.int64)
        return _pack_by_bucket(b, {"v": k})

    def count_uniques(group: pa.Table) -> pa.Table:
        vals = np.asarray(group["v"].combine_chunks().flatten())
        return pa.table({"n": pa.array([len(np.unique(vals))], pa.int64())})

    parts = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("__b")
        .map_groups(count_uniques, batch_format="pyarrow")
        .take_all()
    )
    return int(sum(r["n"] for r in parts))


def hll_distinct(ds, *, col: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col) via a mergeable HyperLogLog
    sketch — the canonical combiner-first pattern for cardinality at
    100 TB: each block reduces to a 2^p-byte register array, the merge
    is an element-wise max (associative/commutative/idempotent), and
    only ``blocks × 2^p`` bytes ever move. Standard error ≈
    1.04/√(2^p) (~1.6 % at the default p=12). Returns one row
    ``(n_distinct_est,)`` (int64, rounded estimate)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch[col]
        valid = ~np.asarray(pa.compute.is_null(col_arr).combine_chunks())
        k = col_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)[valid]
        regs = _hll_registers(k, p)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all():
        merged = np.maximum(merged, np.asarray(r["regs"], dtype=np.uint8))
    return pa.table({"n_distinct_est": pa.array([round(_hll_estimate(merged))], pa.int64())})
