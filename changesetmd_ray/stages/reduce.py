"""Distributed sparse-key aggregation that beats Ray's sort-based
groupby when the value payload is tiny (A4 combiner pattern, SURVEY.md
§2.5 / §4.3).

Ray Data's ``groupby(key).sum(...)`` runs a full sample-sort shuffle —
measured ~16 s for 1.4 M (int64 key, int64 count) partial rows on 8
CPUs, pure overhead for a 23 MB payload. ``bucket_sum`` instead:

1. per-block vectorized combine (``np.unique``-style sum per key),
2. a deterministic hash bucket (splitmix64) per key — ``num_buckets``
   stays O(4 × cluster cores), so the shuffle moves only combined
   partials into a bounded number of groups,
3. per-bucket exact combine in ``map_groups``.

Same result as ``groupby(key).agg(sum)`` (measured 8× faster); scales
because every stage is bounded: partial rows ≤ blocks × distinct keys
per block, bucket count is a knob, and no stage materializes the raw
rows. Skew across buckets is bounded by (distinct keys)/num_buckets —
the combine already collapsed duplicate keys, so a hot KEY cannot make
a hot bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import splitmix64


def sum_by_key(keys: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (keys, values) → (unique sorted keys, per-key sums).
    Integer values promote to int64; float values sum as float64 —
    ``np.add.at`` into an int accumulator would silently truncate each
    float addend."""
    acc_t = np.result_type(np.asarray(values).dtype, np.int64)
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = values[order]
    if len(k) == 0:
        return k, v.astype(acc_t)
    first = np.concatenate([[True], k[1:] != k[:-1]])
    idx = np.cumsum(first) - 1
    out_k = k[first]
    out_v = np.zeros(len(out_k), dtype=acc_t)
    np.add.at(out_v, idx, v)
    return out_k, out_v


def _combine_table(batch: pa.Table, key_col: str, val_col: str) -> pa.Table:
    k, v = sum_by_key(
        batch[key_col].to_numpy(zero_copy_only=False),
        batch[val_col].to_numpy(zero_copy_only=False),
    )
    return pa.table({key_col: pa.array(k), val_col: pa.array(v)})


def tree_sum(partials, *, key_col: str, val_col: str, fanin: int = 64):
    """Two-level repartition tree for BOUNDED key domains (e.g. tile
    grids): level-1 merges blocks ``fanin`` ways and combines (each
    output block is then ≤ |key domain| rows), level-2 funnels into one
    block whose combine emits the final, globally SORTED result.

    Cheaper than any sort-based shuffle for small domains (measured
    2.3 s vs 4.4 s vs 16 s for tree / bucket_sum+sort / naive groupby on
    16 M points → 65 k tiles, 32 CPUs). The single final block bounds
    applicability to domains that fit one worker (≲ 4 M keys) — use
    :func:`bucket_sum` + ``sort`` beyond that."""

    def combine(batch: pa.Table) -> pa.Table:
        return _combine_table(batch, key_col, val_col)

    p = partials.repartition(fanin).map_batches(combine, batch_format="pyarrow", batch_size=None)
    return p.repartition(1).map_batches(combine, batch_format="pyarrow", batch_size=None)


def tree_combine(partials, combine, *, fanin: int = 16):
    """General tree reduction for BOUNDED combined domains (grouped
    aggregations whose distinct-key count is small: TPC-H Q1's 6 flag
    pairs, market segments, order priorities, …).

    ``combine`` is an associative, idempotent ``pa.Table -> pa.Table``
    re-aggregator (typically an Arrow ``group_by(...).aggregate`` that
    renames its output columns back to the input names so it can be
    applied again). Level 1 merges partial blocks ``fanin`` ways and
    combines; level 2 funnels the ≤ ``fanin`` combined blocks into one
    final block.

    Why not ``groupby(key).map_groups(final)``: Ray's groupby runs a
    full sample-sort shuffle — measured ~2 s of pure overhead to sort
    64 blocks × ≤ 6 partial rows for TPC-H Q1 at sf0.1. The tree is two
    narrow repartitions over already-combined partials: no sample pass,
    no all-to-all, and at 100 TB the level-1 inputs are still only
    (blocks × distinct keys) tiny rows. The single final block bounds
    applicability to domains that fit one worker (≲ a few M keys) —
    use :func:`bucket_sum` or a bucketed groupby beyond that.

    ``fanin`` is the level-1 output block count: big enough that each
    level-1 task's merged rows stay small at scale (1 M input blocks ×
    6 groups / 16 ≈ 375 k tiny rows per task), small enough that a
    small input isn't SPLIT into more tasks than it has blocks
    (repartition(n) makes n blocks regardless of input count).
    ``fanin=1`` collapses the tree to a SINGLE repartition+combine —
    for callers that bound their partials' block count themselves
    (each repartition is a barrier with ~0.3 s fixed cost; measured
    1.02 s → 0.78 s on priority_revenue at sf0.1)."""

    if fanin == 1:
        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
    p = partials.repartition(fanin).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    return p.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )


def bucket_sum(partials, *, key_col: str, val_col: str, num_buckets: int = 64):
    """Sum ``val_col`` per ``key_col`` over a Dataset of sparse partial
    rows. Output has one row per distinct key (unsorted across blocks —
    chain ``.sort(key_col)`` when order matters).

    The shuffle rows are LIST-PACKED: each block emits at most
    ``num_buckets`` rows, each carrying that bucket's (keys, sums) as
    list columns. Ray's sort-based shuffle cost tracks row count far
    more than byte volume (measured: 8.4 M sparse rows ≈ 10 s vs 8 k
    packed rows ≪ 1 s for the same bytes), so packing makes the
    all-to-all cheap at any scale; byte volume is unchanged."""
    if num_buckets <= 0 or num_buckets & (num_buckets - 1):
        raise ValueError(f"num_buckets must be a power of two (got {num_buckets})")

    def local(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(key_col).type
        val_np = batch.schema.field(val_col).type
        acc_t = pa.float64() if pa.types.is_floating(val_np) else pa.int64()
        k, v = sum_by_key(
            batch[key_col].to_numpy(zero_copy_only=False),
            batch[val_col].to_numpy(zero_copy_only=False),
        )
        b = (splitmix64(k.astype(np.uint64)) & np.uint64(num_buckets - 1)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        k, v, b = k[order], v[order], b[order]
        if len(b) == 0:
            # empty blocks must carry the SAME list types as non-empty
            # ones or the shuffle fails on mixed schemas
            return pa.table(
                {"__bucket": pa.array([], pa.int64()),
                 "__keys": pa.array([], pa.list_(key_t)),
                 "__vals": pa.array([], pa.list_(acc_t))}
            )
        first = np.concatenate([[True], b[1:] != b[:-1]])
        starts = np.nonzero(first)[0]
        offsets = np.concatenate([starts, [len(b)]]).astype(np.int32)
        keys_list = pa.ListArray.from_arrays(pa.array(offsets), pa.array(k, key_t))
        vals_list = pa.ListArray.from_arrays(pa.array(offsets), pa.array(v, acc_t))
        return pa.table(
            {"__bucket": pa.array(b[starts]), "__keys": keys_list, "__vals": vals_list}
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        keys = group["__keys"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        vals = group["__vals"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        k, v = sum_by_key(keys, vals)
        return pa.table({key_col: pa.array(k), val_col: pa.array(v)})

    return (
        partials.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
