"""List-packed bucket exchange — the engine's shuffle primitive.

Ray's sort-based shuffle cost tracks ROW count far more than byte
volume (measured in :mod:`changesetmd_ray.stages.reduce`: 8.4 M sparse
rows ≈ 10 s vs 8 k packed rows ≪ 1 s for the same bytes). Every
operator that co-partitions rows by a small bucket domain — the equi
join, the cell-partitioned spatial joins — can therefore pack each
block's rows per bucket into list columns before the ``groupby``
exchange and flatten them back inside ``map_groups``: the all-to-all
moves at most ``blocks × num_buckets`` packed rows regardless of input
row count.

The reference has no distributed exchange at all (single psycopg2
connection, ``changesetmd.py:531-532``); this is the Ray-native piece
that replaces its "one process owns all rows" assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_by_bucket(batch: pa.Table, bucket_col: str, cols: list[str], *,
                   scalar_cols: tuple = (), types: dict | None = None) -> pa.Table:
    """One LIST-PACKED row per distinct ``bucket_col`` value present in
    the block: ``bucket_col`` stays a scalar column, every column in
    ``cols`` becomes ``list<type>`` holding that bucket's values in
    original row order (stable sort). ``scalar_cols`` keep one value per
    packed row (the bucket's first — callers pass columns constant
    within a block, e.g. a side tag). ``types`` overrides the element
    type per column (defaults to the batch schema); an empty batch
    emits the same list schema so mixed-schema shuffles cannot occur."""
    if len(batch) >= 2**31:  # int32 list offsets below would wrap silently
        raise ValueError(
            f"pack_by_bucket: block of {len(batch)} rows overflows int32 list "
            "offsets — repartition to smaller blocks before packing"
        )
    b = batch[bucket_col].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    tbl = batch.take(pa.array(order))
    bs = b[order]
    starts = (
        np.nonzero(np.concatenate([[True], bs[1:] != bs[:-1]]))[0]
        if len(bs)
        else np.empty(0, np.int64)
    )
    offsets = pa.array(np.concatenate([starts, [len(bs)]]).astype(np.int32))
    out = {bucket_col: pa.array(bs[starts] if len(bs) else [], pa.int64())}
    for c in scalar_cols:
        out[c] = (
            tbl[c].take(pa.array(starts)).combine_chunks()
            if len(bs)
            else pa.array([], batch.schema.field(c).type)
        )
    for c in cols:
        t = (types or {}).get(c) or batch.schema.field(c).type
        if len(bs):
            col = tbl[c].combine_chunks()
            if col.type != t:
                col = col.cast(t)
            out[c] = pa.ListArray.from_arrays(offsets, col)
        else:
            out[c] = pa.array([], pa.list_(t))
    return pa.table(out)


def flat(tbl: pa.Table, c: str) -> pa.Array:
    """Flatten a packed list column back to its values (null lists —
    the padded other-side columns of an asymmetric union — contribute
    nothing)."""
    return tbl[c].combine_chunks().flatten()


def flat_np(tbl: pa.Table, c: str) -> np.ndarray:
    return flat(tbl, c).to_numpy(zero_copy_only=False)
