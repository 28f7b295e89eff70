"""J1 — distributed hash equi-join (SURVEY.md §2.4 J1).

The reference's parent↔child link (``osm_changeset`` ⋈
``osm_changeset_comment`` on the changeset id, reference
``queries.py:21-27``, ``README.md:208-214``) executed by Postgres as a
hash join. Ray-native shape for two LARGE sides (when neither fits a
broadcast — otherwise use the ``ray.put`` + ``searchsorted`` lookup
pattern, e.g. ``q_orders_per_segment``):

1. both sides are column-pruned, tagged with ``__side`` and a
   ``__bucket = splitmix64(key) & (B-1)`` hash bucket,
2. one union + one ``groupby(__bucket)`` shuffle co-partitions matching
   keys (B is a knob ≈ 4× cluster cores — the per-group Python dispatch
   stays O(B) while keys spread evenly, a hot KEY is still bounded by
   its own row count),
3. inside each bucket the match is fully vectorized: sort the right
   side's keys once, ``searchsorted`` every left key against it, expand
   the hit ranges with ``repeat``/cumsum arithmetic, and gather payload
   columns with Arrow ``take`` (works for any column type, zero row
   loops).

Inner join semantics; null keys never match (SQL parity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from changesetmd_ray.text.hashing import splitmix64


def _tag(ds, key: str, cols: list[str], side: int, num_buckets: int):
    """Project + tag one side with ``__side`` and ``__bucket``."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        valid = ~np.asarray(pc.is_null(batch[key]).combine_chunks())
        batch = batch.filter(pa.array(valid))
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(k.astype(np.uint64)) & np.uint64(num_buckets - 1)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b)).append_column(
            "__side", pa.array(np.full(len(batch), side, dtype=np.int8))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 128,
):
    """Inner equi-join of two Datasets on integer keys → Dataset with
    ``left_cols + right_cols`` (caller avoids name collisions; the join
    keys may appear in either list). Both sides shuffle once, co-
    partitioned by key hash; no side is broadcast or materialized."""
    if num_buckets <= 0 or num_buckets & (num_buckets - 1):
        raise ValueError(f"num_buckets must be a power of two (got {num_buckets}): "
                         "the bucket mask silently collapses other values")
    if left_on not in left_cols:
        left_cols = [left_on, *left_cols]
    if right_on not in right_cols:
        right_cols = [right_on, *right_cols]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"column name collision across sides: {sorted(overlap)}")

    # union of differently-shaped sides: pad each side with the other's
    # columns as nulls so the schemas line up
    def pad(batch: pa.Table, other_cols: list[str], other_types: dict) -> pa.Table:
        for c in other_cols:
            batch = batch.append_column(c, pa.nulls(len(batch), other_types[c]))
        return batch

    l_types = {f: left.schema().base_schema.field(f).type for f in left_cols}
    r_types = {f: right.schema().base_schema.field(f).type for f in right_cols}
    order = [*left_cols, *right_cols, "__bucket", "__side"]

    lt = _tag(left, left_on, left_cols, 0, num_buckets).map_batches(
        lambda b: pad(b, right_cols, r_types).select(order), batch_format="pyarrow"
    )
    rt = _tag(right, right_on, right_cols, 1, num_buckets).map_batches(
        lambda b: pad(b, left_cols, l_types).select(order), batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        l_tbl = group.filter(pa.array(lmask)).select(left_cols)
        r_tbl = group.filter(pa.array(~lmask)).select(right_cols)
        empty = pa.table(
            {c: pa.nulls(0, (l_types | r_types)[c]) for c in [*left_cols, *right_cols]}
        )
        if len(l_tbl) == 0 or len(r_tbl) == 0:
            return empty
        lk = l_tbl[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        rk = r_tbl[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        order_r = np.argsort(rk, kind="stable")
        rk_s = rk[order_r]
        lo = np.searchsorted(rk_s, lk, "left")
        hi = np.searchsorted(rk_s, lk, "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(lk)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        ri = order_r[np.repeat(lo, counts) + within]
        out_l = l_tbl.take(pa.array(li))
        out_r = r_tbl.take(pa.array(ri))
        cols = {c: out_l[c] for c in left_cols}
        cols.update({c: out_r[c] for c in right_cols})
        return pa.table(cols)

    return lt.union(rt).groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
