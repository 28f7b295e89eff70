"""As-of join — for every left row, the most recent right row of the
same key at or before the left row's timestamp (LEFT-join semantics:
unmatched rows keep nulls). The time-series operator Ray Data lacks
natively (north_rule custom-operator list; the reference's PostGIS
analogue would be a lateral ``ORDER BY ts DESC LIMIT 1``).

Distributed shape: both sides are Datasets; one bucketed groupby by key
hash co-locates a key's rows (the ONE shuffle); inside a bucket the
match is a single vectorized merge — union both sides, lexsort by
(key, ts, side) with right rows ordered before left on ties (so an
equal timestamp matches, "at or before"), then a running cummax of
right-row indices gives every left row its candidate in O(n log n)
with no per-key Python.

Tie rule within equal right timestamps: the LARGEST right order column
wins (sorted last) — matching the SQL ``ORDER BY ts DESC, id DESC
LIMIT 1`` formulation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import check_pow2, hash_bucket


def asof_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_val: str,
    out_val: str | None = None,
    num_buckets: int = 64,
):
    """→ Dataset with ``left_cols`` + ``out_val`` (the matched right
    row's ``right_val``, null when the key has no right row at or
    before the left timestamp). SQL parity on nulls: null KEYS never
    match (null-key left rows pass through with a null value, null-key
    right rows are dropped — same invariant as joins/equi.py); null
    TIMESTAMPS never match either side; a null right_val LOSES
    equal-timestamp ties to any non-null value (DESC NULLS LAST)."""
    check_pow2(num_buckets)
    out_val = out_val or right_val
    if out_val in left_cols:
        raise ValueError(f"output column collision: {out_val}")
    lcols = list(dict.fromkeys([left_key, left_ts, *left_cols]))
    val_type = right.schema().base_schema.field(right_val).type
    l_schema = left.schema().base_schema
    l_types = {c: l_schema.field(c).type for c in lcols}

    import pyarrow.compute as pc

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.select(lcols)
        knull = np.asarray(pc.is_null(batch[left_key]).combine_chunks())
        k = batch[left_key].fill_null(0).to_numpy(zero_copy_only=False)
        t = pa.table({c: batch[c] for c in lcols})
        b = hash_bucket(k, num_buckets)
        # null-key rows can never match, so they need no co-location —
        # spread them round-robin instead of piling them onto key 0's
        # bucket
        if knull.any():
            b[knull] = np.arange(int(knull.sum())) % num_buckets
        t = t.append_column("__b", pa.array(b))
        # side 2 = null-key left row: kept (left-join) but can't match
        side = np.where(knull, np.int8(2), np.int8(1))
        t = t.append_column("__side", pa.array(side))
        return t.append_column("__rv", pa.nulls(len(batch), val_type))

    def tag_right(batch: pa.Table) -> pa.Table:
        # null keys or null timestamps never match anything: drop early
        ok = pc.and_(
            pc.is_valid(batch[right_key]), pc.is_valid(batch[right_ts])
        )
        batch = batch.filter(ok)
        k = batch[right_key].to_numpy(zero_copy_only=False)
        t = pa.table({left_key: batch[right_key], left_ts: batch[right_ts]})
        for c in lcols:
            if c not in (left_key, left_ts):
                t = t.append_column(c, pa.nulls(len(batch), l_types[c]))
        t = t.select(lcols)
        t = t.append_column("__b", pa.array(hash_bucket(k, num_buckets)))
        t = t.append_column("__side", pa.array(np.zeros(len(batch), dtype=np.int8)))
        return t.append_column("__rv", batch[right_val])

    from changesetmd_ray.stages.exchange import flat, pack_by_bucket

    pack_cols = [*lcols, "__side", "__rv"]

    def pack(batch: pa.Table) -> pa.Table:
        # list-packed exchange (stages/exchange.py): the all-to-all
        # moves ≤ blocks × num_buckets packed rows. __side varies
        # within a block (null-key left rows are side 2), so it packs
        # as a list, not a scalar tag.
        return pack_by_bucket(batch, "__b", pack_cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").map_batches(
        pack, batch_format="pyarrow"
    ).union(
        right.select_columns([right_key, right_ts, right_val]).map_batches(
            tag_right, batch_format="pyarrow"
        ).map_batches(pack, batch_format="pyarrow")
    )

    I64MAX = np.iinfo(np.int64).max

    def match(packed: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = pa.table({c: flat(packed, c) for c in pack_cols})
        side = group["__side"].to_numpy(zero_copy_only=False)
        keys = group[left_key].fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        ts_arr = group[left_ts].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        nat = np.isnat(ts_arr)
        ts_i = np.where(nat, I64MAX, ts_arr.astype(np.int64))
        # type-generic value rank for the tie rule, RIGHT rows only
        # (left rows' ranks are irrelevant); nulls rank FIRST so a null
        # right_val LOSES equal-ts ties (SQL DESC NULLS LAST)
        r_idx = np.flatnonzero(side == 0)
        rv_rank = np.zeros(len(group), dtype=np.int64)
        if len(r_idx):
            rv_right = group["__rv"].take(pa.array(r_idx)).combine_chunks()
            order_r = np.asarray(
                pc.sort_indices(rv_right, null_placement="at_start")
            )
            rv_rank[r_idx[order_r]] = np.arange(len(r_idx))
        # key-major, then ts, then side (right 0 BEFORE left on equal
        # ts → "at or before" is inclusive), then value rank ascending
        # (cummax therefore picks the max-value right row)
        order = np.lexsort((rv_rank, side, ts_i, keys))
        s_s, k_s = side[order], keys[order]
        is_r = s_s == 0
        last_r = np.maximum.accumulate(np.where(is_r, np.arange(len(s_s)), -1))
        l_slots = np.flatnonzero(~is_r)
        cand = last_r[l_slots]
        l_rows = order[l_slots]  # original group indices of left rows
        cand_c = np.maximum(cand, 0)
        valid = (
            (cand >= 0)
            & (k_s[cand_c] == k_s[l_slots])
            & ~nat[l_rows]
            & (s_s[l_slots] == 1)  # side 2 = null-key left: never match
        )
        matched = np.where(valid, order[cand_c], 0)
        out = {c: group[c].take(pa.array(l_rows)) for c in left_cols}
        out[out_val] = group["__rv"].take(pa.array(matched, mask=~valid))
        return pa.table(out)

    return both.groupby("__b").map_groups(match, batch_format="pyarrow")
