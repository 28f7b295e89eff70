"""Broadcast-side join operators (J1/J6 small-side forms; the
reference's parent↔child link and membership filters, reference
``queries.py:21-27``, ``changesetmd.py:215-219`` — executed by Postgres
as hash joins/EXISTS, here as one broadcast and a map-only stream).

When one side fits a worker's heap, the shuffle join is the wrong
shape: ship the small side ONCE via ``ray.put`` (zero-copy ``ray.get``
per task) and stream the big side through a map-only stage — no
all-to-all at all. These formalize the pattern the query registry uses
ad hoc (``q_orders_per_segment``, ``q_semi_join_customers``,
``q_anti_join_customers``):

- :func:`broadcast_lookup` — inner equi-join attaching one value
  column from the small side (searchsorted against the sorted key
  array; unmatched big-side rows drop, SQL inner semantics).
- :func:`semi_join_keys` / :func:`anti_join_keys` — keep / drop big
  rows whose key is in the broadcast key set.

Null keys never match (SQL parity): they drop in the inner/semi forms
and are KEPT by the anti form (``NOT IN`` over a non-null set —
matching ``not exists`` semantics, which the anti query's oracle uses).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _sorted_small(small: pa.Table, key: str, val: str | None):
    k = small[key].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    ks = k[order]
    if val is None:
        return ray.put((np.unique(ks),))
    return ray.put((ks, small[val].take(pa.array(order))))


def _probe(sorted_keys: np.ndarray, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hit_mask, position) of each key in the sorted key array."""
    if len(sorted_keys) == 0:
        return np.zeros(len(keys), dtype=bool), np.zeros(len(keys), dtype=np.int64)
    pos = np.clip(np.searchsorted(sorted_keys, keys), 0, len(sorted_keys) - 1)
    return sorted_keys[pos] == keys, pos


def _valid_keys(batch: pa.Table, key: str) -> tuple[np.ndarray, np.ndarray]:
    valid = ~np.asarray(pc.is_null(batch[key]).combine_chunks())
    k = batch[key].fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    return k, valid


def broadcast_lookup(big, small: pa.Table, *, big_on: str, small_on: str,
                     small_val: str, out_col: str | None = None):
    """Inner join: stream ``big``, attach ``small``'s value column by
    key (first match wins on duplicate small keys — pass a deduped
    small side for SQL parity), drop unmatched rows."""
    out_col = out_col or small_val
    ref = _sorted_small(small, small_on, small_val)

    def fn(batch: pa.Table) -> pa.Table:
        ks, vals = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k, valid = _valid_keys(batch, big_on)
        hit, pos = _probe(ks, k)
        keep = hit & valid
        batch = batch.filter(pa.array(keep))
        return batch.append_column(out_col, vals.take(pa.array(pos[keep])))

    return big.map_batches(fn, batch_format="pyarrow")


def semi_join_keys(big, small: pa.Table, *, big_on: str, small_on: str):
    """Keep big rows whose key appears in the small side (EXISTS)."""
    ref = _sorted_small(small, small_on, None)

    def fn(batch: pa.Table) -> pa.Table:
        (ks,) = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k, valid = _valid_keys(batch, big_on)
        hit, _ = _probe(ks, k)
        return batch.filter(pa.array(hit & valid))

    return big.map_batches(fn, batch_format="pyarrow")


def anti_join_keys(big, small: pa.Table, *, big_on: str, small_on: str):
    """Drop big rows whose key appears in the small side (NOT EXISTS —
    null big keys are kept, since no small row can equal them)."""
    ref = _sorted_small(small, small_on, None)

    def fn(batch: pa.Table) -> pa.Table:
        (ks,) = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k, valid = _valid_keys(batch, big_on)
        hit, _ = _probe(ks, k)
        return batch.filter(pa.array(~(hit & valid)))

    return big.map_batches(fn, batch_format="pyarrow")


def semi_join(big, small, *, big_on: str, small_on: str,
              broadcast_limit: int = 16_000_000, num_buckets: int = 128):
    """Dataset-level EXISTS: keep ``big`` rows whose key appears in the
    ``small`` Dataset's ``small_on`` column. Broadcasts the distinct
    key set while its map-side-reduced size is ≤ ``broadcast_limit``;
    above it, falls back to a bucketed shuffle membership join (the
    same regime split as ``exact_dedup``'s loser filter) so the driver
    collect can never grow unbounded."""
    return _membership_join(big, small, big_on=big_on, small_on=small_on,
                            keep_hits=True, broadcast_limit=broadcast_limit,
                            num_buckets=num_buckets)


def anti_join(big, small, *, big_on: str, small_on: str,
              broadcast_limit: int = 16_000_000, num_buckets: int = 128):
    """Dataset-level NOT EXISTS: drop ``big`` rows whose key appears in
    ``small``'s ``small_on`` column (null big keys kept). Broadcast
    below ``broadcast_limit`` distinct-ish keys, bucketed shuffle
    above — see :func:`semi_join`."""
    return _membership_join(big, small, big_on=big_on, small_on=small_on,
                            keep_hits=False, broadcast_limit=broadcast_limit,
                            num_buckets=num_buckets)


def _membership_join(big, small, *, big_on: str, small_on: str,
                     keep_hits: bool, broadcast_limit: int, num_buckets: int):
    import numpy as _np

    from changesetmd_ray.stages.exchange import flat, flat_np, pack_by_bucket
    from changesetmd_ray.text.hashing import check_pow2, hash_bucket

    def distinct_block(batch: pa.Table) -> pa.Table:
        col = batch[small_on]
        k = col.drop_null().to_numpy(zero_copy_only=False).astype(_np.int64)
        return pa.table({"__mk": pa.array(_np.unique(k), pa.int64())})

    # materialized once: the gate's count() and the path taken after it
    # (driver collect OR shuffle) would otherwise each re-execute the
    # small side's lineage. Size is bounded by per-block distinct keys
    # — exactly what the shuffle path must hold in flight anyway.
    keys_ds = small.select_columns([small_on]).map_batches(
        distinct_block, batch_format="pyarrow"
    ).materialize()
    # per-block distinct count is an upper bound on the true distinct
    # count — a safe broadcast gate (over-counting only flips us to the
    # always-correct shuffle path early)
    if keys_ds.count() <= broadcast_limit:
        # empty blocks can come back with the PRE-map schema (Ray skips
        # executing UDFs on zero-row blocks) — only read real ones
        ks = _np.unique(
            _np.concatenate(
                [t["__mk"].to_numpy(zero_copy_only=False)
                 for t in ray.get(keys_ds.to_arrow_refs())
                 if len(t) and "__mk" in t.schema.names]
                or [_np.empty(0, _np.int64)]
            )
        ).astype(_np.int64)
        tbl = pa.table({small_on: pa.array(ks, pa.int64())})
        fn = semi_join_keys if keep_hits else anti_join_keys
        return fn(big, tbl, big_on=big_on, small_on=small_on)

    check_pow2(num_buckets)
    big_cols = [f for f in big.schema().base_schema.names]
    big_types = {f: big.schema().base_schema.field(f).type for f in big_cols}
    pack_cols = [*big_cols, "__valid"]
    types = {**big_types, "__valid": pa.bool_()}

    def tag_big(batch: pa.Table) -> pa.Table:
        k, valid = _valid_keys(batch, big_on)
        b = hash_bucket(k, num_buckets)
        keyed = batch.append_column("__valid", pa.array(valid)).append_column(
            "__b", pa.array(b, pa.int64())
        ).append_column("__mk", pa.nulls(len(batch), pa.int64()))
        return pack_by_bucket(keyed, "__b", [*pack_cols, "__mk"],
                              scalar_cols=("__side",), types={**types, "__mk": pa.int64()})

    def tag_small(batch: pa.Table) -> pa.Table:
        k = batch["__mk"].to_numpy(zero_copy_only=False)
        b = hash_bucket(k, num_buckets)
        keyed = batch.append_column("__b", pa.array(b, pa.int64()))
        for c in pack_cols:
            keyed = keyed.append_column(c, pa.nulls(len(batch), types[c]))
        keyed = keyed.append_column(
            "__side", pa.array(_np.ones(len(batch), _np.int8))
        )
        return pack_by_bucket(keyed, "__b", [*pack_cols, "__mk"],
                              scalar_cols=("__side",), types={**types, "__mk": pa.int64()})

    def add_side(batch: pa.Table) -> pa.Table:
        return batch.append_column("__side", pa.array(_np.zeros(len(batch), _np.int8)))

    bt = big.map_batches(add_side, batch_format="pyarrow").map_batches(
        tag_big, batch_format="pyarrow"
    )
    st = keys_ds.map_batches(tag_small, batch_format="pyarrow")

    def filter_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        bmask = side == 0
        b_packed = group.filter(pa.array(bmask))
        s_packed = group.filter(pa.array(~bmask))
        if len(b_packed) == 0:
            return pa.table({c: pa.nulls(0, big_types[c]) for c in big_cols})
        ks = _np.unique(flat_np(s_packed, "__mk").astype(_np.int64)) if len(
            s_packed
        ) else _np.empty(0, _np.int64)
        out = pa.table({c: flat(b_packed, c) for c in pack_cols})
        k = out[big_on].fill_null(0).to_numpy(zero_copy_only=False).astype(_np.int64)
        valid = out["__valid"].to_numpy(zero_copy_only=False)
        hit, _ = _probe(ks, k)
        keep = (hit & valid) if keep_hits else ~(hit & valid)
        return out.filter(pa.array(keep)).drop_columns(["__valid"])

    return bt.union(st).groupby("__b").map_groups(filter_bucket, batch_format="pyarrow")
