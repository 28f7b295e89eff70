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
