"""J3 — cell-partitioned bbox ∩ bbox join with skew-aware salting
(SURVEY.md §2.4 J3, §4.3.2).

The reference answers rectangle-predicate joins with a GiST ``&&`` index
(reference ``queries.py:57-59``) and explicitly warns that the data
contains continent-sized bboxes (``README.md:184-186``) — the exact skew
that breaks a naive cell-partitioned join. Design:

1. **Explode**: each side's rows flat-map to ``(cell, row)`` pairs over
   the grid cells covering the bbox (:func:`changesetmd_ray.geo.grid.
   cover_bbox`, exact covering, antimeridian-aware).
2. **Skew pre-pass**: per-cell row counts for both sides are combined
   driver-side (a cheap column-pruned pass; the combined histogram is
   tiny — bounded by distinct touched cells). Cells whose pairwise work
   ``L·R`` exceeds ``pair_budget`` are *salted*: the larger side is
   hash-split into ``k`` sub-buckets, the smaller side replicated ``k``
   ways, so no group's pairwise matrix exceeds the budget.
3. **Partitioned exact test**: union both exploded sides, hash-group by
   ``(cell, salt)``, and run the vectorized rectangle predicate on the
   L×R grid inside ``map_groups``.
4. **Shuffle-free dedup**: a pair that intersects in several cells is
   emitted only in the *reference cell* — the grid cell containing the
   min-corner of the two boxes' intersection (the PBSM / "report-once"
   technique). Both sides cover that cell by construction, and the salt
   split keeps each (l, r) combination in exactly one group, so the
   output needs **no global distinct pass**.

Output: Dataset of ``(left_id, right_id)`` pairs under the predicate
(``intersects`` | ``coveredby`` | ``contains``, PostGIS semantics from
:mod:`changesetmd_ray.geo.envelope`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.geo.envelope import bbox_contains, bbox_coveredby, bbox_intersects
from changesetmd_ray.geo.grid import _lat_to_iy, _lon_to_ix, cover_bbox, grid_dims, unpack_cell

SALT_BITS = 6
SALT_MAX = 1 << SALT_BITS  # 64
NUM_BUCKETS = 128  # shuffle groups: cells hash-fold into buckets so the
# groupby dispatches O(buckets) Python calls, not O(cells)

BOX_COLS = ("min_lon", "min_lat", "max_lon", "max_lat")

_PRED = {"intersects": bbox_intersects, "coveredby": bbox_coveredby, "contains": bbox_contains}


def _compact(cells: np.ndarray, zoom: int) -> np.ndarray:
    """Packed grid cell id → dense int64 ``iy * nx + ix`` (zoom is
    constant per join, so the zoom bits are dropped from the group key
    to leave room for the salt bits)."""
    nx, _ = grid_dims(zoom)
    _, ix, iy = unpack_cell(cells)
    return iy * np.int64(nx) + ix


# deterministic 64-bit mix for salt/bucket assignment — the ONE shared
# kernel (stable across processes, unlike Python ``hash``)
from changesetmd_ray.text.hashing import segment_starts as _segment_starts  # noqa: E402
from changesetmd_ray.text.hashing import splitmix64 as _splitmix64  # noqa: E402


class _Explode:
    """Actor-pool flat-map: bbox rows → (jkey, side, rid, box) pairs.

    ``jkey = compact_cell << SALT_BITS | salt``. The hot-cell plan
    (``{compact_cell: (k, split_side)}``) is broadcast once via
    ``ray.put`` and resolved per actor in ``__init__``.
    """

    def __init__(self, plan_ref, side: int, id_col: str, cols: tuple, zoom: int):
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        self.hot_cells = plan["cells"]  # sorted int64 array
        self.hot_k = plan["k"]
        self.hot_split = plan["split"]  # side index that gets hash-split
        self.side = np.int8(side)
        self.id_col = id_col
        self.cols = cols
        self.zoom = zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        rid = batch[self.id_col].to_numpy(zero_copy_only=False)
        box = [batch[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in self.cols]
        ok = ~np.isnan(box[0])
        for b in box[1:]:
            ok &= ~np.isnan(b)
        rid = rid[ok]
        box = [b[ok] for b in box]

        # antimeridian-wrapped boxes (min_lon > max_lon, the normalized
        # wrap representation from geo/envelope.py) split into their two
        # lon segments so the per-cell exact test sees only plain
        # intervals. ``nseg`` (1 | 2) rides along: intersects dedups the
        # (rare) pair that matches in both segments; coveredby/contains
        # require ALL the covered side's segments to be covered —
        # bbox_join counts emissions per pair against ``nseg``
        wrapped = box[0] > box[2]
        nseg = np.where(wrapped, np.int8(2), np.int8(1))
        if wrapped.any():
            w = np.nonzero(wrapped)[0]
            seg2 = [box[0][w].copy(), box[1][w], box[2][w].copy(), box[3][w]]
            seg2[0] = np.full(len(w), -180.0)
            box = [b.copy() for b in box]
            box[2][wrapped] = 180.0
            rid = np.concatenate([rid, rid[w]])
            nseg = np.concatenate([nseg, np.full(len(w), 2, dtype=np.int8)])
            box = [np.concatenate([b, s]) for b, s in zip(box, seg2)]

        row_idx, cells = cover_bbox(box[0], box[1], box[2], box[3], self.zoom)
        cc = _compact(cells, self.zoom)
        rid_r = rid[row_idx]
        nseg_r = nseg[row_idx]
        box_r = [b[row_idx] for b in box]

        # salt: default 0; hot cells either split (1 row, hashed salt) or
        # replicate (k rows)
        salt = np.zeros(len(cc), dtype=np.int64)
        if len(self.hot_cells):
            pos = np.searchsorted(self.hot_cells, cc)
            pos_c = np.clip(pos, 0, len(self.hot_cells) - 1)
            is_hot = self.hot_cells[pos_c] == cc
            if is_hot.any():
                k = np.ones(len(cc), dtype=np.int64)
                k[is_hot] = self.hot_k[pos_c[is_hot]]
                split_here = is_hot & (self.hot_split[pos_c] == int(self.side))
                salt[split_here] = (
                    _splitmix64(rid_r[split_here].astype(np.uint64)) % k[split_here].astype(np.uint64)
                ).astype(np.int64)
                # replicate the non-split side of hot cells k ways
                rep = np.ones(len(cc), dtype=np.int64)
                rep_mask = is_hot & ~split_here
                rep[rep_mask] = k[rep_mask]
                if (rep > 1).any():
                    idx = np.repeat(np.arange(len(cc)), rep)
                    starts = np.concatenate([[0], np.cumsum(rep)[:-1]])
                    local = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, rep)
                    # keep the split side's HASHED salts; only replicated
                    # rows take the 0..k-1 replica index (overwriting all
                    # salts with `local` silently disabled the split)
                    new_salt = salt[idx]
                    from_rep = np.repeat(rep > 1, rep)
                    new_salt[from_rep] = local[from_rep]
                    cc, rid_r, salt = cc[idx], rid_r[idx], new_salt
                    nseg_r = nseg_r[idx]
                    box_r = [b[idx] for b in box_r]

        jkey = (cc << SALT_BITS) | salt
        bucket = (_splitmix64(jkey.astype(np.uint64)) & np.uint64(NUM_BUCKETS - 1)).astype(
            np.int64
        )
        return pa.table(
            {
                "jkey": pa.array(jkey, pa.int64()),
                "__bucket": pa.array(bucket),
                "side": pa.array(np.full(len(jkey), self.side, dtype=np.int8)),
                "rid": pa.array(rid_r, pa.int64()),
                "nseg": pa.array(nseg_r, pa.int8()),
                "lo_x": pa.array(box_r[0]),
                "lo_y": pa.array(box_r[1]),
                "hi_x": pa.array(box_r[2]),
                "hi_y": pa.array(box_r[3]),
            }
        )


_WRAPPED_SENTINEL = -1  # compact cells are iy·nx+ix ≥ 0, so -1 is free


def _count_partial(cols: tuple, zoom: int, side: int):
    """Per-block covering-count partial for one side; the output key
    folds the side into the compact cell (``cell*2 + side`` — compact
    cells are < 2^56 at the zoom cap, so the shift cannot overflow;
    the -1 wrapped sentinel folds to -2/-1) so BOTH sides' partials
    combine through one distributed pass."""

    def partial(batch: pa.Table) -> pa.Table:
        box = [batch[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in cols]
        ok = ~np.isnan(box[0])
        for b in box[1:]:
            ok &= ~np.isnan(b)
        box = [b[ok] for b in box]
        _, cells = cover_bbox(box[0], box[1], box[2], box[3], zoom)
        u, n = np.unique(_compact(cells, zoom), return_counts=True)
        n_wrapped = int(np.count_nonzero(box[0] > box[2]))
        if n_wrapped:
            u = np.concatenate([[np.int64(_WRAPPED_SENTINEL)], u])
            n = np.concatenate([[np.int64(n_wrapped)], n])
        return pa.table(
            {"cell": pa.array(u * 2 + side, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    return partial


def _cell_counts_both(
    left, right, left_cols: tuple, right_cols: tuple, zoom: int
) -> tuple[dict[int, int], bool, dict[int, int], bool]:
    """Per-compact-cell covering counts for BOTH sides in ONE dataset
    execution (the pre-pass used to run once per side — two executor
    startups + two repartition barriers for the same information), plus
    per-side antimeridian-wrap flags (folded in so wrap detection costs
    no extra input scan). Column-pruned and combined DISTRIBUTED first
    (one level of the repartition tree), so the driver only ever
    receives ≤ 32 × |distinct touched cells| rows — never blocks ×
    cells (which grows with input size)."""
    from changesetmd_ray.stages.reduce import _combine_table

    lp = left.select_columns(list(left_cols)).map_batches(
        _count_partial(left_cols, zoom, 0), batch_format="pyarrow", batch_size=None
    )
    rp = right.select_columns(list(right_cols)).map_batches(
        _count_partial(right_cols, zoom, 1), batch_format="pyarrow", batch_size=None
    )
    combined = lp.union(rp).repartition(32).map_batches(
        lambda b: _combine_table(b, "cell", "n"), batch_format="pyarrow", batch_size=None
    )
    out = ({}, {})
    for row in combined.take_all():
        key = row["cell"]
        side = key & 1 if key >= 0 else key + 2
        cell = key >> 1 if key >= 0 else _WRAPPED_SENTINEL
        d = out[side]
        d[cell] = d.get(cell, 0) + row["n"]
    cl, cr = out
    wl = cl.pop(_WRAPPED_SENTINEL, 0) > 0
    wr = cr.pop(_WRAPPED_SENTINEL, 0) > 0
    return cl, wl, cr, wr


def _salting_plan(
    counts_l: dict[int, int], counts_r: dict[int, int], pair_budget: int
) -> dict:
    cells, ks, splits = [], [], []
    for c, nl in counts_l.items():
        nr = counts_r.get(c, 0)
        work = nl * nr
        if work > pair_budget:
            k = int(min(SALT_MAX, max(2, -(-work // pair_budget))))
            cells.append(c)
            ks.append(k)
            splits.append(0 if nl >= nr else 1)
    order = np.argsort(np.asarray(cells, dtype=np.int64)) if cells else []
    return {
        "cells": np.asarray(cells, dtype=np.int64)[order] if len(cells) else np.empty(0, np.int64),
        "k": np.asarray(ks, dtype=np.int64)[order] if len(cells) else np.empty(0, np.int64),
        "split": np.asarray(splits, dtype=np.int64)[order] if len(cells) else np.empty(0, np.int64),
    }


class _PairTest:
    """Per-bucket exact rectangle predicate + reference-cell dedup.

    A bucket holds many (cell, salt) groups — numpy-sliced via one sort
    + ``searchsorted`` boundaries, so Ray dispatches O(buckets) group
    calls instead of O(cells) (measured ~4 k tiny-group calls dominating
    the join at sf0.1)."""

    def __init__(self, predicate: str, zoom: int, left_out: str, right_out: str,
                 chunk_rows: int = 512, emit_need: bool = False):
        self.fn = _PRED[predicate]
        self.zoom = zoom
        self.left_out = left_out
        self.right_out = right_out
        self.chunk = chunk_rows
        # which side must be FULLY covered (its wrap segments AND):
        # coveredby ⇒ left is inside right; contains ⇒ right inside left
        self.emit_need = emit_need
        self.need_side = 1 if predicate == "contains" else 0

    def _one_cell(self, cell, lid, L, lseg, rid_r, R, rseg, nx, ny, out_l, out_r, out_need):
        for s in range(0, len(lid), self.chunk):
            e = min(s + self.chunk, len(lid))
            a = tuple(c[s:e, None] for c in L)
            b = tuple(c[None, :] for c in R)
            hit = self.fn(a, b)
            if not hit.any():
                continue
            li, ri = np.nonzero(hit)
            # reference point = min-corner of the intersection; emit the
            # pair only in the cell that owns that point
            ref_x = np.maximum(L[0][s:e][li], R[0][ri])
            ref_y = np.maximum(L[1][s:e][li], R[1][ri])
            ref_cell = _lat_to_iy(ref_y, ny) * np.int64(nx) + _lon_to_ix(ref_x, nx)
            keep = ref_cell == cell
            out_l.append(lid[s:e][li[keep]])
            out_r.append(rid_r[ri[keep]])
            if self.emit_need:
                need = lseg[s:e][li[keep]] if self.need_side == 0 else rseg[ri[keep]]
                out_need.append(need.astype(np.int64))

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from changesetmd_ray.stages.exchange import flat_np

        jk = flat_np(group, "jkey")
        lens = pc.list_value_length(group["jkey"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        side = np.repeat(group["side"].to_numpy(zero_copy_only=False), lens)
        rid = flat_np(group, "rid")
        nseg = flat_np(group, "nseg")
        cols = [flat_np(group, c) for c in ("lo_x", "lo_y", "hi_x", "hi_y")]
        # order by (jkey, side) so each group is [left rows..., right rows...]
        order = np.lexsort((side, jk))
        jk, side, rid, nseg = jk[order], side[order], rid[order], nseg[order]
        cols = [c[order] for c in cols]
        starts = _segment_starts(jk)
        nx, ny = grid_dims(self.zoom)

        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        out_need: list[np.ndarray] = []
        for g in range(len(starts) - 1):
            s, e = starts[g], starts[g + 1]
            mid = s + int(np.searchsorted(side[s:e], 1))
            if mid == s or mid == e:  # one-sided group → no pairs
                continue
            cell = int(jk[s]) >> SALT_BITS
            self._one_cell(
                cell,
                rid[s:mid], [c[s:mid] for c in cols], nseg[s:mid],
                rid[mid:e], [c[mid:e] for c in cols], nseg[mid:e],
                nx, ny, out_l, out_r, out_need,
            )

        la = np.concatenate(out_l) if out_l else np.empty(0, np.int64)
        ra = np.concatenate(out_r) if out_r else np.empty(0, np.int64)
        out = {self.left_out: pa.array(la, pa.int64()), self.right_out: pa.array(ra, pa.int64())}
        if self.emit_need:
            na = np.concatenate(out_need) if out_need else np.empty(0, np.int64)
            out["__need"] = pa.array(na, pa.int64())
        return pa.table(out)


def _any_wrapped(ds, cols: tuple) -> bool:
    """Cheap pruned scan: does any box wrap the antimeridian
    (min_lon > max_lon)?"""

    def check(batch: pa.Table) -> pa.Table:
        lo = batch[cols[0]].to_numpy(zero_copy_only=False)
        hi = batch[cols[2]].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([bool(np.any(lo > hi))])})

    parts = ds.select_columns([cols[0], cols[2]]).map_batches(
        check, batch_format="pyarrow", batch_size=None
    ).take_all()
    return any(r["w"] for r in parts)


def _add_pair_bucket(batch: pa.Table, a_col: str, b_col: str) -> pa.Table:
    """Tag each (a, b) id pair with its hash bucket — the ONE pair-hash
    scheme shared by the wrapped-input post-passes."""
    a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = _splitmix64(_splitmix64(a) ^ b) & np.uint64(NUM_BUCKETS - 1)
    return batch.append_column("__pbucket", pa.array(h.astype(np.int64)))


def _require_all_segments(pairs, a_col: str, b_col: str):
    """Wrapped coveredby/contains: a pair is real only when EVERY wrap
    segment of the covered side is covered — i.e. the per-pair emission
    count equals ``__need`` (the covered row's segment count, constant
    across its emissions). Bucketed by pair hash; one bounded shuffle of
    candidate pairs, same cost class as :func:`_distinct_pairs`."""

    def agg(group: pa.Table) -> pa.Table:
        a = group[a_col].to_numpy(zero_copy_only=False)
        b = group[b_col].to_numpy(zero_copy_only=False)
        need = group["__need"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, need = a[order], b[order], need[order]
        if len(a) == 0:
            return pa.table({a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())})
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        starts = np.nonzero(first)[0]
        counts = np.diff(np.concatenate([starts, [len(a)]]))
        keep = counts == need[starts]
        return pa.table(
            {a_col: pa.array(a[starts][keep], pa.int64()),
             b_col: pa.array(b[starts][keep], pa.int64())}
        )

    return (
        pairs.map_batches(
            lambda b: _add_pair_bucket(b, a_col, b_col), batch_format="pyarrow"
        )
        .groupby("__pbucket")
        .map_groups(agg, batch_format="pyarrow")
    )


def _distinct_pairs(pairs, a_col: str, b_col: str):
    """Exact distinct over (a, b) id pairs: bucket by pair hash, unique
    within each bucket (only needed when wrapped boxes exist — a pair
    can then match in both lon segments)."""

    def uniq(group: pa.Table) -> pa.Table:
        a = group[a_col].to_numpy(zero_copy_only=False)
        b = group[b_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            a, b = a[first], b[first]
        return pa.table({a_col: pa.array(a, pa.int64()), b_col: pa.array(b, pa.int64())})

    return (
        pairs.map_batches(
            lambda b: _add_pair_bucket(b, a_col, b_col), batch_format="pyarrow"
        )
        .groupby("__pbucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def bbox_join(
    left,
    right,
    *,
    zoom: int = 6,
    predicate: str = "intersects",
    left_id: str = "id",
    right_id: str = "id",
    left_cols: tuple = BOX_COLS,
    right_cols: tuple = BOX_COLS,
    left_out: str | None = None,
    right_out: str | None = None,
    pair_budget: int = 4_000_000,
    salting: bool = True,
    concurrency=(1, 8),
):
    """``left`` ⋈ ``right`` on a rectangle predicate → Dataset of
    ``(left_out, right_out)`` id pairs (defaults ``left_id``/``right_id``,
    disambiguated when equal).

    ``zoom`` picks the partition grid (2^zoom × 2^(zoom-1) cells);
    choose it so a median bbox covers O(1–10) cells. ``pair_budget``
    bounds any group's L×R work; cells above it are salted.
    """
    if zoom > 28:
        raise ValueError(
            f"zoom {zoom} > 28: jkey = compact_cell << {SALT_BITS} would overflow "
            "int64 and silently corrupt group keys"
        )
    left_out = left_out or (left_id if left_id != right_id else f"l_{left_id}")
    right_out = right_out or (right_id if right_id != left_id else f"r_{right_id}")

    if salting:
        # wrapped-box detection is folded into the salting pre-pass
        # (same pruned columns) — no extra input scan; both sides ride
        # ONE execution
        cl, wl, cr, wr = _cell_counts_both(left, right, left_cols, right_cols, zoom)
        wrapped = wl or wr
        plan = _salting_plan(cl, cr, pair_budget)
    else:
        wrapped = _any_wrapped(left, left_cols) or _any_wrapped(right, right_cols)
        plan = _salting_plan({}, {}, pair_budget)
    plan_ref = ray.put(plan)

    _ = concurrency  # kept for API compat; tasks autoscale with the executor

    def explode(ds, side, id_col, cols):
        # task pool: the only per-worker state is the broadcast plan
        # (zero-copy ray.get per task); autoscaling actor pools ramp too
        # slowly to saturate the node (see joins/pip.py measurement)
        from changesetmd_ray.stages.exchange import pack_by_bucket

        def fn(batch, _side=side, _id=id_col, _cols=cols):
            # list-packed exchange (stages/exchange.py): the cell-
            # replicated box rows are this join's dominant data movement
            # at scale; the all-to-all moves ≤ blocks × buckets packed
            # rows instead
            return pack_by_bucket(
                _Explode(plan_ref, _side, _id, _cols, zoom)(batch),
                "__bucket",
                ["jkey", "rid", "nseg", "lo_x", "lo_y", "hi_x", "hi_y"],
                scalar_cols=("side",),
            )

        return ds.select_columns([id_col, *cols]).map_batches(
            fn, batch_format="pyarrow", batch_size=8192
        )

    both = explode(left, 0, left_id, left_cols).union(explode(right, 1, right_id, right_cols))
    need_pass = wrapped and predicate in ("coveredby", "contains")
    tester = _PairTest(predicate, zoom, left_out, right_out, emit_need=need_pass)

    def pair_test(group: pa.Table) -> pa.Table:
        return tester(group)

    out = both.groupby("__bucket").map_groups(pair_test, batch_format="pyarrow")
    if need_pass:
        # AND-semantics across wrap segments: keep a pair only when all
        # of the covered side's segments were individually covered
        out = _require_all_segments(out, left_out, right_out)
    elif wrapped:
        # intersects: a pair can match once per lon segment — distinct
        # only when wrapped inputs exist (one extra bounded shuffle)
        out = _distinct_pairs(out, left_out, right_out)
    return out
