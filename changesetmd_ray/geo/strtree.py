"""Array-backed Sort-Tile-Recursive rectangle tree (numpy, bulk-loaded).

Replaces the reference's GiST index on ``geom`` (reference
``queries.py:57-59``) for the broadcast side of point-in-polygon and
envelope joins (SURVEY.md §2.4 J2/T3): built once on the driver,
``ray.put`` into the object store, probed zero-copy inside actor-pool
``map_batches`` stages.

Bulk load (STR packing, Leutenegger et al. 1997): sort items by center x,
slice into √P vertical strips, sort each strip by center y, pack
consecutive runs of ``node_capacity`` items into leaves, then repeat
upward. All levels are flat numpy arrays; queries are fully vectorized
(no per-node Python recursion — candidate (probe, node) pairs expand one
level at a time with numpy repeats).
"""

from __future__ import annotations

import numpy as np


class STRtree:
    def __init__(
        self,
        min_x: np.ndarray,
        min_y: np.ndarray,
        max_x: np.ndarray,
        max_y: np.ndarray,
        node_capacity: int = 16,
    ):
        min_x = np.asarray(min_x, dtype=np.float64)
        min_y = np.asarray(min_y, dtype=np.float64)
        max_x = np.asarray(max_x, dtype=np.float64)
        max_y = np.asarray(max_y, dtype=np.float64)
        n = len(min_x)
        self.n_items = n
        if node_capacity < 2:
            raise ValueError(f"node_capacity must be >= 2 (got {node_capacity}): "
                             "capacity 1 never reduces a level (infinite loop)")
        self.cap = int(node_capacity)
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
            return

        # STR packing order
        cx = (min_x + max_x) * 0.5
        cy = (min_y + max_y) * 0.5
        n_leaves = -(-n // self.cap)
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        slice_size = -(-n // n_slices)
        by_x = np.argsort(cx, kind="stable")
        order_parts = []
        for s in range(0, n, slice_size):
            part = by_x[s : s + slice_size]
            order_parts.append(part[np.argsort(cy[part], kind="stable")])
        self.order = np.concatenate(order_parts)

        # level 0 = items in packed order; build unions upward
        lx, ly = min_x[self.order], min_y[self.order]
        hx, hy = max_x[self.order], max_y[self.order]
        self.levels = []
        while len(lx) > 1:
            m = len(lx)
            n_nodes = -(-m // self.cap)
            pad = n_nodes * self.cap - m
            inf = np.inf

            def pack(a, fill):
                return np.concatenate([a, np.full(pad, fill)]).reshape(n_nodes, self.cap)

            nlx = pack(lx, inf).min(axis=1)
            nly = pack(ly, inf).min(axis=1)
            nhx = pack(hx, -inf).max(axis=1)
            nhy = pack(hy, -inf).max(axis=1)
            self.levels.append((nlx, nly, nhx, nhy))
            lx, ly, hx, hy = nlx, nly, nhx, nhy
        # item-level bboxes in packed order kept for the final exact test
        self.item_lx = min_x[self.order]
        self.item_ly = min_y[self.order]
        self.item_hx = max_x[self.order]
        self.item_hy = max_y[self.order]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_index, item_index) pairs where the point falls inside
        an item rectangle (closed). Vectorized level-by-level descent."""
        return self.query_boxes(px, py, px, py)

    def query_boxes(
        self, qlx: np.ndarray, qly: np.ndarray, qhx: np.ndarray, qhy: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """All (query_index, item_index) pairs whose rectangles intersect
        (closed boxes — boundary touch counts, ST_Intersects parity)."""
        qlx = np.asarray(qlx, dtype=np.float64)
        qly = np.asarray(qly, dtype=np.float64)
        qhx = np.asarray(qhx, dtype=np.float64)
        qhy = np.asarray(qhy, dtype=np.float64)
        nq = len(qlx)
        if self.n_items == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        if self.n_items <= 256:
            # small-tree fast path: one broadcast test beats the descent's
            # repeat/filter temporaries (measured 25 ms -> 3 ms per 8 k
            # probes x 100 boxes). Same closed-box semantics, same
            # (query-major, packed-order) pair order as the descent;
            # chunked so the bool matrix stays ~4 M cells.
            out_q, out_i = [], []
            step = max(1, (1 << 22) // self.n_items)
            for s in range(0, nq, step):
                e = min(s + step, nq)
                hit = (
                    (qlx[s:e, None] <= self.item_hx[None, :])
                    & (qhx[s:e, None] >= self.item_lx[None, :])
                    & (qly[s:e, None] <= self.item_hy[None, :])
                    & (qhy[s:e, None] >= self.item_ly[None, :])
                )
                qi, ii = np.nonzero(hit)
                out_q.append(qi.astype(np.int64) + s)
                out_i.append(ii)
            qi = np.concatenate(out_q)
            ii = np.concatenate(out_i)
            return qi, self.order[ii]
        # (n_items == 1 — the levels-empty case — is handled by the
        # small-tree path above, so self.levels is non-empty here)
        # start at top level
        top = self.levels[-1]
        q_idx = np.repeat(np.arange(nq, dtype=np.int64), len(top[0]))
        n_idx = np.tile(np.arange(len(top[0]), dtype=np.int64), nq)
        for li in range(len(self.levels) - 1, -1, -1):
            nlx, nly, nhx, nhy = self.levels[li]
            hit = (
                (qlx[q_idx] <= nhx[n_idx])
                & (qhx[q_idx] >= nlx[n_idx])
                & (qly[q_idx] <= nhy[n_idx])
                & (qhy[q_idx] >= nly[n_idx])
            )
            q_idx, n_idx = q_idx[hit], n_idx[hit]
            # expand to children at the level below (or items at li == 0)
            child_count = len(self.levels[li - 1][0]) if li > 0 else len(self.item_lx)
            q_idx = np.repeat(q_idx, self.cap)
            n_idx = (n_idx[:, None] * self.cap + np.arange(self.cap)[None, :]).reshape(-1)
            keep = n_idx < child_count
            q_idx, n_idx = q_idx[keep], n_idx[keep]
        # final exact item test
        hit = (
            (qlx[q_idx] <= self.item_hx[n_idx])
            & (qhx[q_idx] >= self.item_lx[n_idx])
            & (qly[q_idx] <= self.item_hy[n_idx])
            & (qhy[q_idx] >= self.item_ly[n_idx])
        )
        return q_idx[hit], self.order[n_idx[hit]]


class PointGrid:
    """Uniform-grid candidate index for POINT probes over item boxes —
    the complement to :class:`STRtree` when every query is a point: a
    point falls in exactly ONE cell, so candidate generation is a
    searchsorted plus two repeats instead of a level-by-level descent
    with ×capacity expansions (measured ~4 ms vs 13–25 ms per 8 k
    probes × 1 k boxes; identical pair sets). Built once on the driver
    and broadcast, like the tree.

    Items whose bbox covers more than ``wide_limit`` cells (polar caps,
    antimeridian-unwrapped rings spanning the globe) go into an
    always-candidate list instead of exploding the (cell, item) table —
    the exact closed-bbox filter at query time removes any misses, so
    results stay exactly the closed-box hits either way.
    """

    def __init__(self, min_x, min_y, max_x, max_y, *,
                 cells_per_item: int = 4, wide_limit: int = 64):
        lx = np.asarray(min_x, dtype=np.float64)
        ly = np.asarray(min_y, dtype=np.float64)
        hx = np.asarray(max_x, dtype=np.float64)
        hy = np.asarray(max_y, dtype=np.float64)
        self.lx, self.ly, self.hx, self.hy = lx, ly, hx, hy
        n = len(lx)
        self.n_items = n
        if n == 0:
            return
        self.x0 = float(lx.min())
        self.y0 = float(ly.min())
        x1 = float(hx.max())
        y1 = float(hy.max())
        ext_x = max(x1 - self.x0, 1e-12)
        ext_y = max(y1 - self.y0, 1e-12)
        total = max(cells_per_item * n, 1)
        self.nx = max(1, int(np.ceil(np.sqrt(total * ext_x / ext_y))))
        self.ny = max(1, -(-total // self.nx))
        self.wx = ext_x / self.nx
        self.wy = ext_y / self.ny

        ix0 = np.clip(((lx - self.x0) / self.wx).astype(np.int64), 0, self.nx - 1)
        ix1 = np.clip(((hx - self.x0) / self.wx).astype(np.int64), 0, self.nx - 1)
        iy0 = np.clip(((ly - self.y0) / self.wy).astype(np.int64), 0, self.ny - 1)
        iy1 = np.clip(((hy - self.y0) / self.wy).astype(np.int64), 0, self.ny - 1)
        w = ix1 - ix0 + 1
        h = iy1 - iy0 + 1
        counts = w * h
        wide = counts > wide_limit
        self.wide_items = np.nonzero(wide)[0].astype(np.int64)
        counts = np.where(wide, 0, counts)

        item = np.repeat(np.arange(n, dtype=np.int64), counts)
        total_pairs = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        o = np.arange(total_pairs, dtype=np.int64) - np.repeat(starts, counts)
        wrep = np.repeat(w, counts)
        dx = o % wrep
        dy = o // wrep
        cell = (np.repeat(iy0, counts) + dy) * self.nx + (np.repeat(ix0, counts) + dx)
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        self.cand_item = item[order]
        self.cell_keys, offs = np.unique(cell_s, return_index=True)
        self.cell_offs = np.concatenate([offs, [len(cell_s)]]).astype(np.int64)

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_index, item_index) pairs where the point falls
        inside an item box (closed) — same contract as
        :meth:`STRtree.query_points`."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        nq = len(px)
        if self.n_items == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        ix = np.clip(((px - self.x0) / self.wx).astype(np.int64), 0, self.nx - 1)
        iy = np.clip(((py - self.y0) / self.wy).astype(np.int64), 0, self.ny - 1)
        key = iy * self.nx + ix
        pos = np.searchsorted(self.cell_keys, key)
        pos_c = np.clip(pos, 0, max(len(self.cell_keys) - 1, 0))
        found = (len(self.cell_keys) > 0) & (self.cell_keys[pos_c] == key) \
            if len(self.cell_keys) else np.zeros(nq, dtype=bool)
        q_hit = np.nonzero(found)[0]
        if len(q_hit):
            p = pos_c[q_hit]
            c = self.cell_offs[p + 1] - self.cell_offs[p]
            qi = np.repeat(q_hit, c)
            st = self.cell_offs[p]
            total = int(c.sum())
            o = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(c)[:-1]]), c
            )
            ii = self.cand_item[np.repeat(st, c) + o]
        else:
            # no probe landed in an occupied cell (routine for the
            # ±360-shifted antimeridian queries) — wide items below
            # must still be considered
            qi = np.empty(0, dtype=np.int64)
            ii = np.empty(0, dtype=np.int64)
        if len(self.wide_items):
            qi = np.concatenate([qi, np.repeat(np.arange(nq, dtype=np.int64),
                                               len(self.wide_items))])
            ii = np.concatenate([ii, np.tile(self.wide_items, nq)])
        keep = (
            (px[qi] >= self.lx[ii]) & (px[qi] <= self.hx[ii])
            & (py[qi] >= self.ly[ii]) & (py[qi] <= self.hy[ii])
        )
        return qi[keep], ii[keep]
