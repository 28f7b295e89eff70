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
        if not self.levels:  # single item
            hit = (
                (qlx <= self.item_hx[0])
                & (qhx >= self.item_lx[0])
                & (qly <= self.item_hy[0])
                & (qhy >= self.item_ly[0])
            )
            qi = np.nonzero(hit)[0].astype(np.int64)
            return qi, self.order[np.zeros(len(qi), dtype=np.int64)]

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
