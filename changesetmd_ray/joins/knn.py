"""J4 — exact haversine kNN join (SURVEY.md §2.4 J4).

Shape: the probe set (typically the small side — a query table) is
broadcast once via ``ray.put``; the corpus streams through an actor-pool
``map_batches`` stage that computes the probe×batch haversine matrix in
numpy and keeps only each probe's **top-k within the batch**. Those
partial candidates (≤ probes × k rows per block) shuffle through one
small ``groupby(probe)`` whose ``map_groups`` merges partials into the
final exact top-k with deterministic tie-breaking (distance, then
neighbor id ascending — matching the oracle).

Scale notes: corpus size is unbounded (streaming, no materialization);
the shuffle moves only O(num_blocks · P · k) candidate rows, never the
corpus. Probe count P is bounded by worker memory for the distance
matrix — ``probe_chunk`` bounds it per slab. For huge P, partition the
probes and run the join per partition (the cell-ring variant in
SURVEY.md §2.4 is the full generalization; the reference itself has no
kNN — this operator is a north_rule addition).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

EARTH_RADIUS_M = 6_371_008.8


def _haversine_matrix(
    plon: np.ndarray, plat: np.ndarray, clon: np.ndarray, clat: np.ndarray
) -> np.ndarray:
    """(P × C) haversine distance matrix in meters."""
    p_lam = np.radians(plon)[:, None]
    p_phi = np.radians(plat)[:, None]
    c_lam = np.radians(clon)[None, :]
    c_phi = np.radians(clat)[None, :]
    dphi = c_phi - p_phi
    dlam = c_lam - p_lam
    a = np.sin(dphi / 2) ** 2 + np.cos(p_phi) * np.cos(c_phi) * np.sin(dlam / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.minimum(np.sqrt(a), 1.0))


def _unit_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(n × 3) unit vectors on the sphere."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    cphi = np.cos(phi)
    return np.column_stack([cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi)])


class _PartialTopK:
    """Per-block candidate generator: emits each probe's k nearest
    corpus points *within this batch*.

    The candidate metric is the 3-D chord: ``hav_a = (1 - p·c)/2`` where
    p, c are unit vectors — one BLAS matmul per (probe-chunk × batch)
    instead of a 9-pass trig matrix (measured ~5× faster), and strictly
    rank-equivalent to haversine distance on [0, π]. The exact distance
    ``2R·asin(√a)`` — the same closed form the SQL oracle evaluates —
    is computed only for the selected k per probe."""

    def __init__(self, probes_ref, k: int, id_col: str, lon_col: str, lat_col: str,
                 probe_chunk: int = 2048):
        p = ray.get(probes_ref) if isinstance(probes_ref, ray.ObjectRef) else probes_ref
        self.pid, plon, plat = p
        self.pxyz = _unit_xyz(np.asarray(plon, np.float64), np.asarray(plat, np.float64))
        self.k = k
        self.id_col = id_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.chunk = probe_chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch[self.id_col].to_numpy(zero_copy_only=False)
        clon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        clat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(clon) | np.isnan(clat))
        cid, clon, clat = cid[ok], clon[ok], clat[ok]
        if len(cid) == 0 or len(self.pid) == 0:
            return pa.table(
                {"probe_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "dist_m": pa.array([], pa.float64())}
            )
        cxyz = _unit_xyz(clon, clat).T  # 3 × C, shared by every chunk
        k = min(self.k, len(cid))
        out_p, out_n, out_d = [], [], []
        for s in range(0, len(self.pid), self.chunk):
            e = min(s + self.chunk, len(self.pid))
            a = (1.0 - self.pxyz[s:e] @ cxyz) * 0.5  # hav(d), rank ≡ d
            if k < a.shape[1]:
                part = np.argpartition(a, k - 1, axis=1)[:, :k]
            else:
                part = np.broadcast_to(np.arange(a.shape[1]), (a.shape[0], a.shape[1])).copy()
            rows = np.repeat(np.arange(e - s), part.shape[1])
            cols = part.ravel()
            a_sel = np.clip(a[rows, cols], 0.0, 1.0)
            out_p.append(self.pid[s:e][rows])
            out_n.append(cid[cols])
            out_d.append(2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a_sel)))
        return pa.table(
            {
                "probe_id": pa.array(np.concatenate(out_p), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "dist_m": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )


def _merge_topk_block(batch: pa.Table, k: int, final: bool) -> pa.Table:
    """Vectorized multi-probe top-k within one block: sort by (probe,
    dist, neighbor) — the oracle's tie order — and keep each probe's
    first k rows. No per-probe Python dispatch."""
    pid = batch["probe_id"].to_numpy(zero_copy_only=False)
    nid = batch["neighbor_id"].to_numpy(zero_copy_only=False)
    d = batch["dist_m"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nid, d, pid))
    p, n_, dd = pid[order], nid[order], d[order]
    if len(p) == 0:
        within = np.empty(0, dtype=np.int64)
    else:
        first = np.concatenate([[True], p[1:] != p[:-1]])
        starts = np.nonzero(first)[0]
        counts = np.diff(np.concatenate([starts, [len(p)]]))
        within = np.arange(len(p), dtype=np.int64) - np.repeat(starts, counts)
    keep = within < k
    cols = {
        "probe_id": pa.array(p[keep], pa.int64()),
        "neighbor_id": pa.array(n_[keep], pa.int64()),
    }
    if final:
        cols["rank"] = pa.array(within[keep] + 1)
        cols["dist_m"] = pa.array(dd[keep], pa.float64())
        return pa.table(cols)
    cols["dist_m"] = pa.array(dd[keep], pa.float64())
    return pa.table(cols)


def knn_join(
    corpus,
    probes: pa.Table,
    k: int,
    *,
    corpus_id: str = "id",
    corpus_lon: str = "lon",
    corpus_lat: str = "lat",
    probe_id: str = "id",
    probe_lon: str = "lon",
    probe_lat: str = "lat",
    batch_size: int = 8192,
    concurrency=None,
    merge_fanin: int | None = None,
):
    """Exact k-nearest-neighbors of every probe among the corpus points.

    ``corpus``: Dataset with id/lon/lat columns (streams). ``probes``:
    small driver-side pyarrow Table (broadcast). Returns a Dataset
    ``(probe_id, neighbor_id, rank, dist_m)``, rank 1..k.
    """
    pid = probes[probe_id].to_numpy(zero_copy_only=False).astype(np.int64)
    plon = probes[probe_lon].to_numpy(zero_copy_only=False).astype(np.float64)
    plat = probes[probe_lat].to_numpy(zero_copy_only=False).astype(np.float64)
    probes_ref = ray.put((pid, plon, plat))
    _ = concurrency  # kept for API compat; tasks autoscale with the executor

    def partial_topk(batch: pa.Table) -> pa.Table:
        # task pool, not actor pool: the only state is the broadcast
        # ray.get (zero-copy), and autoscaling actor pools ramp too
        # slowly to saturate the node (same measurement as pip_join);
        # probe_chunk bounds the P×C distance-matrix temporaries so they
        # stay cache-resident
        return _PartialTopK(
            probes_ref, k, corpus_id, corpus_lon, corpus_lat, probe_chunk=512
        )(batch)

    partials = corpus.select_columns([corpus_id, corpus_lon, corpus_lat]).map_batches(
        partial_topk,
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    # repartition-tree merge (no sort-based groupby shuffle). Partial
    # volume is blocks × P × k rows; every all-to-all carries ~1-2 s
    # fixed latency, so the default is ONE level (repartition(1) +
    # vectorized final top-k — P is broadcast-bounded, the final block
    # always fits). Set merge_fanin (e.g. 64) when blocks × P × k is
    # too big for one task — the level-1 pass shrinks each merged block
    # to ≤ P·k rows first.
    p = partials
    if merge_fanin:
        p = p.repartition(merge_fanin).map_batches(
            lambda b: _merge_topk_block(b, k, final=False),
            batch_format="pyarrow", batch_size=None,
        )
    return p.repartition(1).map_batches(
        lambda b: _merge_topk_block(b, k, final=True), batch_format="pyarrow", batch_size=None
    )


# --------------------------- J4 scale path: cell-partitioned radius kNN

_LAT_M_PER_DEG = 111_194.9  # mean meters per degree of latitude


def _probe_cover_cells(lon: np.ndarray, lat: np.ndarray, radius_m: float, zoom: int,
                       max_cells_per_probe: int = 512):
    """For each probe, every grid cell that can contain a point within
    ``radius_m`` (conservative cover; lon wraparound, lat clamp).
    Returns (probe_row_index, packed_cell) pair arrays."""
    from changesetmd_ray.geo.grid import _lat_to_iy, _lon_to_ix, grid_dims, pack_cell

    nx, ny = grid_dims(zoom)
    h_deg = 180.0 / ny
    w_deg = 360.0 / nx
    lat_deg = radius_m / _LAT_M_PER_DEG
    ky = np.full(len(lon), int(np.ceil(lat_deg / h_deg)), dtype=np.int64)
    worst = np.minimum(np.abs(lat) + lat_deg, 89.9999)
    lon_deg = radius_m / (_LAT_M_PER_DEG * np.maximum(np.cos(np.radians(worst)), 1e-9))
    kx = np.minimum(np.ceil(lon_deg / w_deg).astype(np.int64), nx // 2)
    per = (2 * kx + 1) * (2 * ky + 1)
    if per.size and per.max() > max_cells_per_probe:
        raise ValueError(
            f"radius {radius_m} m covers up to {int(per.max())} cells at zoom {zoom} "
            f"(> {max_cells_per_probe}); lower the zoom or raise max_cells_per_probe"
        )
    ix = _lon_to_ix(lon, nx)
    iy = _lat_to_iy(lat, ny)
    total = int(per.sum())
    row = np.repeat(np.arange(len(lon), dtype=np.int64), per)
    starts = np.concatenate([[0], np.cumsum(per)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, per)
    w = np.repeat(2 * kx + 1, per)
    dx = within % w - np.repeat(kx, per)
    dy = within // w - np.repeat(ky, per)
    gx = (np.repeat(ix, per) + dx) % nx
    gy = np.repeat(iy, per) + dy
    keep = (gy >= 0) & (gy < ny)
    return row[keep], pack_cell(zoom, gx[keep], gy[keep]).astype(np.int64)


def knn_radius_join(
    corpus,
    probes,
    k: int,
    radius_m: float,
    *,
    zoom: int = 6,
    corpus_id: str = "id",
    probe_id: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    num_buckets: int = 128,
    merge_fanin: int | None = None,
):
    """J4 scale path — radius-bounded exact kNN with BOTH sides as
    Datasets (no broadcast): each probe gets its ≤ k nearest corpus
    points within ``radius_m`` (haversine; ties by neighbor id asc).

    Partitioning: corpus rows go to their own grid cell; probes
    replicate to every cell their radius disk can touch (conservative
    cover, so no in-radius neighbor is ever missed); one bucketed
    groupby co-locates them; per-cell distances are one unit-vector
    matmul. A (probe, corpus) pair meets in exactly ONE cell — the
    corpus point's — so no pair dedup is needed. Probes with fewer than
    k in-radius neighbors return fewer rows (SQL LEFT-JOIN-free
    semantics; the reference's GiST radius queries behave the same).
    Pick ``zoom`` so a cell is about the radius size: the probe cover
    is then O(9) cells."""
    from changesetmd_ray.geo.grid import point_cell

    def corpus_side(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        lon, lat = lon[ok], lat[ok]
        cid = batch[corpus_id].to_numpy(zero_copy_only=False)[ok]
        cell = point_cell(lon, lat, zoom).astype(np.int64)
        from changesetmd_ray.text.hashing import splitmix64

        b = (splitmix64(cell.astype(np.uint64)) & np.uint64(num_buckets - 1)).astype(np.int64)
        return pa.table(
            {"cell": pa.array(cell), "__bucket": pa.array(b),
             "side": pa.array(np.zeros(len(cid), np.int8)),
             "rid": pa.array(cid.astype(np.int64)),
             "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    def probe_side(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        lon, lat = lon[ok], lat[ok]
        pid = batch[probe_id].to_numpy(zero_copy_only=False)[ok]
        row, cell = _probe_cover_cells(lon, lat, radius_m, zoom)
        from changesetmd_ray.text.hashing import splitmix64

        b = (splitmix64(cell.astype(np.uint64)) & np.uint64(num_buckets - 1)).astype(np.int64)
        return pa.table(
            {"cell": pa.array(cell), "__bucket": pa.array(b),
             "side": pa.array(np.ones(len(row), np.int8)),
             "rid": pa.array(pid[row].astype(np.int64)),
             "lon": pa.array(lon[row]), "lat": pa.array(lat[row])}
        )

    both = corpus.select_columns([corpus_id, lon_col, lat_col]).map_batches(
        corpus_side, batch_format="pyarrow"
    ).union(
        probes.select_columns([probe_id, lon_col, lat_col]).map_batches(
            probe_side, batch_format="pyarrow"
        )
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        cell = group["cell"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        rid = group["rid"].to_numpy(zero_copy_only=False)
        lon = group["lon"].to_numpy(zero_copy_only=False)
        lat = group["lat"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cell))
        cell, side, rid, lon, lat = cell[order], side[order], rid[order], lon[order], lat[order]
        starts = np.concatenate([[0], np.nonzero(cell[1:] != cell[:-1])[0] + 1, [len(cell)]])
        out_p, out_n, out_d = [], [], []
        for g in range(len(starts) - 1):
            s, e = starts[g], starts[g + 1]
            mid = s + int(np.searchsorted(side[s:e], 1))
            if mid == s or mid == e:  # corpus-only or probe-only cell
                continue
            cxyz = _unit_xyz(lon[s:mid], lat[s:mid]).T  # corpus 3×C
            pxyz = _unit_xyz(lon[mid:e], lat[mid:e])  # probes P×3
            a = (1.0 - pxyz @ cxyz) * 0.5
            d = 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
            pi, ci = np.nonzero(d <= radius_m)
            if not len(pi):
                continue
            # per-probe partial top-k inside this cell
            dd = d[pi, ci]
            nid = rid[s:mid][ci]
            pid_ = rid[mid:e][pi]
            o = np.lexsort((nid, dd, pid_))
            pid_, nid, dd = pid_[o], nid[o], dd[o]
            first = np.concatenate([[True], pid_[1:] != pid_[:-1]])
            st = np.nonzero(first)[0]
            cnt = np.diff(np.concatenate([st, [len(pid_)]]))
            within = np.arange(len(pid_), dtype=np.int64) - np.repeat(st, cnt)
            keep = within < k
            out_p.append(pid_[keep])
            out_n.append(nid[keep])
            out_d.append(dd[keep])
        if not out_p:
            return pa.table(
                {"probe_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "dist_m": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "probe_id": pa.array(np.concatenate(out_p), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "dist_m": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )

    partials = both.groupby("__bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    p = partials
    if merge_fanin:
        p = p.repartition(merge_fanin).map_batches(
            lambda b: _merge_topk_block(b, k, final=False),
            batch_format="pyarrow", batch_size=None,
        )
    return p.repartition(1).map_batches(
        lambda b: _merge_topk_block(b, k, final=True), batch_format="pyarrow", batch_size=None
    )
