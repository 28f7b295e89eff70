"""J4 — exact haversine kNN join (SURVEY.md §2.4 J4).

Two shapes:

- :func:`knn_join` — broadcast probes: the (small) probe set ships once
  via ``ray.put``; the corpus streams through task-pool ``map_batches``
  computing per-batch partial top-k; the final exact merge (oracle tie
  order: distance asc, neighbor id asc) auto-sizes to the probe count —
  probe-hash BUCKETED whenever P × k is non-trivial (no single-task
  funnel at scale), a one-task consolidation only for merges of a few
  thousand rows where a sort shuffle costs more than it parallelizes.
- :func:`knn_radius_join` — the scale path: BOTH sides are Datasets.
  Corpus rows go to their grid cell, probes replicate to the
  conservative radius cover, a bucketed groupby co-locates them; the
  final merge is probe-hash bucketed by default (no single-task
  funnel), with a per-block pre-shrink so the merge shuffle carries
  ≤ k rows per (probe, block).

The candidate metric everywhere is the 3-D chord ``hav_a = (1-p·c)/2``
over unit vectors — one BLAS matmul instead of a 9-pass trig matrix
(measured ~5× faster) and strictly rank-equivalent to haversine
distance on [0, π]. The exact distance ``2R·asin(√a)`` — the same
closed form the SQL oracle evaluates — is computed only for selected
candidates.

The reference itself has no kNN — this operator is a north_rule
addition; its PostGIS analogue is a GiST ``<->`` / ``ST_DWithin``
query (reference ``queries.py:57-59`` is the index it would use).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

EARTH_RADIUS_M = 6_371_008.8


def _check_pow2(n: int, name: str = "num_buckets") -> None:
    if n <= 0 or n & (n - 1):
        raise ValueError(f"{name} must be a power of two (got {n}): the bucket "
                         "mask `& (n-1)` silently collapses other values")


def _unit_xyz(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(n × 3) unit vectors on the sphere."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    cphi = np.cos(phi)
    return np.column_stack([cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi)])


def _chord_to_m(a: np.ndarray) -> np.ndarray:
    """hav(d) → meters (the oracle's closed form)."""
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def _topk_per_group(gid: np.ndarray, nid: np.ndarray, dist: np.ndarray, k: int):
    """Vectorized per-group top-k with the oracle's tie order (dist asc,
    neighbor id asc): returns (gid, nid, dist, within) for the kept rows,
    ``within`` = 0-based rank inside the group. The ONE top-k kernel —
    every merge/partial path calls this, so the tie rule lives here."""
    order = np.lexsort((nid, dist, gid))
    g, n_, d = gid[order], nid[order], dist[order]
    if len(g) == 0:
        within = np.empty(0, dtype=np.int64)
    else:
        first = np.concatenate([[True], g[1:] != g[:-1]])
        starts = np.nonzero(first)[0]
        counts = np.diff(np.concatenate([starts, [len(g)]]))
        within = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts)
    keep = within < k
    return g[keep], n_[keep], d[keep], within[keep]


class _PartialTopK:
    """Per-block candidate generator: emits each probe's k nearest
    corpus points *within this batch* (tie-safe at the k boundary)."""

    def __init__(self, probes_ref, k: int, id_col: str, lon_col: str, lat_col: str,
                 probe_chunk: int = 512):
        p = ray.get(probes_ref) if isinstance(probes_ref, ray.ObjectRef) else probes_ref
        self.pid, self.pxyz = p  # unit vectors precomputed ONCE in knn_join
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
            # tie-safe candidate cut: keep EVERYTHING within the k-th
            # smallest chord (plus an ulp margin, so equal distances
            # never lose their id-ordered slot to argpartition's
            # arbitrary choice), then resolve (dist, id) exactly
            if k < a.shape[1]:
                t = np.partition(a, k - 1, axis=1)[:, k - 1 : k]
                thr = t + np.maximum(np.abs(t) * 1e-12, 1e-18)
                ri, ci = np.nonzero(a <= thr)
            else:
                ri, ci = np.nonzero(np.ones_like(a, dtype=bool))
            g, n_, d, _ = _topk_per_group(
                ri.astype(np.int64), cid[ci].astype(np.int64), _chord_to_m(a[ri, ci]), k
            )
            out_p.append(self.pid[s:e][g])
            out_n.append(n_)
            out_d.append(d)
        return pa.table(
            {
                "probe_id": pa.array(np.concatenate(out_p), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "dist_m": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )


def _auto_merge_buckets(n_probes: int, k: int, *, small: int = 4096,
                        rows_per_bucket: int = 8192, max_buckets: int = 64) -> int:
    """Default final-merge width for :func:`knn_join`: 1 (repartition +
    one vectorized top-k task) only while the merged volume P × k is a
    few thousand rows — where a sort shuffle costs more latency than it
    buys parallelism — else the probe-hash BUCKETED merge so no single
    task funnels blocks × P × k rows at scale. Power-of-two bucket
    count, one bucket per ~``rows_per_bucket`` merged rows, capped."""
    vol = n_probes * max(k, 1)
    if vol <= small:
        return 1
    b = 2
    while b < max_buckets and b * rows_per_bucket < vol:
        b *= 2
    return b


def _merge_topk_block(batch: pa.Table, k: int, final: bool) -> pa.Table:
    """Vectorized multi-probe top-k merge within one block."""
    g, n_, d, within = _topk_per_group(
        batch["probe_id"].to_numpy(zero_copy_only=False),
        batch["neighbor_id"].to_numpy(zero_copy_only=False),
        batch["dist_m"].to_numpy(zero_copy_only=False),
        k,
    )
    cols = {"probe_id": pa.array(g, pa.int64()), "neighbor_id": pa.array(n_, pa.int64())}
    if final:
        cols["rank"] = pa.array(within + 1)
    cols["dist_m"] = pa.array(d, pa.float64())
    return pa.table(cols)


def _merge_topk_final(partials, k: int, merge_buckets: int, merge_fanin: int | None):
    """Final exact top-k merge of partial candidate rows.

    ``merge_buckets > 1``: partition by probe-id hash and merge each
    bucket independently — the per-probe top-k never needs global
    co-location, so no single task funnels blocks × P × k rows
    (the scale default). ``merge_buckets = 1``: the old
    ``repartition(1)`` consolidation (cheapest at small P — one narrow
    gather instead of a sort shuffle). ``merge_fanin`` adds a pre-shrink
    level that caps the merged volume at fanin × P × k rows first."""
    from changesetmd_ray.text.hashing import splitmix64

    p = partials
    if merge_fanin:
        p = p.repartition(merge_fanin).map_batches(
            lambda b: _merge_topk_block(b, k, final=False),
            batch_format="pyarrow", batch_size=None,
        )
    if merge_buckets <= 1:
        return p.repartition(1).map_batches(
            lambda b: _merge_topk_block(b, k, final=True),
            batch_format="pyarrow", batch_size=None,
        )
    _check_pow2(merge_buckets, "merge_buckets")

    def tag(batch: pa.Table) -> pa.Table:
        # shrink FIRST (a probe can carry up to cover-cells × k rows per
        # block; the sort shuffle's cost tracks row count), then tag
        batch = _merge_topk_block(batch, k, final=False)
        pid = batch["probe_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(pid) & np.uint64(merge_buckets - 1)).astype(np.int64)
        return batch.append_column("__mb", pa.array(b))

    def merge(group: pa.Table) -> pa.Table:
        return _merge_topk_block(group.drop_columns(["__mb"]), k, final=True)

    return (
        p.map_batches(tag, batch_format="pyarrow")
        .groupby("__mb")
        .map_groups(merge, batch_format="pyarrow")
    )


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
    merge_buckets: int | None = None,
):
    """Exact k-nearest-neighbors of every probe among the corpus points.

    ``corpus``: Dataset with id/lon/lat columns (streams). ``probes``:
    small driver-side pyarrow Table (broadcast; NaN/null-coordinate
    probes are dropped, matching the radius path). Returns a Dataset
    ``(probe_id, neighbor_id, rank, dist_m)``, rank 1..k.

    ``merge_buckets=None`` (default) sizes the final merge from the
    probe count: probe-hash BUCKETED (no single-task funnel) as soon
    as P × k partial volume is non-trivial, single-task only when the
    whole merge is a few thousand rows and a sort shuffle would cost
    more than it parallelizes (see :func:`_auto_merge_buckets`).
    """
    pid = probes[probe_id].to_numpy(zero_copy_only=False).astype(np.int64)
    plon = probes[probe_lon].to_numpy(zero_copy_only=False).astype(np.float64)
    plat = probes[probe_lat].to_numpy(zero_copy_only=False).astype(np.float64)
    ok = ~(np.isnan(plon) | np.isnan(plat))
    # probe unit vectors computed ONCE here, not per corpus batch
    probes_ref = ray.put((pid[ok], _unit_xyz(plon[ok], plat[ok])))
    _ = concurrency  # kept for API compat; tasks autoscale with the executor

    def partial_topk(batch: pa.Table) -> pa.Table:
        # task pool, not actor pool: the only state is the broadcast
        # ray.get (zero-copy), and autoscaling actor pools ramp too
        # slowly to saturate the node (same measurement as pip_join);
        # probe_chunk bounds the P×C chord-matrix temporaries so they
        # stay cache-resident
        return _PartialTopK(probes_ref, k, corpus_id, corpus_lon, corpus_lat)(batch)

    partials = corpus.select_columns([corpus_id, corpus_lon, corpus_lat]).map_batches(
        partial_topk,
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    if merge_buckets is None:
        merge_buckets = _auto_merge_buckets(int(ok.sum()), k)
    return _merge_topk_final(partials, k, merge_buckets, merge_fanin)


# --------------------------- J4 scale path: cell-partitioned radius kNN

_LAT_M_PER_DEG = 111_194.9  # mean meters per degree of latitude


def _probe_cover_cells(lon: np.ndarray, lat: np.ndarray, radius_m: float, zoom: int,
                       max_cells_per_probe: int = 512):
    """For each probe, every grid cell that can contain a point within
    ``radius_m`` (conservative cover; lon wraparound, lat clamp).
    Returns DEDUPLICATED (probe_row_index, packed_cell) pair arrays —
    near the poles the lon window can wrap onto itself, which would
    otherwise emit the same (probe, cell) twice and violate the
    pair-meets-once invariant downstream."""
    from changesetmd_ray.geo.grid import _lat_to_iy, _lon_to_ix, grid_dims, pack_cell

    nx, ny = grid_dims(zoom)
    h_deg = 180.0 / ny
    w_deg = 360.0 / nx
    lat_deg = radius_m / _LAT_M_PER_DEG
    ky = np.full(len(lon), int(np.ceil(lat_deg / h_deg)), dtype=np.int64)
    worst = np.minimum(np.abs(lat) + lat_deg, 89.9999)
    lon_deg = radius_m / (_LAT_M_PER_DEG * np.maximum(np.cos(np.radians(worst)), 1e-9))
    # cap so the window is at most nx columns wide (2k+1 ≤ nx)
    kx = np.minimum(np.ceil(lon_deg / w_deg).astype(np.int64), (nx - 1) // 2)
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
    row, cell = row[keep], pack_cell(zoom, gx[keep], gy[keep]).astype(np.int64)
    # (row, cell) dedup — wrap at full-width windows can revisit a column
    order = np.lexsort((cell, row))
    row, cell = row[order], cell[order]
    if len(row):
        first = np.concatenate([[True], (row[1:] != row[:-1]) | (cell[1:] != cell[:-1])])
        row, cell = row[first], cell[first]
    return row, cell


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
    merge_buckets: int = 64,
    probe_chunk: int = 512,
):
    """J4 scale path — radius-bounded exact kNN with BOTH sides as
    Datasets (no broadcast): each probe gets its ≤ k nearest corpus
    points within ``radius_m`` (haversine; ties by neighbor id asc).

    Partitioning: corpus rows go to their own grid cell; probes
    replicate to every cell their radius disk can touch (conservative
    cover, so no in-radius neighbor is ever missed); one bucketed
    groupby co-locates them; per-cell distances are chunked unit-vector
    matmuls (``probe_chunk`` bounds the per-cell temporaries, same as
    the broadcast path). A (probe, corpus) pair meets in exactly ONE
    cell — the corpus point's — so no pair dedup is needed. Probes with
    fewer than k in-radius neighbors return fewer rows. Pick ``zoom``
    so a cell is about the radius size: the probe cover is then O(9)
    cells."""
    from changesetmd_ray.geo.grid import point_cell
    from changesetmd_ray.text.hashing import segment_starts, splitmix64

    _check_pow2(num_buckets)

    def corpus_side(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        lon, lat = lon[ok], lat[ok]
        cid = batch[corpus_id].to_numpy(zero_copy_only=False)[ok]
        cell = point_cell(lon, lat, zoom).astype(np.int64)
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
        b = (splitmix64(cell.astype(np.uint64)) & np.uint64(num_buckets - 1)).astype(np.int64)
        return pa.table(
            {"cell": pa.array(cell), "__bucket": pa.array(b),
             "side": pa.array(np.ones(len(row), np.int8)),
             "rid": pa.array(pid[row].astype(np.int64)),
             "lon": pa.array(lon[row]), "lat": pa.array(lat[row])}
        )

    from changesetmd_ray.stages.exchange import flat_np, pack_by_bucket

    def pack(batch: pa.Table) -> pa.Table:
        # list-packed exchange (stages/exchange.py): the all-to-all
        # moves ≤ blocks × num_buckets packed rows — at 100 TB the
        # corpus+cover rows are the dominant data movement of this join
        return pack_by_bucket(
            batch, "__bucket", ["cell", "rid", "lon", "lat"], scalar_cols=("side",)
        )

    both = corpus.select_columns([corpus_id, lon_col, lat_col]).map_batches(
        corpus_side, batch_format="pyarrow"
    ).map_batches(pack, batch_format="pyarrow").union(
        probes.select_columns([probe_id, lon_col, lat_col]).map_batches(
            probe_side, batch_format="pyarrow"
        ).map_batches(pack, batch_format="pyarrow")
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cell = flat_np(group, "cell")
        rid = flat_np(group, "rid")
        lon = flat_np(group, "lon")
        lat = flat_np(group, "lat")
        lens = pc.list_value_length(group["cell"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        side = np.repeat(
            group["side"].to_numpy(zero_copy_only=False), lens
        )
        order = np.lexsort((side, cell))
        cell, side, rid, lon, lat = cell[order], side[order], rid[order], lon[order], lat[order]
        starts = segment_starts(cell)
        out_p, out_n, out_d = [], [], []
        for g in range(len(starts) - 1):
            s, e = starts[g], starts[g + 1]
            mid = s + int(np.searchsorted(side[s:e], 1))
            if mid == s or mid == e:  # corpus-only or probe-only cell
                continue
            cxyz = _unit_xyz(lon[s:mid], lat[s:mid]).T  # corpus 3×C
            nid_all = rid[s:mid]
            # chunk the probe axis: a dense cell's P×C chord matrix must
            # stay cache/heap-bounded (same rule as _PartialTopK)
            for ps in range(mid, e, probe_chunk):
                pe = min(ps + probe_chunk, e)
                pxyz = _unit_xyz(lon[ps:pe], lat[ps:pe])
                d = _chord_to_m((1.0 - pxyz @ cxyz) * 0.5)
                pi, ci = np.nonzero(d <= radius_m)
                if not len(pi):
                    continue
                gg, nn, dd, _ = _topk_per_group(
                    rid[ps:pe][pi], nid_all[ci], d[pi, ci], k
                )
                out_p.append(gg)
                out_n.append(nn)
                out_d.append(dd)
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
    # this is the large-probe-set path, so the final merge defaults to
    # the probe-hash bucketed shape: partial rows (P × ≤cover-cells × k)
    # never funnel into a single task
    return _merge_topk_final(partials, k, merge_buckets, merge_fanin)
