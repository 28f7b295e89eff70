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


class _PartialTopK:
    """Per-block candidate generator: emits each probe's k nearest
    corpus points *within this batch*."""

    def __init__(self, probes_ref, k: int, id_col: str, lon_col: str, lat_col: str,
                 probe_chunk: int = 2048):
        p = ray.get(probes_ref) if isinstance(probes_ref, ray.ObjectRef) else probes_ref
        self.pid, self.plon, self.plat = p
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
        k = min(self.k, len(cid))
        out_p, out_n, out_d = [], [], []
        for s in range(0, len(self.pid), self.chunk):
            e = min(s + self.chunk, len(self.pid))
            d = _haversine_matrix(self.plon[s:e], self.plat[s:e], clon, clat)
            # partial top-k per probe row (argpartition then exact sort of k)
            if k < d.shape[1]:
                part = np.argpartition(d, k - 1, axis=1)[:, :k]
            else:
                part = np.broadcast_to(np.arange(d.shape[1]), (d.shape[0], d.shape[1])).copy()
            rows = np.repeat(np.arange(e - s), part.shape[1])
            cols = part.ravel()
            out_p.append(self.pid[s:e][rows])
            out_n.append(cid[cols])
            out_d.append(d[rows, cols])
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
