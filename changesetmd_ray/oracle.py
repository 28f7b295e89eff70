"""Brute-force O(n·m) oracle with PostGIS semantics (SURVEY.md §5.2).

This module IS the ground truth the engine's distributed operators are
diffed against — simple enough to be right by inspection, unit-tested on
hand-computed edge cases. It deliberately shares only the *lowest-level*
classification kernels (ray casting, haversine) with the engine; all
join/tile/candidate logic here is naive full cross products, independent
of the engine's partitioned implementations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.geo.envelope import bbox_contains, bbox_coveredby, bbox_intersects
from changesetmd_ray.geo.haversine import haversine_m
from changesetmd_ray.geo.pip import (
    BOUNDARY,
    INTERIOR,
    classify_points_cap,
    classify_points_polygon,
)
from changesetmd_ray.geo.grid import pack_tile, tile_xyz


def polygon_arrays(polygons: pa.Table) -> list[dict]:
    """Decode the polygons fixture table into plain numpy per-polygon dicts."""
    out = []
    for row in polygons.to_pylist():
        d = {"poly_id": row["poly_id"], "kind": row["kind"], "lat_threshold": row["lat_threshold"]}
        if row["kind"] == "ring":
            d["x"] = np.array([p["lon"] for p in row["ring"]], dtype=np.float64)
            d["y"] = np.array([p["lat"] for p in row["ring"]], dtype=np.float64)
        out.append(d)
    return out


def classify_against_polygon(px: np.ndarray, py: np.ndarray, poly: dict) -> np.ndarray:
    if poly["kind"] == "ring":
        return classify_points_polygon(px, py, poly["x"], poly["y"])
    return classify_points_cap(px, py, poly["lat_threshold"], north=poly["kind"] == "cap_n")


def oracle_pip(
    point_ids: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    polygons: pa.Table,
    predicate: str = "intersects",
) -> set[tuple[int, int]]:
    """(point_id, poly_id) pairs under a PostGIS predicate.

    - 'contains'   → ST_Contains(poly, pt): interior only
    - 'intersects' → ST_Intersects / ST_CoveredBy(pt, poly): interior or boundary
    """
    want_boundary = predicate != "contains"
    pairs = set()
    for poly in polygon_arrays(polygons):
        cls = classify_against_polygon(px, py, poly)
        hit = (cls == INTERIOR) | (want_boundary & (cls == BOUNDARY))
        for pid in point_ids[hit]:
            pairs.add((int(pid), int(poly["poly_id"])))
    return pairs


def oracle_bbox_join(
    left_ids: np.ndarray,
    left_box: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    right_ids: np.ndarray,
    right_box: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    predicate: str = "intersects",
) -> set[tuple[int, int]]:
    """All (left_id, right_id) rectangle pairs under the predicate.
    NaN boxes (no-bbox rows) never match — NaN comparisons are False."""
    l_lo_x, l_lo_y, l_hi_x, l_hi_y = (np.asarray(a, dtype=np.float64) for a in left_box)
    r = tuple(np.asarray(a, dtype=np.float64) for a in right_box)
    fn = {"intersects": bbox_intersects, "coveredby": bbox_coveredby, "contains": bbox_contains}[
        predicate
    ]
    pairs = set()
    for i in range(len(left_ids)):
        # predicate applies as ST_Predicate(left, right); for 'contains'
        # that is ST_Contains(left, right) = left is the outer geometry
        lb = (l_lo_x[i], l_lo_y[i], l_hi_x[i], l_hi_y[i])
        m = fn(lb, r)
        for rid in np.asarray(right_ids)[np.asarray(m, dtype=bool)]:
            pairs.add((int(left_ids[i]), int(rid)))
    return pairs


def oracle_knn(
    probe_ids: np.ndarray,
    probe_lon: np.ndarray,
    probe_lat: np.ndarray,
    corpus_ids: np.ndarray,
    corpus_lon: np.ndarray,
    corpus_lat: np.ndarray,
    k: int,
) -> list[tuple[int, int, int]]:
    """Exact haversine kNN: (probe_id, neighbor_id, rank 1..k), ties
    broken by neighbor id ascending (SURVEY.md §2.4 J4)."""
    out = []
    for i in range(len(probe_ids)):
        d = haversine_m(probe_lon[i], probe_lat[i], corpus_lon, corpus_lat)
        order = np.lexsort((corpus_ids, d))[:k]
        for rank, j in enumerate(order, 1):
            out.append((int(probe_ids[i]), int(corpus_ids[j]), rank))
    return out


def oracle_tiles(point_ids: np.ndarray, lon: np.ndarray, lat: np.ndarray, zoom: int) -> set[tuple[int, int]]:
    """(point_id, tile_key) assignment at ``zoom``."""
    x, y = tile_xyz(lon, lat, zoom)
    keys = pack_tile(zoom, x, y)
    return {(int(i), int(t)) for i, t in zip(point_ids, keys)}
