"""Equirectangular lon/lat join grid + web-mercator (slippy) tiles.

Two cell schemes with different jobs:

1. **Join grid** (``point_cell`` / ``cover_bbox`` / ``disk_cells``):
   a plain lon/lat grid at zoom z (2^z × 2^(z-1) cells). This is the
   *partitioning key* for the cell-partitioned bbox join and the kNN
   ring search (SURVEY.md §2.4 J3/J4). Chosen over S2/hex for the join
   key because its covering guarantees are exact and trivially provable:
   two geometries intersect ⇒ they share ≥1 grid cell at any zoom, and
   antimeridian-crossing boxes split cleanly into two lon ranges. The
   S2 / hex encoders (:mod:`changesetmd_ray.geo.cells`,
   :mod:`changesetmd_ray.geo.hexgrid`) remain the user-facing index
   columns, mirroring the reference's GiST index role
   (reference ``queries.py:57-59``).

2. **Raster tiles** (``tile_xyz`` / ``pack_tile``): standard web-mercator
   slippy tiles (z/x/y) for the raster↔vector join (SURVEY.md §2.4 J5).

Cell ids pack into uint64: ``zoom(6 bits) << 58 | y << 29 | x``
(works for zoom ≤ 29).

All kernels are vectorized numpy; ``cover_bbox`` returns a flattened
(row_offsets, cells) pair ready for Arrow ``ListArray`` construction
inside ``map_batches`` — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np

_ZSHIFT = np.uint64(58)
_YSHIFT = np.uint64(29)
_XYMASK = np.uint64((1 << 29) - 1)

MERC_MAX_LAT = 85.05112877980659


def grid_dims(zoom: int) -> tuple[int, int]:
    """(nx, ny) cells at this zoom: nx over 360° lon, ny over 180° lat."""
    nx = 1 << zoom
    ny = max(1, 1 << (zoom - 1)) if zoom >= 1 else 1
    return nx, ny


def pack_cell(zoom: int, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (
        (np.uint64(zoom) << _ZSHIFT)
        | (iy.astype(np.uint64) << _YSHIFT)
        | ix.astype(np.uint64)
    )


def unpack_cell(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.uint64)
    z = (cell >> _ZSHIFT).astype(np.int64)
    iy = ((cell >> _YSHIFT) & _XYMASK).astype(np.int64)
    ix = (cell & _XYMASK).astype(np.int64)
    return z, ix, iy


def _lon_to_ix(lon: np.ndarray, nx: int) -> np.ndarray:
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nx).astype(np.int64)
    return np.clip(ix, 0, nx - 1)


def _lat_to_iy(lat: np.ndarray, ny: int) -> np.ndarray:
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * ny).astype(np.int64)
    return np.clip(iy, 0, ny - 1)


def point_cell(lon: np.ndarray, lat: np.ndarray, zoom: int) -> np.ndarray:
    """Grid cell id for each point (uint64)."""
    nx, ny = grid_dims(zoom)
    return pack_cell(zoom, _lon_to_ix(lon, nx), _lat_to_iy(lat, ny))


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(min_lon, min_lat, max_lon, max_lat) of each grid cell."""
    z, ix, iy = unpack_cell(cell)
    nx = (1 << z).astype(np.float64)
    ny = np.maximum(1, 1 << np.maximum(z - 1, 0)).astype(np.float64)
    w = 360.0 / nx
    h = 180.0 / ny
    min_lon = -180.0 + ix * w
    min_lat = -90.0 + iy * h
    return min_lon, min_lat, min_lon + w, min_lat + h


def cover_bbox(
    min_lon: np.ndarray,
    min_lat: np.ndarray,
    max_lon: np.ndarray,
    max_lat: np.ndarray,
    zoom: int,
    max_cells_per_row: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Covering grid cells for each bbox row.

    Returns ``(row_index, cell)`` flattened pairs (both 1-d, aligned):
    row i contributes one pair per covering cell — the exact shape a
    ``flat_map``-style explode stage needs. Antimeridian-crossing rows
    (min_lon > max_lon) split into [min_lon, 180] ∪ [-180, max_lon].

    The covering is exact (every cell the closed bbox touches), so the
    downstream per-cell pairwise test never misses a pair; pair dedup
    handles the multi-cell matches (SURVEY.md §2.4 J3).

    ``max_cells_per_row`` is a guard against continent-sized bboxes at a
    too-fine zoom (the reference warns about those, ``README.md:184-186``);
    exceeding rows raise — pick a coarser zoom or pre-filter by area.
    """
    min_lon = np.asarray(min_lon, dtype=np.float64)
    min_lat = np.asarray(min_lat, dtype=np.float64)
    max_lon = np.asarray(max_lon, dtype=np.float64)
    max_lat = np.asarray(max_lat, dtype=np.float64)
    nx, ny = grid_dims(zoom)

    wrap = min_lon > max_lon
    # segment 1: [min_lon, 180 or max_lon]; segment 2 (wrap only): [-180, max_lon]
    x0_a = _lon_to_ix(min_lon, nx)
    x1_a = np.where(wrap, nx - 1, _lon_to_ix(max_lon, nx))
    y0 = _lat_to_iy(min_lat, ny)
    y1 = _lat_to_iy(max_lat, ny)

    nxa = x1_a - x0_a + 1
    nxb = np.where(wrap, _lon_to_ix(max_lon, nx) + 1, 0)
    nrows_y = y1 - y0 + 1
    counts = (nxa + nxb) * nrows_y
    if np.any(counts > max_cells_per_row):
        bad = int(np.argmax(counts))
        raise ValueError(
            f"bbox row {bad} covers {int(counts[bad])} cells at zoom {zoom} "
            f"(> {max_cells_per_row}); lower the zoom or area-filter first"
        )

    n = len(min_lon)
    total = int(counts.sum())
    row_index = np.repeat(np.arange(n, dtype=np.int64), counts)
    # per-pair local offset within its row's covering
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)

    nxa_r = np.repeat(nxa, counts)
    nxb_r = np.repeat(nxb, counts)
    width = nxa_r + nxb_r
    row_y = local // width
    col = local - row_y * width
    ix = np.where(
        col < nxa_r,
        np.repeat(x0_a, counts) + col,
        col - nxa_r,  # wrap segment starts at ix 0 (-180°)
    )
    iy = np.repeat(y0, counts) + row_y
    return row_index, pack_cell(zoom, ix, iy)


def disk_cells(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev grid distance ≤ k of ``cell`` (the
    (2k+1)² block), with lon wraparound and lat clamping — the ring
    expansion primitive for kNN (SURVEY.md §2.4 J4)."""
    z, ix, iy = unpack_cell(np.asarray([cell], dtype=np.uint64))
    z, ix, iy = int(z[0]), int(ix[0]), int(iy[0])
    nx, ny = grid_dims(z)
    dx = np.arange(-k, k + 1)
    dy = np.arange(-k, k + 1)
    gx, gy = np.meshgrid((ix + dx) % nx, iy + dy)
    keep = (gy >= 0) & (gy < ny)
    return pack_cell(z, gx[keep].ravel(), gy[keep].ravel())



def tile_xyz(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-mercator slippy tile (x, y) for each point at ``zoom``.

    Standard OSM formula: x = ⌊(lon+180)/360 · 2^z⌋,
    y = ⌊(1 − asinh(tan φ)/π)/2 · 2^z⌋ with lat clamped to ±85.051°.
    The oracle SQL reproduces this exactly (same float64 expression) for
    the tile-assignment correctness check.
    """
    n = 1 << zoom
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERC_MAX_LAT, MERC_MAX_LAT)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(
        np.floor((1.0 - np.arcsinh(np.tan(np.radians(lat))) / np.pi) / 2.0 * n).astype(np.int64),
        0,
        n - 1,
    )
    return x, y


def pack_tile(zoom: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return pack_cell(zoom, np.asarray(x), np.asarray(y))
