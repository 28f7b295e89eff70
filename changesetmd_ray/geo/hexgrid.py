"""H3-style hierarchical hexagonal cell index (res 0–15), from scratch.

Follows the published H3 design principles (aperture-7 hexagon hierarchy:
each resolution shrinks cell size by √7 and rotates the lattice by
atan(√3/5) ≈ 19.1066°, Uber H3 docs) on an equirectangular lon/lat plane
instead of icosahedron gnomonic faces — SURVEY.md §7 scopes this
explicitly: canonical H3 *bit* parity is out of reach without the C
library to diff against, but the *properties* (hierarchy, rings,
neighbor symmetry, covering) are what the engine relies on, and all join
outputs are verified against the geometry oracle, never against cell ids.

Like real H3, parent/child containment is approximate (hexagons don't
tile hexagons); the guaranteed property — used by the tests — is that a
child's centre always falls inside its parent's hexagon.

Cell id layout (uint64): ``res(4 bits) << 60 | (q + 2^29) << 30 |
(r + 2^29)`` with (q, r) the axial coordinates of a pointy-top hexagon.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
_ROT = float(np.arctan(np.sqrt(3.0) / 5.0))  # aperture-7 lattice rotation
_R0 = 32.0  # res-0 hex circumradius, degrees
_SQRT3 = float(np.sqrt(3.0))
_OFF = np.int64(1 << 29)

# axial neighbor directions, pointy-top
_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def _res_size(res: int) -> float:
    return _R0 * 7.0 ** (-res / 2.0)


def _res_rot(res: int) -> float:
    return _ROT * res


def _to_axial(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Fractional axial coords of each point at ``res``."""
    c, s = np.cos(-_res_rot(res)), np.sin(-_res_rot(res))
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    xr = x * c - y * s
    yr = x * s + y * c
    size = _res_size(res)
    q = (_SQRT3 / 3.0 * xr - 1.0 / 3.0 * yr) / size
    r = (2.0 / 3.0 * yr) / size
    return q, r


def _axial_to_lonlat(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    size = _res_size(res)
    xr = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    yr = size * (1.5 * r)
    c, s = np.cos(_res_rot(res)), np.sin(_res_rot(res))
    return xr * c - yr * s, xr * s + yr * c


def _cube_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial coords to the nearest hex (cube rounding)."""
    x = q
    z = r
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """uint64 hex cell id for each point at resolution ``res`` (0–15)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    q, r = _cube_round(*_to_axial(lon, lat, res))
    return (
        (np.uint64(res) << np.uint64(60))
        | ((q + _OFF).astype(np.uint64) << np.uint64(30))
        | (r + _OFF).astype(np.uint64)
    )


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(res, q, r) of each cell id."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.int64)
    q = ((cell >> np.uint64(30)) & np.uint64((1 << 30) - 1)).astype(np.int64) - _OFF
    r = (cell & np.uint64((1 << 30) - 1)).astype(np.int64) - _OFF
    return res, q, r


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) of each cell's centre. Mixed-resolution input is fine."""
    res, q, r = decode(cell)
    lon = np.empty(len(res), dtype=np.float64)
    lat = np.empty(len(res), dtype=np.float64)
    for rv in np.unique(res):
        m = res == rv
        lon[m], lat[m] = _axial_to_lonlat(q[m].astype(np.float64), r[m].astype(np.float64), int(rv))
    return lon, lat


def parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Parent cell (default: one resolution coarser): the hex whose area
    contains this cell's centre — same approximate-containment semantics
    as canonical H3 ``h3ToParent``."""
    res, _, _ = decode(cell)
    lon, lat = cell_center(cell)
    if parent_res is not None:
        return encode(lon, lat, parent_res)
    # per-ELEMENT parent resolution (mixed-res input is valid, as in
    # cell_center); res-0 cells have no parent
    if np.any(res == 0):
        raise ValueError("res-0 cells have no parent")
    out = np.empty(len(cell), dtype=np.uint64)
    for pr in np.unique(res - 1):
        m = res - 1 == pr
        out[m] = encode(lon[m], lat[m], int(pr))
    return out


def neighbors(cell: int) -> np.ndarray:
    """The 6 adjacent cells (same resolution)."""
    res, q, r = decode(np.asarray([cell], dtype=np.uint64))
    qs = q[0] + _DIRS[:, 0]
    rs = r[0] + _DIRS[:, 1]
    return (
        (np.uint64(int(res[0])) << np.uint64(60))
        | ((qs + _OFF).astype(np.uint64) << np.uint64(30))
        | (rs + _OFF).astype(np.uint64)
    )


def ring(cell: int, k: int) -> np.ndarray:
    """All cells at hex distance exactly k (the k-ring boundary); k=0 →
    the cell itself. Standard axial ring walk, vectorized per side."""
    res, q, r = decode(np.asarray([cell], dtype=np.uint64))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    if k == 0:
        return np.asarray([cell], dtype=np.uint64)
    qs, rs = [], []
    cq, cr = q + _DIRS[4][0] * k, r + _DIRS[4][1] * k  # start k steps in dir 4
    for d in range(6):
        for _ in range(k):
            qs.append(cq)
            rs.append(cr)
            cq += int(_DIRS[d][0])
            cr += int(_DIRS[d][1])
    qa = np.asarray(qs, dtype=np.int64)
    ra = np.asarray(rs, dtype=np.int64)
    return (
        (np.uint64(res) << np.uint64(60))
        | ((qa + _OFF).astype(np.uint64) << np.uint64(30))
        | (ra + _OFF).astype(np.uint64)
    )


def hex_distance(a: int, b: int) -> int:
    """Hex (axial) distance between two same-resolution cells."""
    _, qa, ra = decode(np.asarray([a], dtype=np.uint64))
    _, qb, rb = decode(np.asarray([b], dtype=np.uint64))
    dq = int(qa[0] - qb[0])
    dr = int(ra[0] - rb[0])
    return int((abs(dq) + abs(dr) + abs(dq + dr)) // 2)


def circumradius_deg(res: int) -> float:
    """Hex circumradius in degrees at ``res`` (for containment checks)."""
    return _res_size(res)
