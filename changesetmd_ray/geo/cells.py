"""S2 cell ids from scratch (vectorized numpy), per the published S2
geometry spec (s2geometry.io: quadratic ST projection, Hilbert curve
cell ids, levels 0–30).

Pipeline: lat/lng → unit xyz → cube face + (u,v) → quadratic (s,t) →
30-bit (i,j) → Hilbert position via 4-bit lookup tables → 64-bit cell id
``face(3 bits) | hilbert position | trailing 1``.

These ids serve the role of the reference's GiST spatial index
(reference ``queries.py:57-59``): a sortable, hierarchical locality key
carried as a uint64 column. Hierarchy ops (level / parent / children /
range) are pure bit arithmetic, so Parquet row-group min/max stats on a
sorted ``s2_cell`` column give the same pruning a GiST gives Postgres.

Property-tested (hierarchy containment, roundtrip stability, level math)
rather than bit-compared against the C++ library (not installable here);
SURVEY.md §7 explicitly scopes correctness to these properties since all
join outputs are verified against the geometry oracle, not cell ids.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell orderings (canonical S2 tables).
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


def _build_lookups() -> tuple[np.ndarray, np.ndarray]:
    """lookup_pos[(ij << 2) | orient] = (pos << 2) | new_orient, and the
    inverse lookup_ij, for 4-level (8-bit) chunks."""
    size = 1 << (2 * _LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.int64)
    lookup_ij = np.zeros(size, dtype=np.int64)

    def init(level: int, i: int, j: int, orig_orient: int, pos: int, orient: int):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for index in range(4):
            ij = int(r[index])
            init(
                level,
                i + (ij >> 1),
                j + (ij & 1),
                orig_orient,
                pos + index,
                orient ^ int(_POS_TO_ORIENT[index]),
            )

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


def _latlng_to_xyz(lat: np.ndarray, lon: np.ndarray):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        (face == 0) & (x < 0), 3, np.where((face == 1) & (y < 0), 3, np.where((face == 2) & (z < 0), 3, 0))
    )
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (unum, uden, vnum) in enumerate(
        [
            (lambda: y, lambda: x, lambda: z),  # face 0: +x
            (lambda: -np.asarray(x), lambda: y, lambda: z),  # face 1: +y
            (lambda: -np.asarray(x), lambda: z, lambda: -np.asarray(y)),  # face 2: +z
            (lambda: z, lambda: x, lambda: y),  # face 3: -x
            (lambda: z, lambda: y, lambda: -np.asarray(x)),  # face 4: -y
            (lambda: -np.asarray(y), lambda: z, lambda: -np.asarray(x)),  # face 5: -z
        ]
    ):
        m = face == f
        if np.any(m):
            den = uden()[m] if isinstance(uden(), np.ndarray) else uden()
            u[m] = unum()[m] / den
            v[m] = vnum()[m] / den
    return face.astype(np.int64), u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2 default): better cell area uniformity
    than linear, cheap to invert."""
    with np.errstate(invalid="ignore"):  # unselected branch may sqrt(<0)
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def cell_from_latlng(lat: np.ndarray, lon: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """uint64 S2 cell id at ``level`` for each (lat, lon) point."""
    x, y, z = _latlng_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_st_from_uv(u))
    j = _st_to_ij(_st_from_uv(v))
    return cell_from_face_ij(face, i, j, level)


def cell_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Hilbert encode (face, i, j) → leaf cell id, then snap to level."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = (face & np.uint64(_SWAP)).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        ib = ((i >> np.uint64(k * 4)).astype(np.int64)) & mask
        jb = ((j >> np.uint64(k * 4)).astype(np.int64)) & mask
        idx = bits + (((ib << _LOOKUP_BITS) + jb) << 2)
        out = _LOOKUP_POS[idx]
        n |= (out.astype(np.uint64) >> np.uint64(2)) << np.uint64(k * 8)
        bits = out & (_SWAP | _INVERT)
    leaf = n * np.uint64(2) + np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf
    return parent(leaf, level)


def cell_to_face_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (face, i, j) of the leaf centre of each cell id."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(61)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros(cell.shape, dtype=np.uint64)
    j = np.zeros(cell.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        # top round has only 30 - 7*4 = 2 levels → 4 position bits
        nlevels = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        pos = ((cell >> np.uint64(k * 8 + 1)).astype(np.int64)) & ((1 << (2 * nlevels)) - 1)
        idx = bits + (pos << 2)
        out = _LOOKUP_IJ[idx]
        ij = out >> 2
        i += np.asarray((ij >> _LOOKUP_BITS), dtype=np.uint64) << np.uint64(k * 4)
        j += np.asarray((ij & ((1 << _LOOKUP_BITS) - 1)), dtype=np.uint64) << np.uint64(k * 4)
        bits = out & (_SWAP | _INVERT)
    return face, i.astype(np.int64), j.astype(np.int64)


def lsb(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    return cell & (~cell + np.uint64(1))


def level(cell: np.ndarray) -> np.ndarray:
    """Level of each cell id (0..30)."""
    l = lsb(cell)
    # lsb == 2^(2*(30-level)); count trailing zeros via log2 on exact powers
    tz = np.round(np.log2(l.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def parent(cell: np.ndarray, lvl: int) -> np.ndarray:
    """Ancestor of each cell at level ``lvl``."""
    cell = np.asarray(cell, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - lvl))
    return (cell & (~new_lsb + np.uint64(1))) | new_lsb


def children(cell: int) -> np.ndarray:
    """The 4 children of a single cell id."""
    cell = np.uint64(cell)
    old = int(lsb(np.asarray([cell]))[0])
    new = np.uint64(old >> 2)
    base = cell - np.uint64(old) + new
    return base + np.arange(4, dtype=np.uint64) * np.uint64(2) * new


def range_min(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    return cell - (lsb(cell) - np.uint64(1))


def range_max(cell: np.ndarray) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    return cell + (lsb(cell) - np.uint64(1))


def contains(ancestor: np.ndarray, descendant: np.ndarray) -> np.ndarray:
    return (range_min(ancestor) <= np.asarray(descendant, dtype=np.uint64)) & (
        np.asarray(descendant, dtype=np.uint64) <= range_max(ancestor)
    )


def cell_center_latlng(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) of each cell's centre (degrees)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face, i, j = cell_to_face_ij(cell)
    lvl = level(cell)
    # snap decoded leaf ij to the cell's base corner, then step to centre;
    # a leaf cell's centre sits at (i + 0.5) in leaf units
    cell_size_ij = np.left_shift(np.int64(1), (MAX_LEVEL - lvl).astype(np.int64))
    i0 = (i // cell_size_ij) * cell_size_ij
    j0 = (j // cell_size_ij) * cell_size_ij
    half = cell_size_ij / 2.0  # 0.5 for leaves, size/2 otherwise
    si = i0.astype(np.float64) + half
    sj = j0.astype(np.float64) + half
    s = si / float(1 << MAX_LEVEL)
    t = sj / float(1 << MAX_LEVEL)
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    specs = [
        (lambda u, v: (np.ones_like(u), u, v)),  # face 0
        (lambda u, v: (-u, np.ones_like(u), v)),  # face 1
        (lambda u, v: (-u, -v, np.ones_like(u))),  # face 2
        (lambda u, v: (-np.ones_like(u), -v, -u)),  # face 3
        (lambda u, v: (v, -np.ones_like(u), -u)),  # face 4
        (lambda u, v: (v, u, -np.ones_like(u))),  # face 5
    ]
    for f, fn in enumerate(specs):
        m = face == f
        if np.any(m):
            xf, yf, zf = fn(u[m], v[m])
            x[m], y[m], z[m] = xf, yf, zf
    norm = np.sqrt(x * x + y * y + z * z)
    return x / norm, y / norm, z / norm
