"""Vectorized point-in-polygon with PostGIS boundary semantics.

The reference's geofilter queries run ``ST_CoveredBy`` / ``ST_Contains`` /
``ST_Intersects`` against polygons via a GiST index (reference
``queries.py:57-59``, ``README.md:230-234``). For points vs a polygon the
three predicates differ only in boundary handling:

- ``ST_Contains(poly, pt)``   — pt strictly interior (boundary pt → false)
- ``ST_Intersects(poly, pt)`` — interior or boundary
- ``ST_CoveredBy(pt, poly)``  — same as intersects for a point

So the kernel classifies each point as OUTSIDE / BOUNDARY / INTERIOR and
the join stages derive the predicate from the class.

Polygons are simple rings (no holes) given as float64 coordinate arrays;
rings may be closed or open (last vertex == first is optional). Two
special cases from the fixtures (FIXTURES.md §4):

- antimeridian-crossing rings are stored *unwrapped* (lon may exceed
  180); probe points are tested at lon and lon+360;
- pole caps are not rings at all — they are ``lat >= t`` (north) or
  ``lat <= t`` (south) half-planes, classified directly.
"""

from __future__ import annotations

import numpy as np

OUTSIDE = np.int8(0)
BOUNDARY = np.int8(1)
INTERIOR = np.int8(2)


def classify_points_ring(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Classify points against one simple ring. Returns int8 array of
    OUTSIDE / BOUNDARY / INTERIOR, vectorized over (n_points × n_edges).

    Crossing-number parity with an exact on-segment boundary test (zero
    cross product + bounding range). Uses the half-open edge rule
    ``(y1 > py) != (y2 > py)`` so vertices are counted once.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring_x = np.asarray(ring_x, dtype=np.float64)
    ring_y = np.asarray(ring_y, dtype=np.float64)
    if ring_x[0] == ring_x[-1] and ring_y[0] == ring_y[-1] and len(ring_x) > 1:
        ring_x, ring_y = ring_x[:-1], ring_y[:-1]

    x1 = ring_x[None, :]
    y1 = ring_y[None, :]
    x2 = np.roll(ring_x, -1)[None, :]
    y2 = np.roll(ring_y, -1)[None, :]
    p_x = px[:, None]
    p_y = py[:, None]

    # boundary: collinear and within the segment's bounding range
    cross = (x2 - x1) * (p_y - y1) - (y2 - y1) * (p_x - x1)
    on_seg = (
        (cross == 0.0)
        & (p_x >= np.minimum(x1, x2))
        & (p_x <= np.maximum(x1, x2))
        & (p_y >= np.minimum(y1, y2))
        & (p_y <= np.maximum(y1, y2))
    ).any(axis=1)

    # crossing number (ray to +x)
    crosses_y = (y1 > p_y) != (y2 > p_y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1 + (p_y - y1) * (x2 - x1) / (y2 - y1)
    hits = crosses_y & (p_x < x_int)
    inside = hits.sum(axis=1) % 2 == 1

    out = np.zeros(px.shape, dtype=np.int8)
    out[inside] = INTERIOR
    out[on_seg] = BOUNDARY
    return out


def classify_points_polygon(
    px: np.ndarray,
    py: np.ndarray,
    ring_x: np.ndarray,
    ring_y: np.ndarray,
) -> np.ndarray:
    """Like :func:`classify_points_ring` but antimeridian-aware: if the
    ring extends past lon 180 (stored unwrapped), points are also tested
    shifted by +360 and the max class wins."""
    cls = classify_points_ring(px, py, ring_x, ring_y)
    if np.max(ring_x) > 180.0:
        cls = np.maximum(cls, classify_points_ring(px + 360.0, py, ring_x, ring_y))
    if np.min(ring_x) < -180.0:
        cls = np.maximum(cls, classify_points_ring(px - 360.0, py, ring_x, ring_y))
    return cls


def classify_points_cap(px: np.ndarray, py: np.ndarray, lat_threshold, north) -> np.ndarray:
    """Pole cap: ``lat >= t`` (north) or ``lat <= t`` (south).
    ``lat_threshold`` / ``north`` may be scalars or per-point arrays
    (the pair-vectorized join path passes arrays)."""
    py = np.asarray(py, dtype=np.float64)
    thr = np.broadcast_to(np.asarray(lat_threshold, dtype=np.float64), py.shape)
    n = np.broadcast_to(np.asarray(north, dtype=bool), py.shape)
    out = np.zeros(py.shape, dtype=np.int8)
    out[np.where(n, py > thr, py < thr)] = INTERIOR
    out[py == thr] = BOUNDARY
    _ = px
    return out


def pack_rings(rings: list[tuple[np.ndarray, np.ndarray]]) -> dict:
    """Pack many rings into flat arrays for the pair-vectorized kernel:
    ``xs``/``ys`` concatenated open rings, ``off`` per-ring start,
    ``nv`` per-ring vertex count, plus per-ring unwrap flags."""
    xs, ys, off, nv = [], [], [0], []
    plus, minus = [], []
    for rx, ry in rings:
        rx = np.asarray(rx, dtype=np.float64)
        ry = np.asarray(ry, dtype=np.float64)
        if len(rx) > 1 and rx[0] == rx[-1] and ry[0] == ry[-1]:
            rx, ry = rx[:-1], ry[:-1]
        xs.append(rx)
        ys.append(ry)
        nv.append(len(rx))
        off.append(off[-1] + len(rx))
        plus.append(bool(np.max(rx) > 180.0))
        minus.append(bool(np.min(rx) < -180.0))
    return {
        "xs": np.concatenate(xs) if xs else np.empty(0),
        "ys": np.concatenate(ys) if ys else np.empty(0),
        "off": np.asarray(off[:-1], dtype=np.int64),
        "nv": np.asarray(nv, dtype=np.int64),
        "max_nv": int(max(nv)) if nv else 0,
        "shift_plus": np.asarray(plus, dtype=bool),
        "shift_minus": np.asarray(minus, dtype=bool),
    }


def _classify_pairs_once(
    px: np.ndarray, py: np.ndarray, pack: dict, poly_idx: np.ndarray
) -> np.ndarray:
    """One classify pass per (point, ring) pair — vectorized over pairs,
    loop only over the max vertex count. Same edge rules as
    :func:`classify_points_ring` (half-open crossing, exact on-segment)."""
    xs, ys = pack["xs"], pack["ys"]
    off = pack["off"][poly_idx]
    nv = pack["nv"][poly_idx]
    n = len(px)
    crossings = np.zeros(n, dtype=np.int64)
    on_seg = np.zeros(n, dtype=bool)
    for e in range(pack["max_nv"]):
        act = nv > e
        if not act.any():
            break
        i1 = off + e
        nxt = e + 1
        i2 = np.where(nv > nxt, off + nxt, off)
        i1 = np.where(act, i1, 0)
        i2 = np.where(act, i2, 0)
        x1, y1 = xs[i1], ys[i1]
        x2, y2 = xs[i2], ys[i2]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        on_seg |= act & (
            (cross == 0.0)
            & (px >= np.minimum(x1, x2))
            & (px <= np.maximum(x1, x2))
            & (py >= np.minimum(y1, y2))
            & (py <= np.maximum(y1, y2))
        )
        crosses_y = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        crossings += act & crosses_y & (px < x_int)
    out = np.zeros(n, dtype=np.int8)
    out[crossings % 2 == 1] = INTERIOR
    out[on_seg] = BOUNDARY
    return out


def classify_pairs_rings(
    px: np.ndarray, py: np.ndarray, pack: dict, poly_idx: np.ndarray
) -> np.ndarray:
    """Antimeridian-aware pair classify (the pair-vectorized form of
    :func:`classify_points_polygon`): pairs whose ring is stored
    unwrapped are re-tested at lon ± 360 and the max class wins."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    cls = _classify_pairs_once(px, py, pack, poly_idx)
    for flag, shift in ((pack["shift_plus"], 360.0), (pack["shift_minus"], -360.0)):
        if flag.any():
            m = flag[poly_idx]
            if m.any():
                cls[m] = np.maximum(
                    cls[m], _classify_pairs_once(px[m] + shift, py[m], pack, poly_idx[m])
                )
    return cls


def ring_bbox(ring_x: np.ndarray, ring_y: np.ndarray) -> tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) of a ring, in its own
    (possibly unwrapped) coordinate frame."""
    return float(np.min(ring_x)), float(np.min(ring_y)), float(np.max(ring_x)), float(np.max(ring_y))


def is_axis_rect(ring_x: np.ndarray, ring_y: np.ndarray) -> bool:
    """True when a ring is an axis-aligned rectangle (the reference's
    envelope geometry, ``changesetmd.py:164-174``) — eligible for the
    comparison fast path. Degenerate (point/line) envelopes return False
    (their vertex list collapses) and take the generic ray-casting path,
    which classifies them correctly."""
    x = np.asarray(ring_x, dtype=np.float64)
    y = np.asarray(ring_y, dtype=np.float64)
    if len(x) > 1 and x[0] == x[-1] and y[0] == y[-1]:
        x, y = x[:-1], y[:-1]
    if len(x) != 4:
        return False
    # every edge must be horizontal or vertical, and the 4 corners must
    # be the bbox corners each exactly once
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    if not (((x == x2) | (y == y2)).all()):
        return False
    corners = {(float(a), float(b)) for a, b in zip(x, y)}
    lo_x, lo_y, hi_x, hi_y = ring_bbox(x, y)
    want = {(lo_x, lo_y), (lo_x, hi_y), (hi_x, lo_y), (hi_x, hi_y)}
    return corners == want


def classify_pairs_rects(
    px: np.ndarray, py: np.ndarray, rects: dict, rect_idx: np.ndarray
) -> np.ndarray:
    """Pair classify against axis-aligned rectangles by comparison —
    identical classes to ray casting (INTERIOR strictly inside,
    BOUNDARY on an edge incl. degenerate point/line envelopes), ~10×
    cheaper. Antimeridian-unwrapped rects re-test at lon ± 360."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)

    def once(qx, qy, idx):
        lo_x, lo_y = rects["lo_x"][idx], rects["lo_y"][idx]
        hi_x, hi_y = rects["hi_x"][idx], rects["hi_y"][idx]
        inside = (qx > lo_x) & (qx < hi_x) & (qy > lo_y) & (qy < hi_y)
        within = (qx >= lo_x) & (qx <= hi_x) & (qy >= lo_y) & (qy <= hi_y)
        out = np.zeros(len(qx), dtype=np.int8)
        out[within] = BOUNDARY
        out[inside] = INTERIOR
        return out

    cls = once(px, py, rect_idx)
    for flag, shift in ((rects["shift_plus"], 360.0), (rects["shift_minus"], -360.0)):
        if flag.any():
            m = flag[rect_idx]
            if m.any():
                cls[m] = np.maximum(cls[m], once(px[m] + shift, py[m], rect_idx[m]))
    return cls
