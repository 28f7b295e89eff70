"""Axis-aligned envelope (bbox) kernels with PostGIS-parity semantics.

The reference stores every changeset geometry as the bbox envelope
``ST_MakeValid(ST_MakeEnvelope(min_lon, min_lat, max_lon, max_lat, 4326))``
(reference ``changesetmd.py:164-174``) and its documented geo-queries run
rectangle predicates against it (``README.md:184-188, 230-234``). These
kernels reproduce that behavior in vectorized numpy:

- ``normalize_bbox``   — the ``ST_MakeValid`` analogue: clamp out-of-range
  latitudes (the reference README warns real data contains them,
  ``README.md:187-188``) and classify degenerate envelopes
  (point / line) the way ``ST_MakeValid`` collapses them.
- ``bbox_intersects``  — ``ST_Intersects`` for two rectangle sets
  (closed boxes: boundary touch counts).
- ``bbox_contains``    — ``ST_Contains(A, B)``: B inside closed A *and*
  interiors intersect (pure boundary contact is NOT containment).
- ``bbox_coveredby``   — ``ST_CoveredBy(B, A)``: B within closed A.
- ``bbox_area_sq_m``   — equal-area (cylindrical) bbox area in m², the
  analogue of ``ST_Area(ST_Transform(geom, 3410))`` used by the
  documented "drop continent-sized bboxes" filter (``README.md:184-186``).

All functions broadcast over numpy arrays and never loop over rows.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius (IUGG)

# Degeneracy classes mirroring what ST_MakeValid collapses an envelope to.
GEOM_EMPTY = 0  # no bbox at all (all-null coords)
GEOM_POINT = 1  # min_lon == max_lon and min_lat == max_lat
GEOM_LINE = 2  # exactly one dimension collapsed
GEOM_POLY = 3  # proper rectangle


def normalize_bbox(
    min_lon: np.ndarray,
    min_lat: np.ndarray,
    max_lon: np.ndarray,
    max_lat: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Clamp/repair raw bbox columns; returns (min_lon, min_lat, max_lon,
    max_lat, geom_class).

    - latitudes clamped to [-90, 90] (reference ``README.md:187-188``);
    - longitudes clamped to [-180, 180] (antimeridian-*crossing* boxes are
      represented upstream as min_lon > max_lon and left untouched here —
      the grid cover splits them, see :mod:`changesetmd_ray.geo.grid`);
    - swapped min/max lat repaired by swap (matches envelope semantics:
      ``ST_MakeEnvelope`` with inverted coords still yields the box);
    - NaN anywhere → GEOM_EMPTY.

    Inputs may contain NaN for "no bbox" rows (~3% in the reference's 50k
    fixture). float64 in/out, never modifies inputs in place.
    """
    min_lon = np.asarray(min_lon, dtype=np.float64)
    min_lat = np.asarray(min_lat, dtype=np.float64)
    max_lon = np.asarray(max_lon, dtype=np.float64)
    max_lat = np.asarray(max_lat, dtype=np.float64)

    empty = (
        np.isnan(min_lon) | np.isnan(min_lat) | np.isnan(max_lon) | np.isnan(max_lat)
    )

    lat_lo = np.clip(np.minimum(min_lat, max_lat), -90.0, 90.0)
    lat_hi = np.clip(np.maximum(min_lat, max_lat), -90.0, 90.0)
    lon_lo = np.clip(min_lon, -180.0, 180.0)
    lon_hi = np.clip(max_lon, -180.0, 180.0)

    pt = (lon_lo == lon_hi) & (lat_lo == lat_hi)
    line = ((lon_lo == lon_hi) | (lat_lo == lat_hi)) & ~pt
    geom = np.full(min_lon.shape, GEOM_POLY, dtype=np.int8)
    geom[line] = GEOM_LINE
    geom[pt] = GEOM_POINT
    geom[empty] = GEOM_EMPTY
    return lon_lo, lat_lo, lon_hi, lat_hi, geom


def _interval_overlap_closed(a_lo, a_hi, b_lo, b_hi):
    return (a_lo <= b_hi) & (b_lo <= a_hi)


def bbox_intersects(a, b) -> np.ndarray:
    """``ST_Intersects`` between two broadcastable rectangle sets.

    ``a`` and ``b`` are 4-tuples ``(min_lon, min_lat, max_lon, max_lat)``
    of arrays (already normalized, no antimeridian wrap). Closed-box
    semantics: touching edges/corners intersect — matches PostGIS, where
    ``ST_Intersects`` is true on boundary contact.
    """
    a_lo_x, a_lo_y, a_hi_x, a_hi_y = a
    b_lo_x, b_lo_y, b_hi_x, b_hi_y = b
    return _interval_overlap_closed(a_lo_x, a_hi_x, b_lo_x, b_hi_x) & _interval_overlap_closed(
        a_lo_y, a_hi_y, b_lo_y, b_hi_y
    )


def bbox_coveredby(inner, outer) -> np.ndarray:
    """``ST_CoveredBy(inner, outer)``: inner entirely within closed outer
    (boundary contact allowed). The documented reference geofilter uses
    exactly this shape against an envelope (``README.md:230-234``)."""
    i_lo_x, i_lo_y, i_hi_x, i_hi_y = inner
    o_lo_x, o_lo_y, o_hi_x, o_hi_y = outer
    return (
        (i_lo_x >= o_lo_x) & (i_hi_x <= o_hi_x) & (i_lo_y >= o_lo_y) & (i_hi_y <= o_hi_y)
    )


def bbox_contains(outer, inner, inner_geom: np.ndarray | None = None) -> np.ndarray:
    """``ST_Contains(outer, inner)`` for rectangles.

    PostGIS: true iff inner ⊆ closed(outer) AND interior(outer) ∩
    interior(inner) ≠ ∅. For an inner with positive area that lies within
    outer, interiors always meet, even when edges touch. For degenerate
    inner (point / line — what ``ST_MakeValid`` collapses a zero-area
    envelope to, reference ``changesetmd.py:166``), the inner's "interior"
    is the point / open segment, so an inner lying entirely ON outer's
    boundary is NOT contained.

    ``inner_geom`` is the GEOM_* class array from :func:`normalize_bbox`;
    when omitted it is derived from the inner coords.
    """
    o_lo_x, o_lo_y, o_hi_x, o_hi_y = outer
    i_lo_x, i_lo_y, i_hi_x, i_hi_y = inner
    covered = bbox_coveredby(inner, outer)

    if inner_geom is None:
        pt = (np.asarray(i_lo_x) == i_hi_x) & (np.asarray(i_lo_y) == i_hi_y)
        line = ((np.asarray(i_lo_x) == i_hi_x) | (np.asarray(i_lo_y) == i_hi_y)) & ~pt
        poly = ~(pt | line)
    else:
        poly = inner_geom == GEOM_POLY

    # Interior-meets-interior test. Positive-area inner inside outer always
    # qualifies unless *outer* itself is degenerate — handled by the strict
    # overlap below, which is the general correct condition:
    # open-interval overlap in both axes between the two boxes' extents,
    # except a degenerate inner axis only needs its (single) coordinate to
    # lie strictly inside outer's open interval *unless* outer is also
    # degenerate on that axis at the same coordinate.
    def axis_interior_overlap(o_lo, o_hi, i_lo, i_hi):
        inner_degen = i_lo == i_hi
        outer_degen = o_lo == o_hi
        # both degenerate: interiors on this axis coincide iff equal coords
        both = inner_degen & outer_degen & (i_lo == o_lo)
        # inner degenerate, outer not: coordinate strictly inside outer
        in_only = inner_degen & ~outer_degen & (i_lo > o_lo) & (i_lo < o_hi)
        # inner proper: open intervals must overlap
        proper = ~inner_degen & (np.minimum(i_hi, o_hi) > np.maximum(i_lo, o_lo))
        return both | in_only | proper

    interiors = axis_interior_overlap(o_lo_x, o_hi_x, i_lo_x, i_hi_x) & axis_interior_overlap(
        o_lo_y, o_hi_y, i_lo_y, i_hi_y
    )
    _ = poly  # class retained for callers that pre-filter; logic above is general
    return covered & interiors


def bbox_area_sq_m(min_lon, min_lat, max_lon, max_lat) -> np.ndarray:
    """Equal-area bbox area in m² (Lambert cylindrical equal-area, the
    same family as EPSG:3410 used by the reference's documented area
    filter, ``README.md:184-186``).

    area = R² · Δλ(rad) · (sin φ₂ − sin φ₁). Exact for lat/lon
    rectangles on the sphere.
    """
    min_lon = np.asarray(min_lon, dtype=np.float64)
    max_lon = np.asarray(max_lon, dtype=np.float64)
    # wrapped boxes (min_lon > max_lon, the normalize_bbox antimeridian
    # representation) span max-min+360 — the raw difference would yield
    # the COMPLEMENT area; normal boxes (incl. the full ±180 sphere) are
    # untouched
    diff = max_lon - min_lon
    dlon = np.where(diff >= 0.0, diff, diff + 360.0)
    dlam = np.radians(dlon)
    s = np.sin(np.radians(np.asarray(max_lat, dtype=np.float64))) - np.sin(
        np.radians(np.asarray(min_lat, dtype=np.float64))
    )
    return (EARTH_RADIUS_M**2) * np.abs(dlam) * np.abs(s)
