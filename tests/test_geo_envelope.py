"""Envelope kernels vs PostGIS rectangle semantics (SURVEY.md §2.4 J2 note)."""

import numpy as np

from changesetmd_ray.geo.envelope import (
    GEOM_EMPTY,
    GEOM_LINE,
    GEOM_POINT,
    GEOM_POLY,
    bbox_area_sq_m,
    bbox_contains,
    bbox_coveredby,
    bbox_intersects,
    normalize_bbox,
)


def B(*vals):
    return tuple(np.asarray([v], dtype=np.float64) for v in vals)


def test_normalize_clamps_out_of_range_lat():
    # reference README.md:187-188: latitudes like 90.000001 exist in real data
    lo_x, lo_y, hi_x, hi_y, g = normalize_bbox(
        np.array([10.0]), np.array([89.0]), np.array([11.0]), np.array([90.000001])
    )
    assert hi_y[0] == 90.0 and g[0] == GEOM_POLY


def test_normalize_swapped_lat_and_degenerate_classes():
    lo_x, lo_y, hi_x, hi_y, g = normalize_bbox(
        np.array([0.0, 5.0, 5.0, np.nan]),
        np.array([10.0, 1.0, 1.0, 2.0]),
        np.array([1.0, 5.0, 5.0, 3.0]),
        np.array([2.0, 1.0, 8.0, 4.0]),
    )
    assert lo_y[0] == 2.0 and hi_y[0] == 10.0  # swap repaired
    assert g[1] == GEOM_POINT
    assert g[2] == GEOM_LINE
    assert g[3] == GEOM_EMPTY


def test_intersects_boundary_touch_counts():
    a = B(0.0, 0.0, 1.0, 1.0)
    assert bbox_intersects(a, B(1.0, 0.0, 2.0, 1.0))[0]  # edge touch
    assert bbox_intersects(a, B(1.0, 1.0, 2.0, 2.0))[0]  # corner touch
    assert not bbox_intersects(a, B(1.0000001, 0.0, 2.0, 1.0))[0]


def test_coveredby_allows_boundary_contact():
    outer = B(0.0, 0.0, 10.0, 10.0)
    assert bbox_coveredby(B(0.0, 0.0, 5.0, 5.0), outer)[0]
    assert bbox_coveredby(outer, outer)[0]
    assert not bbox_coveredby(B(-0.1, 0.0, 5.0, 5.0), outer)[0]


def test_contains_interior_rules():
    outer = B(0.0, 0.0, 10.0, 10.0)
    # proper inner touching the edge: interiors still meet -> contained
    assert bbox_contains(outer, B(0.0, 0.0, 5.0, 5.0))[0]
    # point strictly inside
    assert bbox_contains(outer, B(5.0, 5.0, 5.0, 5.0))[0]
    # point ON the boundary: NOT contained (PostGIS ST_Contains)
    assert not bbox_contains(outer, B(0.0, 5.0, 0.0, 5.0))[0]
    # line lying entirely on the boundary: NOT contained
    assert not bbox_contains(outer, B(0.0, 0.0, 0.0, 10.0))[0]
    # line crossing the interior: contained
    assert bbox_contains(outer, B(2.0, 2.0, 2.0, 8.0))[0]
    # identical boxes: contains itself (interiors coincide)
    assert bbox_contains(outer, outer)[0]


def test_area_matches_sphere_formulas():
    # whole sphere: 4πR²
    full = bbox_area_sq_m(-180.0, -90.0, 180.0, 90.0)
    assert np.isclose(full, 4.0 * np.pi * 6_371_008.8**2, rtol=1e-12)
    # 1°x1° at the equator ≈ 111.19 km × 111.17 km
    one = bbox_area_sq_m(0.0, 0.0, 1.0, 1.0)
    assert 1.23e10 < one < 1.24e10


def test_area_filter_drops_continent_sized_boxes():
    # reference README.md:184-186: drop bboxes over 225,000,000,000 m²... the
    # documented threshold is 225e6 *in EPSG:3410 units of the query* —
    # semantics: huge boxes are filterable by a pure-numpy area predicate.
    areas = bbox_area_sq_m(
        np.array([0.0, 0.0]), np.array([0.0, 0.0]), np.array([0.1, 60.0]), np.array([0.1, 60.0])
    )
    assert areas[0] < 225e6 * 1e3 < areas[1]
