"""Point-in-polygon boundary semantics + STRtree vs brute force."""

import numpy as np

from changesetmd_ray.geo.pip import (
    BOUNDARY,
    INTERIOR,
    OUTSIDE,
    classify_points_cap,
    classify_points_polygon,
    classify_points_ring,
)
from changesetmd_ray.geo.strtree import STRtree

SQUARE_X = np.array([0.0, 10.0, 10.0, 0.0])
SQUARE_Y = np.array([0.0, 0.0, 10.0, 10.0])


def test_square_classification():
    px = np.array([5.0, 0.0, 10.0, 5.0, -1.0, 10.0, 0.0])
    py = np.array([5.0, 5.0, 10.0, 0.0, 5.0, 10.000001, 0.0])
    cls = classify_points_ring(px, py, SQUARE_X, SQUARE_Y)
    assert cls[0] == INTERIOR
    assert cls[1] == BOUNDARY  # on left edge
    assert cls[2] == BOUNDARY  # on corner
    assert cls[3] == BOUNDARY  # on bottom edge
    assert cls[4] == OUTSIDE
    assert cls[5] == OUTSIDE
    assert cls[6] == BOUNDARY  # corner vertex


def test_concave_polygon():
    # U-shape: notch from above
    rx = np.array([0.0, 10.0, 10.0, 7.0, 7.0, 3.0, 3.0, 0.0])
    ry = np.array([0.0, 0.0, 10.0, 10.0, 3.0, 3.0, 10.0, 10.0])
    px = np.array([5.0, 5.0, 1.0, 8.5, 5.0])
    py = np.array([8.0, 1.0, 8.0, 8.0, 3.0])
    cls = classify_points_ring(px, py, rx, ry)
    assert cls[0] == OUTSIDE  # inside the notch
    assert cls[1] == INTERIOR
    assert cls[2] == INTERIOR
    assert cls[3] == INTERIOR
    assert cls[4] == BOUNDARY  # on notch bottom edge


def test_closed_ring_equivalent_to_open():
    rx = np.append(SQUARE_X, SQUARE_X[0])
    ry = np.append(SQUARE_Y, SQUARE_Y[0])
    rng = np.random.default_rng(7)
    px = rng.uniform(-2, 12, 500)
    py = rng.uniform(-2, 12, 500)
    a = classify_points_ring(px, py, SQUARE_X, SQUARE_Y)
    b = classify_points_ring(px, py, rx, ry)
    assert np.array_equal(a, b)


def test_antimeridian_polygon():
    # unwrapped ring spanning lon 170..190 (i.e. crossing ±180)
    rx = np.array([170.0, 190.0, 190.0, 170.0])
    ry = np.array([-5.0, -5.0, 5.0, 5.0])
    px = np.array([175.0, -175.0, -169.0, 0.0])
    py = np.array([0.0, 0.0, 0.0, 0.0])
    cls = classify_points_polygon(px, py, rx, ry)
    assert cls[0] == INTERIOR
    assert cls[1] == INTERIOR  # -175 ≡ 185
    assert cls[2] == OUTSIDE  # -169 ≡ 191
    assert cls[3] == OUTSIDE


def test_pole_cap():
    cls = classify_points_cap(np.zeros(3), np.array([80.0, 70.0, 60.0]), 70.0, north=True)
    assert list(cls) == [INTERIOR, BOUNDARY, OUTSIDE]
    cls = classify_points_cap(np.zeros(2), np.array([-80.0, -60.0]), -70.0, north=False)
    assert list(cls) == [INTERIOR, OUTSIDE]


def test_strtree_matches_bruteforce_points_and_boxes():
    rng = np.random.default_rng(42)
    n = 300
    lx = rng.uniform(-180, 175, n)
    ly = rng.uniform(-90, 85, n)
    hx = lx + rng.uniform(0, 8, n)
    hy = ly + rng.uniform(0, 8, n)
    tree = STRtree(lx, ly, hx, hy, node_capacity=8)

    # point probes
    px = rng.uniform(-180, 180, 200)
    py = rng.uniform(-90, 90, 200)
    qi, ii = tree.query_points(px, py)
    got = set(zip(qi.tolist(), ii.tolist()))
    inside = (px[:, None] >= lx[None, :]) & (px[:, None] <= hx[None, :]) & (
        py[:, None] >= ly[None, :]
    ) & (py[:, None] <= hy[None, :])
    want = set(zip(*np.nonzero(inside)))
    assert got == want

    # box probes
    qlx = rng.uniform(-180, 175, 50)
    qly = rng.uniform(-90, 85, 50)
    qhx = qlx + rng.uniform(0, 15, 50)
    qhy = qly + rng.uniform(0, 15, 50)
    qi, ii = tree.query_boxes(qlx, qly, qhx, qhy)
    got = set(zip(qi.tolist(), ii.tolist()))
    ov = (
        (qlx[:, None] <= hx[None, :])
        & (qhx[:, None] >= lx[None, :])
        & (qly[:, None] <= hy[None, :])
        & (qhy[:, None] >= ly[None, :])
    )
    want = set(zip(*np.nonzero(ov)))
    assert got == want


def test_strtree_edge_sizes():
    # empty tree
    t = STRtree(np.empty(0), np.empty(0), np.empty(0), np.empty(0))
    qi, ii = t.query_points(np.array([1.0]), np.array([1.0]))
    assert len(qi) == 0
    # single item
    t = STRtree(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0]))
    qi, ii = t.query_points(np.array([0.5, 2.0]), np.array([0.5, 2.0]))
    assert list(qi) == [0] and list(ii) == [0]


def test_rect_fast_path_parity():
    """classify_pairs_rects == generic ray casting on random rectangles
    (incl. edge/corner probes); degenerate rects are not fast-pathed."""
    from changesetmd_ray.geo.pip import (
        classify_pairs_rects,
        classify_points_polygon,
        is_axis_rect,
    )

    rng = np.random.RandomState(4)
    checked = 0
    for _ in range(100):
        lo_x, lo_y = rng.uniform(-180, 170), rng.uniform(-85, 80)
        hi_x, hi_y = lo_x + rng.uniform(1e-6, 30), lo_y + rng.uniform(1e-6, 20)
        rx = np.array([lo_x, hi_x, hi_x, lo_x])
        ry = np.array([lo_y, lo_y, hi_y, hi_y])
        assert is_axis_rect(rx, ry)
        px = np.concatenate([rng.uniform(lo_x - 1, hi_x + 1, 40), [lo_x, hi_x, (lo_x + hi_x) / 2]])
        py = np.concatenate([rng.uniform(lo_y - 1, hi_y + 1, 40), [lo_y, hi_y, (lo_y + hi_y) / 2]])
        a = classify_points_polygon(px, py, rx, ry)
        rects = {
            "lo_x": np.array([lo_x]), "lo_y": np.array([lo_y]),
            "hi_x": np.array([hi_x]), "hi_y": np.array([hi_y]),
            "shift_plus": np.array([hi_x > 180.0]),
            "shift_minus": np.array([lo_x < -180.0]),
        }
        b = classify_pairs_rects(px, py, rects, np.zeros(len(px), np.int64))
        assert (a == b).all()
        checked += 1
    assert checked == 100
    # degenerate: rejected from the fast path
    assert not is_axis_rect(np.array([0.0, 1.0, 1.0, 0.0]), np.array([5.0, 5.0, 5.0, 5.0]))
    # non-rect ring: rejected
    assert not is_axis_rect(np.array([0.0, 2.0, 1.0]), np.array([0.0, 0.0, 2.0]))


def test_point_grid_matches_strtree():
    """PointGrid.query_points returns exactly STRtree.query_points' pair
    set on random boxes (incl. globe-spanning wide items routed through
    the always-candidate list) and random/edge probes."""
    from changesetmd_ray.geo.strtree import PointGrid, STRtree

    rng = np.random.RandomState(11)
    for trial in range(5):
        n = int(rng.randint(1, 400))
        lx = rng.uniform(-200, 160, n)
        ly = rng.uniform(-90, 80, n)
        hx = lx + rng.uniform(0, 40, n)
        hy = ly + rng.uniform(0, 15, n)
        if trial % 2:
            # a couple of wide items: polar-cap-style global boxes
            lx[:2], hx[:2] = -360.0, 360.0
            ly[0], hy[0] = 60.0, 90.0
            ly[1], hy[1] = -90.0, -55.0
        tree = STRtree(lx, ly, hx, hy)
        grid = PointGrid(lx, ly, hx, hy)
        px = np.concatenate([rng.uniform(-380, 380, 500), lx[:5], hx[:5]])
        py = np.concatenate([rng.uniform(-95, 95, 500), ly[:5], hy[:5]])
        tq, ti = tree.query_points(px, py)
        gq, gi = grid.query_points(px, py)
        assert set(zip(tq.tolist(), ti.tolist())) == set(zip(gq.tolist(), gi.tolist()))


def test_point_grid_empty_cases():
    from changesetmd_ray.geo.strtree import PointGrid

    g = PointGrid(np.empty(0), np.empty(0), np.empty(0), np.empty(0))
    qi, ii = g.query_points(np.array([1.0]), np.array([2.0]))
    assert len(qi) == 0 and len(ii) == 0
    g1 = PointGrid(np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([0.0]))
    qi, ii = g1.query_points(np.array([0.0, 1.0]), np.array([0.0, 0.0]))
    assert list(qi) == [0] and list(ii) == [0]


def test_point_grid_all_misses_and_caps_only():
    """Regression: a probe batch where NO point lands in an occupied
    cell must return wide-item candidates without crashing (routine for
    the ±360-shifted antimeridian queries), and a caps-only item set
    (every item wide) must work for any batch."""
    from changesetmd_ray.geo.strtree import PointGrid

    g = PointGrid(np.array([0.0, 1.0]), np.array([0.0, 1.0]),
                  np.array([0.5, 1.5]), np.array([0.5, 1.5]))
    qi, ii = g.query_points(np.array([1.4]), np.array([0.6]))  # empty cell
    assert len(qi) == 0 and len(ii) == 0
    # caps-only: global boxes are all wide -> always-candidate list
    caps = PointGrid(np.array([-360.0, -360.0]), np.array([60.0, -90.0]),
                     np.array([360.0, 360.0]), np.array([90.0, -55.0]))
    qi, ii = caps.query_points(np.array([10.0, 10.0]), np.array([70.0, -60.0]))
    assert set(zip(qi.tolist(), ii.tolist())) == {(0, 0), (1, 1)}
