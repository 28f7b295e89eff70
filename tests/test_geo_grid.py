"""Join grid + tile kernels: covering guarantees, wraparound, mercator."""

import numpy as np

from changesetmd_ray.geo import grid
from changesetmd_ray.geo.envelope import bbox_intersects


def test_point_cell_roundtrip_bounds():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for z in [1, 4, 8, 12]:
        c = grid.point_cell(lon, lat, z)
        lo_x, lo_y, hi_x, hi_y = grid.cell_bounds(c)
        assert np.all((lon >= lo_x) & (lon <= hi_x))
        assert np.all((lat >= lo_y) & (lat <= hi_y))


def test_cover_bbox_exact():
    rng = np.random.default_rng(2)
    n = 300
    lo_x = rng.uniform(-180, 170, n)
    lo_y = rng.uniform(-90, 80, n)
    hi_x = np.minimum(lo_x + rng.uniform(0, 30, n), 180)
    hi_y = np.minimum(lo_y + rng.uniform(0, 30, n), 90)
    z = 6
    ri, cell = grid.cover_bbox(lo_x, lo_y, hi_x, hi_y, z)
    # 1) every covering cell actually intersects its bbox
    c_lo_x, c_lo_y, c_hi_x, c_hi_y = grid.cell_bounds(cell)
    assert np.all(
        bbox_intersects(
            (lo_x[ri], lo_y[ri], hi_x[ri], hi_y[ri]), (c_lo_x, c_lo_y, c_hi_x, c_hi_y)
        )
    )
    # 2) completeness: every random point inside a bbox maps to a covering cell
    for i in range(0, n, 17):
        px = rng.uniform(lo_x[i], hi_x[i], 20)
        py = rng.uniform(lo_y[i], hi_y[i], 20)
        pc = grid.point_cell(px, py, z)
        mine = set(cell[ri == i].tolist())
        assert set(pc.tolist()) <= mine


def test_cover_bbox_antimeridian_split():
    # box crossing ±180: min_lon > max_lon
    ri, cell = grid.cover_bbox(
        np.array([170.0]), np.array([-5.0]), np.array([-170.0]), np.array([5.0]), 6
    )
    _, ix, iy = grid.unpack_cell(cell)
    nx, _ = grid.grid_dims(6)
    # includes cells at both edges of the x range
    assert (ix == nx - 1).any() and (ix == 0).any()
    # a point at lon=179 and one at lon=-179 both covered
    for lon in [179.0, -179.0]:
        pc = grid.point_cell(np.array([lon]), np.array([0.0]), 6)
        assert pc[0] in set(cell.tolist())
    # and nothing near lon 0
    pc0 = grid.point_cell(np.array([0.0]), np.array([0.0]), 6)
    assert pc0[0] not in set(cell.tolist())


def test_cover_guard_raises_on_huge_bbox():
    import pytest

    with pytest.raises(ValueError):
        grid.cover_bbox(
            np.array([-180.0]), np.array([-90.0]), np.array([180.0]), np.array([90.0]), 12
        )


def test_disk_cells():
    c = int(grid.point_cell(np.array([0.0]), np.array([0.0]), 8)[0])
    d0 = grid.disk_cells(c, 0)
    assert d0.tolist() == [c]
    d2 = grid.disk_cells(c, 2)
    assert len(d2) == 25 and c in d2.tolist()
    # wraparound at the antimeridian
    ce = int(grid.point_cell(np.array([179.9]), np.array([0.0]), 8)[0])
    d1 = grid.disk_cells(ce, 1)
    assert len(d1) == 9
    cw = int(grid.point_cell(np.array([-179.9]), np.array([0.0]), 8)[0])
    assert cw in d1.tolist()
    # clamp at the pole
    cp = int(grid.point_cell(np.array([0.0]), np.array([89.9]), 8)[0])
    assert len(grid.disk_cells(cp, 1)) == 6  # top row clamped off


def test_tiles_known_values():
    # slippy-map reference points; lat 0 sits on the y boundary → floor → y=1
    x, y = grid.tile_xyz(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    x, y = grid.tile_xyz(np.array([13.377]), np.array([52.516]), 10)  # Berlin
    assert (x[0], y[0]) == (550, 335)
    # poles clamp instead of overflowing
    x, y = grid.tile_xyz(np.array([0.0, 0.0]), np.array([90.0, -90.0]), 4)
    assert y[0] == 0 and y[1] == 15


def test_tile_pack_unpack():
    x = np.array([5, 100], dtype=np.int64)
    y = np.array([3, 200], dtype=np.int64)
    t = grid.pack_tile(9, x, y)
    z2, x2, y2 = grid.unpack_cell(t)
    assert np.all(z2 == 9) and np.array_equal(x, x2) and np.array_equal(y, y2)
