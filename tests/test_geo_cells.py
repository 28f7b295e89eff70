"""Property tests for the S2 and hex cell encoders (SURVEY.md §5.2)."""

import numpy as np

from changesetmd_ray.geo import cells, hexgrid


def rand_points(n=2000, seed=11):
    rng = np.random.default_rng(seed)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # uniform on sphere
    lon = rng.uniform(-180, 180, n)
    return lat, lon


# ------------------------------------------------------------------ S2

def test_s2_leaf_ids_are_valid_and_distinct():
    lat, lon = rand_points()
    ids = cells.cell_from_latlng(lat, lon)
    assert ids.dtype == np.uint64
    assert np.all(ids % np.uint64(2) == 1)  # leaf ids end in ...1
    assert np.all(cells.level(ids) == 30)
    # distinct points at leaf level are essentially always distinct cells
    assert len(np.unique(ids)) > len(ids) * 0.999


def test_s2_face_ij_roundtrip():
    lat, lon = rand_points(1000, seed=3)
    ids = cells.cell_from_latlng(lat, lon)
    face, i, j = cells.cell_to_face_ij(ids)
    again = cells.cell_from_face_ij(face, i, j)
    assert np.array_equal(ids, again)


def test_s2_parent_contains_child_all_levels():
    lat, lon = rand_points(500, seed=5)
    leaf = cells.cell_from_latlng(lat, lon)
    for lvl in [0, 1, 5, 10, 20, 29]:
        p = cells.parent(leaf, lvl)
        assert np.all(cells.level(p) == lvl)
        assert np.all(cells.contains(p, leaf))
        # parent at lvl is also ancestor of parent at lvl+5
        p2 = cells.parent(leaf, min(lvl + 5, 30))
        assert np.all(cells.contains(p, p2))


def test_s2_same_cell_for_same_point_at_every_level():
    lat, lon = rand_points(300, seed=9)
    for lvl in [4, 12, 25]:
        direct = cells.cell_from_latlng(lat, lon, lvl)
        via_leaf = cells.parent(cells.cell_from_latlng(lat, lon), lvl)
        assert np.array_equal(direct, via_leaf)


def test_s2_children_partition_parent():
    lat, lon = rand_points(50, seed=13)
    for cid in cells.cell_from_latlng(lat, lon, 8)[:10]:
        kids = cells.children(int(cid))
        assert len(np.unique(kids)) == 4
        assert np.all(cells.level(kids) == 9)
        assert np.all(cells.contains(np.full(4, cid, dtype=np.uint64), kids))
        # children ranges tile the parent range exactly
        lo = cells.range_min(kids).min()
        hi = cells.range_max(kids).max()
        assert lo == cells.range_min(np.asarray([cid], dtype=np.uint64))[0]
        assert hi == cells.range_max(np.asarray([cid], dtype=np.uint64))[0]


def test_s2_center_roundtrip_stays_in_cell():
    lat, lon = rand_points(500, seed=17)
    for lvl in [6, 14, 22]:
        ids = cells.cell_from_latlng(lat, lon, lvl)
        clat, clon = cells.cell_center_latlng(ids)
        re_ids = cells.cell_from_latlng(clat, clon, lvl)
        assert np.array_equal(ids, re_ids)


def test_s2_locality():
    # two points 1 meter apart share a level-12 cell (~3-6 km) almost always;
    # points on opposite sides of the planet never share level-2 cells
    lat, lon = rand_points(200, seed=21)
    near = cells.cell_from_latlng(lat + 1e-6, lon, 12) == cells.cell_from_latlng(lat, lon, 12)
    assert near.mean() > 0.95
    far = cells.cell_from_latlng(lat, lon, 2) == cells.cell_from_latlng(-lat, (lon + 180) % 360 - 180, 2)
    assert not far.any()


# ------------------------------------------------------------------ hex

def test_hex_encode_center_roundtrip():
    lat, lon = rand_points(500, seed=23)
    lat = np.clip(lat, -85, 85)
    for res in [0, 3, 7, 12, 15]:
        ids = hexgrid.encode(lon, lat, res)
        clon, clat = hexgrid.cell_center(ids)
        again = hexgrid.encode(clon, clat, res)
        assert np.array_equal(ids, again)


def test_hex_point_within_circumradius_of_its_cell_center():
    lat, lon = rand_points(500, seed=29)
    lat = np.clip(lat, -80, 80)
    for res in [2, 6, 10]:
        ids = hexgrid.encode(lon, lat, res)
        clon, clat = hexgrid.cell_center(ids)
        d = np.hypot(lon - clon, lat - clat)  # planar degrees, matches grid def
        assert np.all(d <= hexgrid.circumradius_deg(res) * 1.0000001)


def test_hex_parent_contains_child_center():
    lat, lon = rand_points(300, seed=31)
    lat = np.clip(lat, -80, 80)
    for res in [4, 9, 15]:
        ids = hexgrid.encode(lon, lat, res)
        par = hexgrid.parent(ids)
        clon, clat = hexgrid.cell_center(ids)
        # child centre must encode to the parent at the coarser res
        assert np.array_equal(hexgrid.encode(clon, clat, res - 1), par)


def test_hex_neighbors_and_rings():
    c = int(hexgrid.encode(np.array([10.0]), np.array([45.0]), 8)[0])
    nb = hexgrid.neighbors(c)
    assert len(np.unique(nb)) == 6
    for n in nb:
        assert hexgrid.hex_distance(c, int(n)) == 1
        assert c in hexgrid.neighbors(int(n)).tolist()  # symmetry
    for k in [1, 2, 5]:
        rg = hexgrid.ring(c, k)
        assert len(rg) == 6 * k
        assert all(hexgrid.hex_distance(c, int(x)) == k for x in rg)
    assert hexgrid.ring(c, 0).tolist() == [c]


def test_hex_aperture7_area_scaling():
    # each res has ~7x the cell count of the previous over the same region
    rng = np.random.default_rng(37)
    lon = rng.uniform(0, 40, 20000)
    lat = rng.uniform(0, 40, 20000)
    n2 = len(np.unique(hexgrid.encode(lon, lat, 2)))
    n3 = len(np.unique(hexgrid.encode(lon, lat, 3)))
    assert 4.0 < n3 / n2 < 10.0  # √7-per-side scaling; edges blur the exact 7


def test_cell_encoder_wrapped_bbox_center():
    """Antimeridian box (min_lon > max_lon) must encode near ±180, not 0."""
    import pyarrow as pa

    from changesetmd_ray.geo import cells
    from changesetmd_ray.stages.encode import CellEncoder

    batch = pa.table({
        "min_lon": pa.array([170.0]), "min_lat": pa.array([-5.0]),
        "max_lon": pa.array([-170.0]), "max_lat": pa.array([5.0]),
    })
    out = CellEncoder(s2_level=10, hex_res=6, grid_zoom=6)(batch)
    got = np.asarray(out["s2_cell"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    want = cells.cell_from_latlng(np.array([0.0]), np.array([180.0]), 10)
    want_alt = cells.cell_from_latlng(np.array([0.0]), np.array([-180.0]), 10)
    assert got[0] in (want[0], want_alt[0])


def test_hex_parent_mixed_res_and_res0():
    import pytest as _pytest

    from changesetmd_ray.geo import hexgrid

    c5 = hexgrid.encode(np.array([10.0]), np.array([20.0]), 5)
    c9 = hexgrid.encode(np.array([10.0]), np.array([20.0]), 9)
    both = np.concatenate([c5, c9])
    p = hexgrid.parent(both)
    res, _, _ = hexgrid.decode(p)
    assert list(res) == [4, 8]  # per-element, not first-element
    c0 = hexgrid.encode(np.array([10.0]), np.array([20.0]), 0)
    with _pytest.raises(ValueError, match="res-0"):
        hexgrid.parent(c0)
