"""Distributed join operators vs the brute-force PostGIS-semantics
oracle (SURVEY.md §2.4, §5.2). Every operator's output set is compared
exactly; skew salting is forced with a tiny pair budget to exercise the
split/replicate path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from changesetmd_ray import oracle
from changesetmd_ray.fixtures import make_changesets, make_polygons
from changesetmd_ray.joins import bbox_join, knn_join, pip_join, tile_counts
from changesetmd_ray.joins.tiles import assign_tiles, raster_vector_join


def _box(t):
    return tuple(
        t[c].to_numpy(zero_copy_only=False).astype(np.float64)
        for c in ("min_lon", "min_lat", "max_lon", "max_lat")
    )


@pytest.fixture(scope="module")
def tables():
    left = make_changesets(1200, seed=42)
    right = make_changesets(400, seed=7)
    lon = (
        left["min_lon"].to_numpy(zero_copy_only=False)
        + left["max_lon"].to_numpy(zero_copy_only=False)
    ) / 2
    lat = (
        left["min_lat"].to_numpy(zero_copy_only=False)
        + left["max_lat"].to_numpy(zero_copy_only=False)
    ) / 2
    pts = pa.table({"id": left["id"], "lon": pa.array(lon), "lat": pa.array(lat)})
    return left, right, pts, lon, lat


@pytest.mark.parametrize("predicate", ["intersects", "coveredby", "contains"])
def test_bbox_join_matches_oracle(tables, predicate):
    left, right, *_ = tables
    got = {
        (r["l_id"], r["r_id"])
        for r in bbox_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            zoom=5,
            predicate=predicate,
            left_id="id",
            right_id="id",
        ).take_all()
    }
    exp = oracle.oracle_bbox_join(
        left["id"].to_numpy(), _box(left), right["id"].to_numpy(), _box(right), predicate
    )
    assert got == exp and len(exp) > 0 or (predicate != "intersects")


def test_bbox_join_salting_forced(tables):
    """A pair budget far below the actual work forces hot-cell salting;
    the result set must be identical (split/replicate + reference-point
    dedup keeps every pair exactly once)."""
    left, right, *_ = tables
    got = {
        (r["l_id"], r["r_id"])
        for r in bbox_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            zoom=3,  # coarse grid → big groups → salting everywhere
            left_id="id",
            right_id="id",
            pair_budget=500,
        ).take_all()
    }
    exp = oracle.oracle_bbox_join(
        left["id"].to_numpy(), _box(left), right["id"].to_numpy(), _box(right)
    )
    assert got == exp


def test_bbox_join_zoom_invariance(tables):
    """The grid zoom is a physical knob, not a semantic one."""
    left, right, *_ = tables
    ref = None
    for zoom in (2, 7):
        got = frozenset(
            (r["l_id"], r["r_id"])
            for r in bbox_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(right),
                zoom=zoom,
                left_id="id",
                right_id="id",
            ).take_all()
        )
        ref = got if ref is None else ref
        assert got == ref


@pytest.mark.parametrize("predicate", ["intersects", "contains"])
def test_pip_join_matches_oracle(tables, predicate):
    left, right, pts, lon, lat = tables
    polys = make_polygons()
    got = {
        (r["id"], r["poly_id"])
        for r in pip_join(ray.data.from_arrow(pts), polys, predicate=predicate).take_all()
    }
    ok = ~np.isnan(lon)
    exp = oracle.oracle_pip(left["id"].to_numpy()[ok], lon[ok], lat[ok], polys, predicate)
    assert got == exp and len(exp) > 0


def test_pip_join_boundary_semantics():
    """Points exactly on a polygon edge: intersects=yes, contains=no
    (PostGIS parity, SURVEY.md §2.4 J2)."""
    polys = pa.table(
        {
            "poly_id": pa.array([1], pa.int64()),
            "kind": pa.array(["ring"]),
            "ring": pa.array(
                [[{"lon": 0.0, "lat": 0.0}, {"lon": 10.0, "lat": 0.0},
                  {"lon": 10.0, "lat": 10.0}, {"lon": 0.0, "lat": 10.0}]],
                pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())])),
            ),
            "lat_threshold": pa.array([None], pa.float64()),
        }
    )
    pts = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "lon": pa.array([5.0, 0.0, 20.0]),  # interior, on-edge, outside
            "lat": pa.array([5.0, 5.0, 5.0]),
        }
    )
    inter = {(r["id"], r["poly_id"]) for r in pip_join(ray.data.from_arrow(pts), polys).take_all()}
    cont = {
        (r["id"], r["poly_id"])
        for r in pip_join(ray.data.from_arrow(pts), polys, predicate="contains").take_all()
    }
    assert inter == {(1, 1), (2, 1)}
    assert cont == {(1, 1)}


def test_knn_join_matches_oracle(tables):
    left, right, pts, lon, lat = tables
    probes = pa.table(
        {
            "id": pa.array(np.arange(15, dtype=np.int64)),
            "lon": pa.array(np.linspace(-170, 170, 15)),
            "lat": pa.array(np.linspace(-80, 80, 15)),
        }
    )
    res = knn_join(ray.data.from_arrow(pts), probes, 4, corpus_id="id").take_all()
    got = {(r["probe_id"], r["neighbor_id"], r["rank"]) for r in res}
    ok = ~np.isnan(lon)
    exp = set(
        oracle.oracle_knn(
            probes["id"].to_numpy(), probes["lon"].to_numpy(), probes["lat"].to_numpy(),
            left["id"].to_numpy()[ok], lon[ok], lat[ok], 4,
        )
    )
    assert got == exp


def test_tile_counts_matches_oracle(tables):
    left, right, pts, lon, lat = tables
    out = tile_counts(ray.data.from_arrow(pts), 4).take_all()
    ok = ~np.isnan(lon)
    exp = oracle.oracle_tiles(left["id"].to_numpy()[ok], lon[ok], lat[ok], 4)
    from collections import Counter

    expc = Counter(t for _, t in exp)
    got = {r["tile_key"]: r["n_points"] for r in out}
    assert got == dict(expc)
    assert [r["tile_key"] for r in out] == sorted(got)  # explicit sort, O2


def test_raster_vector_join(tables):
    left, right, pts, lon, lat = tables
    ok = ~np.isnan(lon)
    exp_assign = dict(oracle.oracle_tiles(left["id"].to_numpy()[ok], lon[ok], lat[ok], 3))
    tiles = sorted(set(exp_assign.values()))[::2]  # raster rows for half the tiles
    raster = pa.table(
        {
            "tile_key": pa.array(tiles, pa.int64()),
            "value": pa.array([float(t % 97) for t in tiles], pa.float64()),
        }
    )
    out = raster_vector_join(
        ray.data.from_arrow(pts), raster, 3, value_cols=("value",)
    ).take_all()
    have = {t: float(t % 97) for t in tiles}
    for r in out:
        if r["tile_key"] is None:
            assert np.isnan(lon[r["id"] - 1]) or np.isnan(lat[r["id"] - 1])
            continue
        assert r["tile_key"] == exp_assign[r["id"]]
        if r["tile_key"] in have:
            assert r["value"] == have[r["tile_key"]]
        else:
            assert r["value"] is None


def test_assign_tiles_null_coords():
    pts = pa.table(
        {"id": pa.array([1, 2], pa.int64()), "lon": pa.array([None, 3.0]), "lat": pa.array([2.0, None])}
    )
    out = assign_tiles(ray.data.from_arrow(pts), 5).take_all()
    assert all(r["tile_key"] is None for r in out)


def test_probe_cover_cells_edges():
    """Pole clamp and antimeridian wrap in the radius-kNN probe cover."""
    from changesetmd_ray.geo.grid import grid_dims, unpack_cell
    from changesetmd_ray.joins.knn import _probe_cover_cells

    nx, ny = grid_dims(4)
    # near the pole: cover must clamp, never emit iy outside [0, ny)
    row, cells = _probe_cover_cells(np.array([0.0]), np.array([89.9]), 500_000.0, 4)
    _, ix, iy = unpack_cell(cells.astype(np.uint64))
    assert (iy >= 0).all() and (iy < ny).all()
    # near the antimeridian: ix wraps, both edges present
    row, cells = _probe_cover_cells(np.array([179.9]), np.array([0.0]), 500_000.0, 4)
    _, ix, iy = unpack_cell(cells.astype(np.uint64))
    assert 0 in ix and (nx - 1) in ix
    # oversize radius at high zoom raises the guard
    with pytest.raises(ValueError, match="cells at zoom"):
        _probe_cover_cells(np.array([0.0]), np.array([80.0]), 2_000_000.0, 10)


def test_knn_radius_join_matches_bruteforce(ray_session):
    """Cell-partitioned radius kNN == brute-force oracle on seeded data."""
    from changesetmd_ray.joins.knn import EARTH_RADIUS_M, knn_radius_join

    rng = np.random.RandomState(9)
    n_c, n_p, k, radius = 800, 120, 3, 400_000.0
    clon = rng.uniform(-180, 180, n_c); clat = rng.uniform(-80, 80, n_c)
    plon = rng.uniform(-180, 180, n_p); plat = rng.uniform(-80, 80, n_p)
    corpus = ray.data.from_arrow(pa.table(
        {"id": pa.array(np.arange(n_c, dtype=np.int64)),
         "lon": pa.array(clon), "lat": pa.array(clat)})).repartition(4)
    probes = ray.data.from_arrow(pa.table(
        {"id": pa.array(np.arange(n_p, dtype=np.int64)),
         "lon": pa.array(plon), "lat": pa.array(plat)})).repartition(3)
    got = knn_radius_join(corpus, probes, k, radius, zoom=5).to_pandas()

    def hav(lo1, la1, lo2, la2):
        p1, p2 = np.radians(la1), np.radians(la2)
        dl = np.radians(lo2) - np.radians(lo1)
        a = np.sin((p2 - p1) / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
        return 2 * EARTH_RADIUS_M * np.arcsin(np.minimum(np.sqrt(a), 1.0))

    exp = set()
    for p in range(n_p):
        d = hav(plon[p], plat[p], clon, clat)
        order = np.lexsort((np.arange(n_c), d))
        rank = 0
        for ci in order:
            if d[ci] > radius or rank >= k:
                break
            rank += 1
            exp.add((p, int(ci), rank))
    assert set(zip(got["probe_id"], got["neighbor_id"], got["rank"])) == exp


def test_write_sorted_tiles_layout(ray_session, tmp_path):
    """O2 ordered tile output: partitioned dirs, per-tile re-readable."""
    import os

    from changesetmd_ray.joins.tiles import assign_tiles, write_sorted_tiles

    rng = np.random.RandomState(2)
    pts = pa.table(
        {"id": pa.array(np.arange(500, dtype=np.int64)),
         "lon": pa.array(rng.uniform(-180, 180, 500)),
         "lat": pa.array(rng.uniform(-85, 85, 500))}
    )
    ds = assign_tiles(ray.data.from_arrow(pts).repartition(3), 2)
    out = str(tmp_path / "tiles")
    write_sorted_tiles(ds, out)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("tile_key="))
    assert len(dirs) > 1
    # one tile dir is independently re-readable and pure
    sub = ray.data.read_parquet(os.path.join(out, dirs[0]))
    assert sub.count() > 0
    total = ray.data.read_parquet(out).count()
    assert total == 500


def test_salting_bounds_group_pair_work(ray_session):
    """North_rule skew check: per-(cell,salt) pairwise work after
    salting stays ~within pair_budget, while the unsalted plan exceeds
    it by orders of magnitude; outputs stay identical."""
    import pandas as pd

    from changesetmd_ray.joins import bbox_join
    from changesetmd_ray.joins.bbox import SALT_BITS, _Explode, _cell_counts_both, _salting_plan

    # hot cell: 600 left + 400 right boxes piled into one ~small area
    rng = np.random.RandomState(13)
    def boxes(n, id0):
        lo_x = rng.uniform(10.0, 10.5, n); lo_y = rng.uniform(40.0, 40.5, n)
        return pa.table({
            "id": pa.array(np.arange(id0, id0 + n, dtype=np.int64)),
            "min_lon": pa.array(lo_x), "min_lat": pa.array(lo_y),
            "max_lon": pa.array(lo_x + 0.2), "max_lat": pa.array(lo_y + 0.2)})
    left_t, right_t = boxes(600, 0), boxes(400, 10_000)
    budget = 5_000
    zoom = 4

    left = ray.data.from_arrow(left_t)
    right = ray.data.from_arrow(right_t)
    cols4 = ("min_lon", "min_lat", "max_lon", "max_lat")
    cl, _, cr, _ = _cell_counts_both(left, right, cols4, cols4, zoom)
    unsalted_max = max(nl * cr.get(c, 0) for c, nl in cl.items())
    assert unsalted_max > budget * 10  # genuinely skewed input

    plan = _salting_plan(cl, cr, budget)
    assert len(plan["cells"]) >= 1
    cols = ("min_lon", "min_lat", "max_lon", "max_lat")
    ex_l = _Explode(plan, 0, "id", cols, zoom)(left_t)
    ex_r = _Explode(plan, 1, "id", cols, zoom)(right_t)
    df = pa.concat_tables([ex_l, ex_r]).to_pandas()
    per_group = df.groupby("jkey")["side"].agg(
        L=lambda s: int((s == 0).sum()), R=lambda s: int((s == 1).sum())
    )
    work = per_group["L"] * per_group["R"]
    # ceil-division rounding means a group can slightly exceed budget
    assert work.max() <= budget * 2
    assert work.max() < unsalted_max / 5

    # and the join output with forced salting == without (exactness)
    with_salt = bbox_join(left, right, zoom=zoom, left_id="id", right_id="id",
                          pair_budget=budget).to_pandas()
    no_salt = bbox_join(left, right, zoom=zoom, left_id="id", right_id="id",
                        salting=False).to_pandas()
    key = ["l_id", "r_id"]
    a = with_salt.sort_values(key).reset_index(drop=True)
    b = no_salt.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_probe_cover_cells_no_duplicates_near_pole():
    """Full-width lon windows at the pole must not revisit a column
    (duplicate (probe, cell) pairs would double-count neighbors)."""
    from changesetmd_ray.joins.knn import _probe_cover_cells

    row, cells = _probe_cover_cells(np.array([10.0]), np.array([89.5]), 200_000.0, 6)
    pairs = set(zip(row.tolist(), cells.tolist()))
    assert len(pairs) == len(row)


def test_knn_partial_tie_break_matches_oracle(ray_session):
    """Coincident corpus points: the (distance, id asc) rule must pick
    the smaller id even when argpartition would choose otherwise."""
    from changesetmd_ray.joins.knn import knn_join

    corpus = ray.data.from_arrow(pa.table(
        {"id": pa.array([5, 3], pa.int64()),
         "lon": pa.array([1.0, 1.0]), "lat": pa.array([1.0, 1.0])}))
    probes = pa.table({"id": pa.array([100], pa.int64()),
                       "lon": pa.array([0.0]), "lat": pa.array([0.0])})
    out = knn_join(corpus, probes, 1).to_pandas()
    assert list(out["neighbor_id"]) == [3]


def test_knn_auto_merge_buckets():
    """Default merge width: single-task only for tiny P × k merges,
    probe-hash bucketed (>1 group) as soon as the volume is real."""
    from changesetmd_ray.joins.knn import _auto_merge_buckets

    assert _auto_merge_buckets(100, 3) == 1
    assert _auto_merge_buckets(4096, 1) == 1
    b = _auto_merge_buckets(50_000, 4)
    assert b > 1 and (b & (b - 1)) == 0
    assert _auto_merge_buckets(10_000_000, 10) == 64


def test_knn_join_bucketed_default_exact(ray_session):
    """With enough probes the DEFAULT path runs the bucketed merge
    (>1 merge group) and must still be exact vs the single-task merge."""
    from changesetmd_ray.joins.knn import _auto_merge_buckets, knn_join

    rng = np.random.default_rng(3)
    corpus = pa.table(
        {"id": pa.array(np.arange(4000, dtype=np.int64)),
         "lon": pa.array(rng.uniform(-179, 179, 4000)),
         "lat": pa.array(rng.uniform(-85, 85, 4000))}
    )
    probes = pa.table(
        {"id": pa.array(np.arange(2500, dtype=np.int64)),
         "lon": pa.array(rng.uniform(-179, 179, 2500)),
         "lat": pa.array(rng.uniform(-85, 85, 2500))}
    )
    assert _auto_merge_buckets(2500, 3) > 1  # default engages the bucketed merge
    got = sorted(
        (r["probe_id"], r["rank"], r["neighbor_id"])
        for r in knn_join(ray.data.from_arrow(corpus), probes, 3).take_all()
    )
    ref = sorted(
        (r["probe_id"], r["rank"], r["neighbor_id"])
        for r in knn_join(
            ray.data.from_arrow(corpus), probes, 3, merge_buckets=1
        ).take_all()
    )
    assert got == ref and len(got) == 2500 * 3


def test_knn_nan_probes_dropped(ray_session):
    from changesetmd_ray.joins.knn import knn_join

    corpus = ray.data.from_arrow(pa.table(
        {"id": pa.array([1, 2], pa.int64()),
         "lon": pa.array([0.0, 1.0]), "lat": pa.array([0.0, 1.0])}))
    probes = pa.table({"id": pa.array([10, 11], pa.int64()),
                       "lon": pa.array([0.5, float("nan")]), "lat": pa.array([0.5, 2.0])})
    out = knn_join(corpus, probes, 2).to_pandas()
    assert set(out["probe_id"]) == {10}
    assert not out["dist_m"].isna().any()


def test_salting_preserves_hashed_salts_with_mixed_hot_cells():
    """Two hot cells with OPPOSITE split sides in one batch: replication
    expansion must not overwrite the split side's hashed salts (the bug
    collapsed them all to salt 0, defeating the split)."""
    from changesetmd_ray.joins.bbox import SALT_BITS, _Explode

    # hot cells A and B; side 0 is split in A, replicated in B
    plan = {
        "cells": None, "k": None, "split": None,
    }
    # build boxes landing in two different cells at zoom 4
    lo = np.array([10.0] * 40 + [60.0] * 40)
    la = np.full(80, 40.0)
    t = pa.table({
        "id": pa.array(np.arange(80, dtype=np.int64)),
        "min_lon": pa.array(lo), "min_lat": pa.array(la),
        "max_lon": pa.array(lo + 0.2), "max_lat": pa.array(la + 0.2)})
    from changesetmd_ray.geo.grid import _lat_to_iy, _lon_to_ix, grid_dims
    nx, ny = grid_dims(4)
    cell_a = _lat_to_iy(np.array([40.0]), ny)[0] * nx + _lon_to_ix(np.array([10.0]), nx)[0]
    cell_b = _lat_to_iy(np.array([40.0]), ny)[0] * nx + _lon_to_ix(np.array([60.0]), nx)[0]
    cells = np.sort(np.array([cell_a, cell_b], dtype=np.int64))
    plan = {"cells": cells,
            "k": np.array([4, 4], dtype=np.int64),
            "split": np.array([0 if c == cell_a else 1 for c in cells], dtype=np.int64)}
    out = _Explode(plan, 0, "id", ("min_lon", "min_lat", "max_lon", "max_lat"), 4)(t)
    jk = out["jkey"].to_numpy()
    salts = jk & ((1 << SALT_BITS) - 1)
    cc = jk >> SALT_BITS
    a_salts = salts[cc == cell_a]  # split side: hashed salts, spread over [0,4)
    b_salts = salts[cc == cell_b]  # replicated: each row 4 copies, salts 0..3
    assert len(set(a_salts.tolist())) > 1, "hashed salts were collapsed"
    assert sorted(set(b_salts.tolist())) == [0, 1, 2, 3]
    assert len(b_salts) == 40 * 4


def test_bbox_join_wrapped_intersects_matches_oracle(ray_session):
    """Antimeridian-wrapped boxes (min_lon > max_lon): intersects pairs
    must match the brute-force wrap-aware oracle; other predicates
    raise."""
    from changesetmd_ray.joins.bbox import bbox_join

    rng = np.random.RandomState(21)
    n_l, n_r = 60, 50
    # left: half wrapped around ±180
    l_lo = np.where(np.arange(n_l) % 2 == 0, rng.uniform(165, 179, n_l), rng.uniform(-30, 0, n_l))
    l_hi = np.where(np.arange(n_l) % 2 == 0, rng.uniform(-179, -165, n_l), l_lo + rng.uniform(1, 20, n_l))
    l_y = rng.uniform(-60, 60, n_l)
    left = pa.table({"id": pa.array(np.arange(n_l, dtype=np.int64)),
                     "min_lon": pa.array(l_lo), "min_lat": pa.array(l_y),
                     "max_lon": pa.array(l_hi), "max_lat": pa.array(l_y + 5.0)})
    r_lo = rng.uniform(-180, 160, n_r)
    r_y = rng.uniform(-60, 60, n_r)
    right = pa.table({"id": pa.array(np.arange(1000, 1000 + n_r, dtype=np.int64)),
                      "min_lon": pa.array(r_lo), "min_lat": pa.array(r_y),
                      "max_lon": pa.array(r_lo + rng.uniform(1, 15, n_r)),
                      "max_lat": pa.array(r_y + 4.0)})

    got = bbox_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    zoom=4, left_id="id", right_id="id").to_pandas()
    got_pairs = set(zip(got["l_id"], got["r_id"]))

    def lon_overlap(alo, ahi, blo, bhi):
        a_segs = [(alo, ahi)] if alo <= ahi else [(alo, 180.0), (-180.0, ahi)]
        return any(s <= bhi and blo <= e for s, e in a_segs)

    exp = set()
    for i in range(n_l):
        for j in range(n_r):
            if (l_y[i] <= r_y[j] + 4.0 and r_y[j] <= l_y[i] + 5.0
                    and lon_overlap(l_lo[i], l_hi[i], r_lo[j], r_lo[j] + (right["max_lon"][j].as_py() - r_lo[j]))):
                exp.add((i, 1000 + j))
    assert got_pairs == exp


def test_bbox_join_wrapped_coveredby_and_contains(ray_session):
    """Wrapped boxes under coveredby/contains: ALL wrap segments of the
    covered side must be covered (AND-semantics) — partial single-segment
    coverage must NOT match. Verified against a brute-force wrap-aware
    oracle, both predicate directions."""
    from changesetmd_ray.joins.bbox import bbox_join

    def segs(lo, hi):
        return [(lo, hi)] if lo <= hi else [(lo, 180.0), (-180.0, hi)]

    def covered(al, ay0, ah, ay1, bl, by0, bh, by1):
        if not (by0 <= ay0 and ay1 <= by1):
            return False
        return all(
            any(bs <= s and e <= be for bs, be in segs(bl, bh)) for s, e in segs(al, ah)
        )

    rng = np.random.RandomState(33)
    n_l, n_r = 50, 40
    # small covered-side boxes, every third wrapped
    wrap_l = np.arange(n_l) % 3 == 0
    l_lo = np.where(wrap_l, rng.uniform(170, 179, n_l), rng.uniform(-40, 20, n_l))
    l_hi = np.where(wrap_l, rng.uniform(-179, -170, n_l), l_lo + rng.uniform(1, 8, n_l))
    l_y0 = rng.uniform(-50, 50, n_l)
    l_y1 = l_y0 + rng.uniform(1, 6, n_l)
    # big covering-side boxes, every fourth wrapped (segments only
    # partially overlap the lefts' → exercises the partial-cover reject)
    wrap_r = np.arange(n_r) % 4 == 0
    r_lo = np.where(wrap_r, rng.uniform(150, 176, n_r), rng.uniform(-60, 0, n_r))
    r_hi = np.where(wrap_r, rng.uniform(-176, -150, n_r), r_lo + rng.uniform(10, 60, n_r))
    r_y0 = rng.uniform(-60, 40, n_r)
    r_y1 = r_y0 + rng.uniform(8, 30, n_r)

    small = pa.table({"id": pa.array(np.arange(n_l, dtype=np.int64)),
                      "min_lon": pa.array(l_lo), "min_lat": pa.array(l_y0),
                      "max_lon": pa.array(l_hi), "max_lat": pa.array(l_y1)})
    big = pa.table({"id": pa.array(np.arange(1000, 1000 + n_r, dtype=np.int64)),
                    "min_lon": pa.array(r_lo), "min_lat": pa.array(r_y0),
                    "max_lon": pa.array(r_hi), "max_lat": pa.array(r_y1)})

    exp = {
        (i, 1000 + j)
        for i in range(n_l)
        for j in range(n_r)
        if covered(l_lo[i], l_y0[i], l_hi[i], l_y1[i], r_lo[j], r_y0[j], r_hi[j], r_y1[j])
    }
    assert exp, "fixture must plant true coveredby matches"

    got = bbox_join(ray.data.from_arrow(small), ray.data.from_arrow(big),
                    zoom=4, predicate="coveredby", left_id="id", right_id="id").to_pandas()
    assert set(zip(got["l_id"], got["r_id"])) == exp

    # contains is the mirrored direction: big contains small
    got_c = bbox_join(ray.data.from_arrow(big), ray.data.from_arrow(small),
                      zoom=4, predicate="contains", left_id="id", right_id="id").to_pandas()
    assert set(zip(got_c["l_id"], got_c["r_id"])) == {(b, a) for a, b in exp}


def test_membership_join_broadcast_matches_bucketed(ray_session):
    """semi_join/anti_join must be identical through BOTH regimes: the
    broadcast fast path and the bucketed shuffle fallback that
    broadcast_limit=0 forces (round-3 verdict #4 — the driver collect
    must be size-gated). Null big keys: kept by anti, dropped by semi;
    null small keys ignored."""
    from changesetmd_ray.joins.broadcast import anti_join, semi_join

    rng = np.random.RandomState(11)
    big = pa.table(
        {
            "k": pa.array(
                [None if i % 17 == 0 else int(v) for i, v in
                 enumerate(rng.randint(0, 400, 900))], pa.int64()
            ),
            "payload": pa.array([f"p{i}" for i in range(900)]),
        }
    )
    small = pa.table(
        {"sk": pa.array([None, *rng.randint(0, 300, 250).tolist()], pa.int64())}
    )
    have = set(v for v in small["sk"].to_pylist() if v is not None)

    def run(fn, limit):
        out = fn(
            ray.data.from_arrow(big).repartition(7),
            ray.data.from_arrow(small).repartition(3),
            big_on="k", small_on="sk", broadcast_limit=limit, num_buckets=16,
        ).take_all()
        return sorted((r["k"] if r["k"] is not None else -1, r["payload"]) for r in out)

    exp_anti = sorted(
        ((k if k is not None else -1), p)
        for k, p in zip(big["k"].to_pylist(), big["payload"].to_pylist())
        if k is None or k not in have
    )
    exp_semi = sorted(
        (k, p)
        for k, p in zip(big["k"].to_pylist(), big["payload"].to_pylist())
        if k is not None and k in have
    )
    assert run(anti_join, 10**9) == exp_anti        # broadcast regime
    assert run(anti_join, 0) == exp_anti            # forced bucketed regime
    assert run(semi_join, 10**9) == exp_semi
    assert run(semi_join, 0) == exp_semi


def test_membership_join_empty_small_side(ray_session):
    from changesetmd_ray.joins.broadcast import anti_join, semi_join

    big = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                    "v": pa.array([1.0, 2.0, 3.0])})
    empty = pa.table({"sk": pa.array([], pa.int64())})
    for limit in (10**9, 0):
        anti = anti_join(ray.data.from_arrow(big), ray.data.from_arrow(empty),
                         big_on="k", small_on="sk", broadcast_limit=limit,
                         num_buckets=4).take_all()
        assert len(anti) == 3  # nothing to exclude
        semi = semi_join(ray.data.from_arrow(big), ray.data.from_arrow(empty),
                         big_on="k", small_on="sk", broadcast_limit=limit,
                         num_buckets=4).take_all()
        assert len(semi) == 0


def test_membership_join_zero_row_premap_blocks(ray_session):
    """A small side where a filter empties one block entirely: Ray
    skips UDFs on zero-row blocks, so those blocks reach the bucketed
    shuffle union with their PRE-map schema (no __b / __mk columns).
    Ray 2.49's groupby tolerates them; this pins that tolerance so a
    Ray upgrade that stops dropping mismatched zero-row blocks fails
    loudly here instead of deep in a curation run (round-4 review)."""
    from changesetmd_ray.joins.broadcast import anti_join, semi_join

    big = ray.data.from_arrow(pa.table({"k": pa.array(range(20), pa.int64())}))
    s1 = pa.table({"sk": pa.array([3, 4, 5], pa.int64())})
    s2 = pa.table({"sk": pa.array([1000, 1001], pa.int64())})
    # second block filters to 0 rows and keeps the {'sk'} schema
    small = ray.data.from_arrow([s1, s2]).filter(lambda r: r["sk"] < 100)
    for limit in (10**9, 0):  # broadcast regime, forced shuffle regime
        semi = semi_join(big, small, big_on="k", small_on="sk",
                         broadcast_limit=limit, num_buckets=4)
        assert sorted(r["k"] for r in semi.take_all()) == [3, 4, 5]
        anti = anti_join(big, small, big_on="k", small_on="sk",
                         broadcast_limit=limit, num_buckets=4)
        assert len(anti.take_all()) == 17
