"""Unit tests: distributed hash equi-join (J1), sparse reduces, the
tag-map fold (M2), and the multimodal plumbing — each against a
driver-side pandas/numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from changesetmd_ray.joins.equi import hash_join
from changesetmd_ray.stages.reduce import bucket_sum, sum_by_key, tree_sum
from changesetmd_ray.stages.tags import TagExtractor


def _sorted_df(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()[sorted(t.column_names)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def join_inputs(ray_session):
    rng = np.random.RandomState(11)
    left = pa.table(
        {
            "lk": pa.array(rng.randint(0, 300, 2000), pa.int64()),
            "lval": pa.array(rng.rand(2000)),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rng.randint(0, 300, 700), pa.int64()),
            "rname": pa.array([f"n{i % 37}" for i in range(700)], pa.string()),
        }
    )
    return left, right


def test_hash_join_matches_pandas(join_inputs):
    left, right = join_inputs
    out = hash_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        left_on="lk",
        right_on="rk",
        left_cols=["lk", "lval"],
        right_cols=["rk", "rname"],
        num_buckets=16,
    )
    got = _sorted_df(pa.Table.from_pandas(out.to_pandas(), preserve_index=False))
    exp = left.to_pandas().merge(right.to_pandas(), left_on="lk", right_on="rk")
    exp = _sorted_df(pa.Table.from_pandas(exp, preserve_index=False))
    pd.testing.assert_frame_equal(got, exp)


def test_hash_join_null_keys_dropped(ray_session):
    left = pa.table({"k": pa.array([1, None, 2], pa.int64()), "a": pa.array([10, 20, 30])})
    right = pa.table({"rk": pa.array([None, 1, 1], pa.int64()), "b": pa.array([5, 6, 7])})
    out = hash_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_on="k",
        right_on="rk",
        left_cols=["k", "a"],
        right_cols=["b"],
    ).to_pandas()
    # key 1 matches the two non-null right rows; nulls never match
    assert len(out) == 2
    assert sorted(out["b"]) == [6, 7]
    assert set(out["k"]) == {1}


def test_hash_join_column_collision_raises(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="collision"):
        hash_join(ds, ds, left_on="k", right_on="k", left_cols=["k"], right_cols=["k"])


def test_sum_by_key_oracle():
    rng = np.random.RandomState(3)
    k = rng.randint(0, 50, 1000).astype(np.int64)
    v = rng.randint(1, 9, 1000).astype(np.int64)
    kk, vv = sum_by_key(k, v)
    exp = pd.Series(v).groupby(k).sum()
    assert list(kk) == list(exp.index)
    assert list(vv) == list(exp.values)


@pytest.mark.parametrize("reducer", ["tree", "bucket"])
def test_distributed_sums_match(ray_session, reducer):
    rng = np.random.RandomState(5)
    k = rng.randint(0, 997, 20000).astype(np.int64)
    t = pa.table({"key": pa.array(k), "n": pa.array(np.ones(len(k), np.int64))})
    ds = ray.data.from_arrow(t).repartition(7)
    if reducer == "tree":
        out = tree_sum(ds, key_col="key", val_col="n", fanin=4)
    else:
        out = bucket_sum(ds, key_col="key", val_col="n", num_buckets=8)
    got = out.to_pandas().sort_values("key").reset_index(drop=True)
    exp = pd.Series(np.ones(len(k), np.int64)).groupby(k).sum()
    assert list(got["key"]) == list(exp.index)
    assert list(got["n"]) == list(exp.values)
    if reducer == "tree":  # tree output is globally sorted by construction
        assert list(out.to_pandas()["key"]) == sorted(got["key"])


def test_tag_extractor_map_semantics(ray_session):
    html = [
        b'<html><head><meta name="generator" content="gen-3.1">'
        b'<meta name="geo.position" content="1.0;2.0"></head></html>',
        b"<html><head></head></html>",
        None,
    ]
    batch = pa.table(
        {"url": pa.array(["a", "b", "c"]), "html": pa.array(html, pa.binary())}
    )
    out = TagExtractor()(batch)
    tags = out["tags"].to_pylist()
    assert dict(tags[0]) == {"generator": "gen-3.1", "geo.position": "1.0;2.0"}
    assert tags[1] == [] and tags[2] == []


def test_media_decode_stub(ray_session):
    from changesetmd_ray.stages.multimodal import MediaDecodeStub, decode_media

    media = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "audio"]),
            "payload": pa.array([b"abc", b""], pa.binary()),
        }
    )
    out = decode_media(ray.data.from_arrow(media), feat_dim=8, codec="fake").to_pandas()
    assert list(out.columns) == ["media_id", "media_type", "payload_bytes", "payload_hash", "feature"]
    assert out["payload_bytes"].tolist() == [3, 0]
    assert out["payload_hash"].nunique() == 2  # stable content hash per payload
    assert all(len(f) == 8 for f in out["feature"])
    # determinism across calls
    out2 = decode_media(ray.data.from_arrow(media), feat_dim=8, codec="fake").to_pandas()
    assert np.allclose(np.stack(out["feature"]), np.stack(out2["feature"]))
    # strict mode is the marked stub
    stub = MediaDecodeStub(codec="strict")
    with pytest.raises(NotImplementedError):
        stub._decode(b"x")


def test_sum_by_key_float_values_not_truncated():
    k = np.array([0, 0, 1], dtype=np.int64)
    v = np.array([0.5, 0.5, 1.25])
    kk, vv = sum_by_key(k, v)
    assert vv.dtype == np.float64
    assert list(vv) == [1.0, 1.25]


def test_bucket_sum_float_and_empty_blocks(ray_session):
    """Float payloads sum exactly; blocks emptied by an upstream filter
    must not break the shuffle schema."""
    t = pa.table({"key": pa.array([1, 1, 2, 7], pa.int64()),
                  "val": pa.array([0.5, 0.25, 2.0, -1.0])})
    ds = ray.data.from_arrow(t).repartition(4)  # some blocks empty after split
    out = bucket_sum(ds, key_col="key", val_col="val", num_buckets=4).to_pandas()
    got = dict(zip(out["key"], out["val"]))
    assert got == {1: 0.75, 2: 2.0, 7: -1.0}


def test_num_buckets_must_be_power_of_two(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1])}))
    with pytest.raises(ValueError, match="power of two"):
        bucket_sum(ds, key_col="k", val_col="v", num_buckets=48)
    with pytest.raises(ValueError, match="power of two"):
        hash_join(ds, ds, left_on="k", right_on="k", left_cols=["k"], right_cols=["v"],
                  num_buckets=100)


def test_hash_join_hot_key_salting(ray_session):
    """A catastrophically hot key must (a) produce identical output
    with salting on, and (b) actually spread its pairwise work across
    several buckets instead of one group."""
    import numpy as np

    from changesetmd_ray.joins.equi import _hot_key_counts, _salt_plan, hash_join

    # left: hot key 7 appears 2000x, 200 other keys once each
    lk = np.concatenate([np.full(2000, 7), np.arange(100, 300)])
    rk = np.concatenate([np.full(500, 7), np.arange(200, 400)])
    left = pa.table({"lid": pa.array(np.arange(len(lk)), pa.int64()),
                     "k": pa.array(lk, pa.int64())})
    right = pa.table({"rid": pa.array(np.arange(len(rk)), pa.int64()),
                      "kk": pa.array(rk, pa.int64())})

    def run(**kw):
        out = hash_join(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(4),
            left_on="k", right_on="kk",
            left_cols=["lid", "k"], right_cols=["rid", "kk"], **kw,
        ).to_pandas()
        # ROW COUNT must match the pair set size: a shard landing in
        # two buckets would duplicate pairs, which set() would hide
        pairs = set(zip(out["lid"], out["rid"]))
        assert len(out) == len(pairs), "duplicate output pairs"
        return pairs

    plain = run()
    salted = run(pair_budget=10_000)
    assert salted == plain
    assert len(plain) == 2000 * 500 + 100  # hot cross product + 100 overlap keys

    # the plan actually split the hot key
    cl = _hot_key_counts(ray.data.from_arrow(left), "k", 64)
    cr = _hot_key_counts(ray.data.from_arrow(right), "kk", 64)
    plan = _salt_plan(cl, cr, 10_000, 64)
    assert 7 in plan["keys"].tolist()
    assert plan["k"][plan["keys"].tolist().index(7)] >= 2


def test_broadcast_join_operators(ray_session):
    """broadcast_lookup / semi / anti: SQL-parity incl. null keys
    (inner+semi drop them, anti keeps them), verified vs pandas."""
    import numpy as np

    from changesetmd_ray.joins.broadcast import (
        anti_join_keys,
        broadcast_lookup,
        semi_join_keys,
    )

    big = pa.table({"id": pa.array(np.arange(10, dtype=np.int64)),
                    "k": pa.array([1, 2, 3, None, 5, 1, 99, 2, None, 7], pa.int64())})
    small = pa.table({"sk": pa.array([1, 2, 5, 7], pa.int64()),
                      "name": pa.array(["a", "b", "e", "g"])})
    ds = ray.data.from_arrow(big).repartition(3)

    j = broadcast_lookup(ds, small, big_on="k", small_on="sk", small_val="name").to_pandas()
    assert sorted(zip(j["id"], j["name"])) == [
        (0, "a"), (1, "b"), (4, "e"), (5, "a"), (7, "b"), (9, "g")]

    s = semi_join_keys(ds, small, big_on="k", small_on="sk").to_pandas()
    assert sorted(s["id"]) == [0, 1, 4, 5, 7, 9]

    a = anti_join_keys(ds, small, big_on="k", small_on="sk").to_pandas()
    assert sorted(a["id"]) == [2, 3, 6, 8]  # null keys kept (NOT EXISTS)


def test_tree_combine_matches_group_sum(ray_session):
    """tree_combine over a re-aggregating combiner equals a plain
    grouped sum, including with empty partial blocks and a fanin
    smaller AND larger than the input block count."""
    import numpy as np
    import ray.data

    from changesetmd_ray.stages.reduce import tree_combine

    rng = np.random.RandomState(3)
    keys = rng.randint(0, 7, 500)
    vals = rng.randint(-100, 100, 500).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys.astype(np.int64)), "v": pa.array(vals)})
    ds = ray.data.from_arrow(tbl).repartition(20)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "v"])

    for fanin in (4, 64):
        out = tree_combine(
            ds.map_batches(partial, batch_format="pyarrow"), partial, fanin=fanin
        ).to_pandas().sort_values("k").reset_index(drop=True)
        exp = (
            tbl.to_pandas().groupby("k", as_index=False)["v"].sum()
            .sort_values("k").reset_index(drop=True)
        )
        assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
        assert (out["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_shuffle_blocks_bounds(ray_session):
    """_shuffle_blocks is row-proportional, >= 1, and capped."""
    from changesetmd_ray.pipelines.queries import _shuffle_blocks

    sf = "/root/testdata/sf0.001"
    assert _shuffle_blocks(sf, "region") == 1  # 5 rows
    n = _shuffle_blocks(sf, "events", rows_per_block=100)
    assert 1 <= n <= 64
    assert _shuffle_blocks(sf, "events", rows_per_block=1, max_blocks=7) == 7


def test_pack_by_bucket_roundtrip(ray_session):
    """pack_by_bucket + flat round-trips values grouped per bucket,
    keeps scalar side tags, and emits a stable schema on empty blocks."""
    import numpy as np

    from changesetmd_ray.stages.exchange import flat_np, pack_by_bucket

    b = pa.table(
        {
            "__bucket": pa.array([2, 0, 2, 1, 0], pa.int64()),
            "side": pa.array([1, 1, 1, 1, 1], pa.int8()),
            "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
            "k": pa.array([5, 4, 3, 2, 1], pa.int64()),
        }
    )
    packed = pack_by_bucket(b, "__bucket", ["v", "k"], scalar_cols=("side",))
    assert packed.column_names == ["__bucket", "side", "v", "k"]
    assert packed["__bucket"].to_pylist() == [0, 1, 2]
    assert packed["side"].to_pylist() == [1, 1, 1]
    # per-bucket original row order preserved
    assert packed["v"].to_pylist() == [[20.0, 50.0], [40.0], [10.0, 30.0]]
    assert flat_np(packed, "k").tolist() == [4, 1, 2, 5, 3]
    empty = pack_by_bucket(b.slice(0, 0), "__bucket", ["v", "k"], scalar_cols=("side",))
    assert empty.num_rows == 0
    assert empty.schema.equals(packed.schema)


def test_broadcast_path_matches_shuffle_path(join_inputs):
    """The adaptive broadcast plan (broadcast_max_rows) must produce
    exactly the shuffle hash join's rows — including duplicate-key
    expansion and null-key drops."""
    left, right = join_inputs
    kw = dict(left_on="lk", right_on="rk",
              left_cols=["lk", "lval"], right_cols=["rk", "rname"])
    shuf = hash_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3), num_buckets=16, **kw)
    bcast = hash_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        broadcast_max_rows=10_000, **kw)
    a = _sorted_df(pa.Table.from_pandas(shuf.to_pandas(), preserve_index=False))
    b = _sorted_df(pa.Table.from_pandas(bcast.to_pandas(), preserve_index=False))
    pd.testing.assert_frame_equal(a, b)
    # below the limit the shuffle path must engage (0 forces it)
    forced = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        broadcast_max_rows=0, **kw)
    c = _sorted_df(pa.Table.from_pandas(forced.to_pandas(), preserve_index=False))
    pd.testing.assert_frame_equal(a, c)


def test_hot_key_spread_thin_documented_gap(ray_session):
    """Pin the DOCUMENTED heavy-hitter detection regime (equi.py
    _hot_key_counts): a key that is globally hot but appears ≤ once per
    block on both sides evades the per-block ≥2 tracker — no salting
    engages, output stays correct, and the worst case is bounded by
    blocks_l × blocks_r pairs in one bucket. Decision (round-3 verdict
    #7): keep the pre-pass as-is; a count-min sketch over full
    per-block counts would close the gap at the cost of shuffling every
    distinct key once, for a failure mode that is performance-only.
    This test keeps the regime measured: if the tracker ever starts
    seeing such keys (or stops seeing genuinely dense ones), it fails."""
    from changesetmd_ray.joins.equi import _hot_key_counts, _salt_plan

    n_blocks = 8
    # key 7 once per block (spread thin); key 9 four times per block (dense)
    blocks = [
        pa.table({"k": pa.array([7, 9, 9, 9, 9, i + 100, i + 200], pa.int64())})
        for i in range(n_blocks)
    ]
    ds = ray.data.from_arrow(blocks)
    counts = _hot_key_counts(ds, "k", hot_track=64)
    assert 7 not in counts          # the documented gap: ≤1/block evades
    assert counts.get(9) == 4 * n_blocks  # dense keys are always seen
    plan = _salt_plan(counts, counts, pair_budget=100, salt_max=8)
    assert 7 not in plan["keys"].tolist()
    assert 9 in plan["keys"].tolist()
    # correctness is unaffected in the evaded regime: join output exact
    rblocks = [b.rename_columns(["rk"]) for b in blocks]
    out = hash_join(
        ds, ray.data.from_arrow(rblocks), left_on="k", right_on="rk",
        left_cols=["k"], right_cols=["rk"], pair_budget=100,
    )
    left = pa.concat_tables(blocks).to_pandas()
    right = pa.concat_tables(rblocks).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")
    assert len(out.to_pandas()) == len(exp)

    # hot_exact=True closes the gap: exact global counts see key 7
    # (8×8=64 pairs < budget 100? no — budget 30 makes both violate)
    from changesetmd_ray.joins.equi import _exact_hot_counts

    rds = ray.data.from_arrow(rblocks)
    cl, cr = _exact_hot_counts(ds, rds, "k", "rk", pair_budget=30)
    assert cl.get(7) == n_blocks and cr.get(7) == n_blocks  # spread-thin CAUGHT
    assert cl.get(9) == 4 * n_blocks
    exact_plan = _salt_plan(cl, cr, pair_budget=30, salt_max=8)
    assert 7 in exact_plan["keys"].tolist()
    assert 9 in exact_plan["keys"].tolist()
    # keys under the budget never reach the driver
    assert all(cl[k] * cr[k] > 30 for k in cl)
    # and the exact-mode join output stays exact
    out2 = hash_join(
        ds, rds, left_on="k", right_on="rk",
        left_cols=["k"], right_cols=["rk"], pair_budget=30, hot_exact=True,
    )
    assert len(out2.to_pandas()) == len(exp)
