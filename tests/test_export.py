"""shuffle_export: seeded deterministic global shuffle + sharded sink.

Contracts under test:
- exactly-once: every input row appears in exactly one shard,
- determinism: output (shard membership AND within-shard order) is a
  pure function of (rows, ids, seed, num_shards) — invariant to the
  input's block arrangement,
- seed sensitivity: a different seed yields a different permutation,
- balance: shard sizes are near-uniform,
- resume: re-running overwrites shards idempotently (same bytes-level
  content),
- string ids work; null ids are rejected.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from changesetmd_ray.stages.export import read_export, shuffle_export


def _docs(n: int, str_ids: bool = False) -> pa.Table:
    rng = np.random.default_rng(7)
    ids = [f"doc-{i:06d}" for i in range(n)] if str_ids else np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "score": pa.array(rng.random(n)),
        }
    )


def _export_tables(out_dir: str) -> list[pa.Table]:
    return [
        pq.read_table(p)
        for p in sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    ]


def test_exactly_once_and_deterministic_order(ray_session, tmp_path):
    import ray.data

    tab = _docs(4000)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    m_a = shuffle_export(
        ray.data.from_arrow(tab), out_a, id_col="doc_id", seed=5, num_shards=8
    )
    # same rows, radically different block arrangement
    m_b = shuffle_export(
        ray.data.from_arrow(tab).repartition(17), out_b, id_col="doc_id", seed=5, num_shards=8
    )
    assert sum(m_a["rows"].to_pylist()) == 4000
    a, b = _export_tables(out_a), _export_tables(out_b)
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        assert ta.equals(tb)  # membership AND order, block-layout-free
    # exactly-once
    all_ids = np.concatenate([t["doc_id"].to_numpy() for t in a])
    assert sorted(all_ids.tolist()) == list(range(4000))
    # the permutation actually decorrelates from input order
    assert not np.array_equal(a[0]["doc_id"].to_numpy(), np.arange(len(a[0])))


def test_seed_changes_permutation_and_balance(ray_session, tmp_path):
    import ray.data

    tab = _docs(4096)
    out5, out6 = str(tmp_path / "s5"), str(tmp_path / "s6")
    m5 = shuffle_export(ray.data.from_arrow(tab), out5, id_col="doc_id", seed=5, num_shards=8)
    shuffle_export(ray.data.from_arrow(tab), out6, id_col="doc_id", seed=6, num_shards=8)
    first5 = _export_tables(out5)[0]["doc_id"].to_numpy()
    first6 = _export_tables(out6)[0]["doc_id"].to_numpy()
    assert not np.array_equal(first5, first6)
    sizes = np.array(m5["rows"].to_pylist())
    assert len(sizes) == 8
    # uniform hashing: every shard within ±35% of the 512 mean
    assert sizes.min() > 512 * 0.65 and sizes.max() < 512 * 1.35


def test_resume_idempotent_and_reader(ray_session, tmp_path):
    import ray.data

    tab = _docs(1000)
    out = str(tmp_path / "r")
    shuffle_export(ray.data.from_arrow(tab), out, id_col="doc_id", seed=1, num_shards=4)
    before = _export_tables(out)
    shuffle_export(ray.data.from_arrow(tab), out, id_col="doc_id", seed=1, num_shards=4)
    after = _export_tables(out)
    assert all(x.equals(y) for x, y in zip(before, after))
    back = read_export(out).take_all()
    assert len(back) == 1000
    assert read_export(out, columns=["doc_id"]).schema().names == ["doc_id"]


def test_string_ids_and_single_shard(ray_session, tmp_path):
    import ray.data

    tab = _docs(300, str_ids=True)
    out = str(tmp_path / "s")
    m = shuffle_export(ray.data.from_arrow(tab), out, id_col="doc_id", seed=0, num_shards=1)
    assert m["rows"].to_pylist() == [300]
    t = _export_tables(out)[0]
    assert sorted(t["doc_id"].to_pylist()) == sorted(tab["doc_id"].to_pylist())
    assert t["doc_id"].to_pylist() != sorted(t["doc_id"].to_pylist())  # shuffled


def test_null_ids_rejected(ray_session, tmp_path):
    import ray.data

    tab = pa.table({"doc_id": pa.array([1, None, 3], pa.int64()), "x": [1.0, 2.0, 3.0]})
    # the ValueError surfaces wrapped in RayTaskError — pin the message
    # so only the null-id rejection contract passes, not any crash
    with pytest.raises(Exception, match="null ids"):
        shuffle_export(
            ray.data.from_arrow(tab), str(tmp_path / "n"), id_col="doc_id", num_shards=2
        )


def test_split_export_disjoint_exhaustive_stable(ray_session, tmp_path):
    import ray.data

    from changesetmd_ray.stages.export import split_export

    tab = _docs(3000)
    out = str(tmp_path / "split")
    res = split_export(
        ray.data.from_arrow(tab),
        out,
        id_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=3,
        num_shards=4,
    )
    ids = {
        name: set(
            np.concatenate(
                [t["doc_id"].to_numpy() for t in _export_tables(os.path.join(out, name))]
            ).tolist()
        )
        for name in res
    }
    # disjoint and exhaustive
    assert ids["train"] | ids["val"] | ids["test"] == set(range(3000))
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    assert not (ids["train"] & ids["test"])
    # fractions approximately honored
    assert 0.75 < len(ids["train"]) / 3000 < 0.85
    # membership is layout-stable: rerun from a different block layout
    out2 = str(tmp_path / "split2")
    split_export(
        ray.data.from_arrow(tab).repartition(11),
        out2,
        id_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=3,
        num_shards=4,
    )
    for name in ids:
        a = _export_tables(os.path.join(out, name))
        b = _export_tables(os.path.join(out2, name))
        assert all(x.equals(y) for x, y in zip(a, b)) and len(a) == len(b)


def test_split_export_bad_fractions(ray_session, tmp_path):
    import ray.data

    from changesetmd_ray.stages.export import split_export

    with pytest.raises(ValueError):
        split_export(
            ray.data.from_arrow(_docs(10)),
            str(tmp_path / "x"),
            id_col="doc_id",
            fractions={"train": 0.5, "val": 0.1},
        )


def test_mix_corpora_proportions_and_determinism(ray_session, tmp_path):
    import ray.data

    from changesetmd_ray.stages.export import mix_corpora

    web = _docs(4000)
    code = pa.table(
        {
            "doc_id": pa.array(np.arange(10_000, 11_000, dtype=np.int64)),
            "score": pa.array(np.zeros(1000)),
        }
    )
    srcs = {"web": ray.data.from_arrow(web), "code": ray.data.from_arrow(code)}
    mixed, plan = mix_corpora(srcs, {"web": 0.5, "code": 0.5}, id_col="doc_id", seed=11)
    # T = min(4000/0.5, 1000/0.5) = 2000 -> 1000 from each
    assert plan["code"]["keep_rate"] == 1.0 and plan["code"]["target"] == 1000
    assert abs(plan["web"]["keep_rate"] - 0.25) < 1e-9
    rows = mixed.take_all()
    n_web = sum(1 for r in rows if r["source"] == "web")
    n_code = sum(1 for r in rows if r["source"] == "code")
    assert n_code == 1000  # rate-1 source passes through whole
    assert 850 < n_web < 1150  # binomial around 1000
    # deterministic, layout-stable membership
    srcs2 = {
        "web": ray.data.from_arrow(web).repartition(9),
        "code": ray.data.from_arrow(code),
    }
    mixed2, _ = mix_corpora(srcs2, {"web": 0.5, "code": 0.5}, id_col="doc_id", seed=11)
    ids1 = sorted(r["doc_id"] for r in rows)
    ids2 = sorted(r["doc_id"] for r in mixed2.take_all())
    assert ids1 == ids2


def test_split_export_single_pass(ray_session, tmp_path):
    """The split export's input lineage must execute exactly ONCE — a
    3-way split that re-reads the corpus per split would be a 3× read
    at 100 TB (round-3 verdict item #3). Counted by a marker map that
    tallies every row it sees across the whole run."""
    import ray
    import ray.data

    from changesetmd_ray.stages.export import split_export

    src = str(tmp_path / "src.parquet")
    pq.write_table(_docs(2000), src)

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def add(self, k):
            self.n += k

        def total(self):
            return self.n

    counter = Counter.remote()

    def tally(batch: pa.Table) -> pa.Table:
        ray.get(counter.add.remote(len(batch)))
        return batch

    ds = ray.data.read_parquet(src).map_batches(tally, batch_format="pyarrow")
    split_export(
        ds,
        str(tmp_path / "out"),
        id_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=3,
        num_shards=4,
    )
    assert ray.get(counter.total.remote()) == 2000  # once, not 3×


def test_split_export_matches_filter_then_shuffle(ray_session, tmp_path):
    """Pin the single-pass rewrite to the original semantics: each
    split's shard files must be byte-identical to shuffle_export over
    the hash-filtered subset (the old per-split path)."""
    import ray.data

    from changesetmd_ray.stages.export import _id_hash64, split_export
    from changesetmd_ray.text.hashing import splitmix64

    tab = _docs(2500)
    seed, fractions = 9, {"train": 0.7, "val": 0.3}
    out = str(tmp_path / "new")
    split_export(
        ray.data.from_arrow(tab), out, id_col="doc_id",
        fractions=fractions, seed=seed, num_shards=4,
    )
    # old path: membership by the same split hash, then shuffle_export
    split_mix = splitmix64(np.array([np.uint64(seed + 1)], np.uint64))[0]
    h = splitmix64(_id_hash64(tab, "doc_id") ^ split_mix)
    hi0 = np.uint64(0.7 * float(2**64))
    old = str(tmp_path / "old")
    shuffle_export(
        ray.data.from_arrow(tab.filter(pa.array(h <= hi0))),
        os.path.join(old, "train"), id_col="doc_id", seed=seed, num_shards=4,
    )
    shuffle_export(
        ray.data.from_arrow(tab.filter(pa.array(h > hi0))),
        os.path.join(old, "val"), id_col="doc_id", seed=seed, num_shards=4,
    )
    for name in fractions:
        a = _export_tables(os.path.join(out, name))
        b = _export_tables(os.path.join(old, name))
        assert len(a) == len(b) > 0
        assert all(x.equals(y) for x, y in zip(a, b))


def test_mix_export_fused_and_interleaved(ray_session, tmp_path):
    """Fused mixture+export: sources read once, ONE payload shuffle,
    and every output shard is locally interleaved (both sources appear
    in proportion inside each shard, not source-by-source)."""
    import ray.data

    from changesetmd_ray.stages.export import mix_export

    web = _docs(4000)
    code = pa.table(
        {
            "doc_id": pa.array(np.arange(10_000, 11_000, dtype=np.int64)),
            "score": pa.array(np.zeros(1000)),
        }
    )
    manifest, plan = mix_export(
        {"web": ray.data.from_arrow(web), "code": ray.data.from_arrow(code)},
        {"web": 0.5, "code": 0.5},
        str(tmp_path / "mix"),
        id_col="doc_id",
        seed=11,
        num_shards=4,
        counts={"web": 4000, "code": 1000},  # precomputed: no count() pass
    )
    assert plan["code"]["keep_rate"] == 1.0
    total = sum(manifest["rows"].to_pylist())
    # T=2000: 1000 code exactly + ~1000 web (binomial)
    assert 1850 < total < 2150
    for t in _export_tables(str(tmp_path / "mix")):
        srcs = t["source"].to_pylist()
        n_code = sum(1 for s in srcs if s == "code")
        # each shard holds a genuine mixture near 50/50
        assert 0.35 < n_code / len(srcs) < 0.65
        # interleaved, not grouped: code rows are not contiguous
        first_code = srcs.index("code")
        assert "web" in srcs[first_code:]


def test_mix_corpora_validation(ray_session):
    import ray.data

    from changesetmd_ray.stages.export import mix_corpora

    ds = ray.data.from_arrow(_docs(10))
    with pytest.raises(ValueError):
        mix_corpora({"a": ds}, {"a": 0.5}, id_col="doc_id")
    with pytest.raises(ValueError):
        mix_corpora({"a": ds}, {"b": 1.0}, id_col="doc_id")
