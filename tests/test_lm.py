"""Byte-n-gram LM perplexity (text/lm.py): fluent-vs-gibberish
separation, exact distributed counting, scoring parity, filter."""

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.text.lm import (
    ByteLmModel,
    _doc_grams,
    lm_filter,
    lm_score,
    score_docs,
    train_byte_lm,
)

_FLUENT = ("the quick brown fox jumps over the lazy dog and then the dog "
           "runs after the fox through the green field near the old house")


def _mk(n_docs=60, seed=2):
    rng = np.random.default_rng(seed)
    words = _FLUENT.split()
    return [" ".join(rng.choice(words, size=30)) for _ in range(n_docs)]


def _gibberish(n_docs=20, seed=3):
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"qxzjvkwfy", dtype=np.uint8)
    return ["".join(chr(c) for c in rng.choice(alphabet, size=90))
            for _ in range(n_docs)]


def test_train_counts_exact(ray_session):
    import ray.data

    docs = _mk(30)
    tbl = pa.table({"text": pa.array(docs, pa.string())})
    model = train_byte_lm(ray.data.from_arrow(tbl).repartition(4),
                          n=3, n_buckets=1 << 12)
    gram = np.zeros(1 << 12, np.int64)
    ctx = np.zeros(1 << 12, np.int64)
    for t in docs:
        g, c = _doc_grams(t, 3, 1 << 12)
        np.add.at(gram, g.astype(np.int64), 1)
        np.add.at(ctx, c.astype(np.int64), 1)
    assert np.array_equal(model.gram, gram)
    assert np.array_equal(model.ctx, ctx)


def test_fluent_scores_below_gibberish(ray_session):
    import ray.data

    train = pa.table({"text": pa.array(_mk(80, seed=5), pa.string())})
    model = train_byte_lm(ray.data.from_arrow(train), n=4, n_buckets=1 << 16)
    fluent = score_docs(_mk(10, seed=9), model)
    junk = score_docs(_gibberish(10), model)
    assert fluent.max() < junk.min()  # clean margin, not just means


def test_distributed_score_parity_and_filter(ray_session):
    import ray.data

    train = pa.table({"text": pa.array(_mk(60, seed=7), pa.string())})
    model = train_byte_lm(ray.data.from_arrow(train), n=4, n_buckets=1 << 14)
    docs = [*_mk(15, seed=11), *_gibberish(15, seed=12), "ab", ""]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {r["doc_id"]: r["log2_ppl"] for r in lm_score(ds, model).take_all()}
    want = score_docs(docs, model)
    for i, w in enumerate(want):
        if np.isinf(w):
            assert np.isinf(got[i])
        else:
            assert got[i] == w  # bit-exact: same kernel
    # sub-n docs score inf
    assert np.isinf(got[len(docs) - 1]) and np.isinf(got[len(docs) - 2])
    thr = float(np.median(want[np.isfinite(want)]))
    kept = sorted(r["doc_id"] for r in lm_filter(ds, model, thr).take_all())
    assert kept == sorted(i for i, w in enumerate(want) if w <= thr)


def test_validation(ray_session):
    with pytest.raises(ValueError, match="n must be"):
        import ray.data

        train_byte_lm(ray.data.from_items([{"text": "x"}]), n=1)
    m = ByteLmModel(n=4, gram=np.zeros(16, np.int64), ctx=np.zeros(16, np.int64))
    assert np.isinf(score_docs([""], m)[0])


def test_ppl_partition_head_middle_tail(ray_session):
    """CCNet terciles: fluent docs land in head/middle, gibberish in
    tail; keep=('head','middle') drops exactly the tail; bucket sizes
    match the tercile fractions."""
    import ray.data

    from changesetmd_ray.text.lm import ppl_partition

    fluent = _mk(40)
    gib = _gibberish(20)
    docs = fluent + gib
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    model = train_byte_lm(
        ray.data.from_arrow(pa.table({"text": pa.array(fluent)})),
        n=4, n_buckets=1 << 14)

    ds = ray.data.from_arrow(tbl).repartition(4)
    out = ppl_partition(ds, model).take_all()
    assert len(out) == 60
    buckets = {r["doc_id"]: r["ppl_bucket"] for r in out}
    # terciles: 20 per bucket (exact-quantile thresholds on 60 docs)
    from collections import Counter

    sizes = Counter(buckets.values())
    assert sizes["head"] + sizes["middle"] + sizes["tail"] == 60
    assert abs(sizes["head"] - 20) <= 1 and abs(sizes["tail"] - 20) <= 1
    # every gibberish doc scores worse than every fluent doc → tail
    assert all(buckets[i] == "tail" for i in range(40, 60))

    kept = ppl_partition(ds, model, keep=("head", "middle")).take_all()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        i for i in range(60) if buckets[i] != "tail")
    with pytest.raises(ValueError):
        ppl_partition(ds, model, keep=("head", "bogus"))
    with pytest.raises(ValueError):
        ppl_partition(ds, model, fractions=(0.9, 0.1))
