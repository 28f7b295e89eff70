"""Hashed n-gram quality classifier (text/classifier.py): separable
training, distributed-vs-driver score parity, determinism, filter
form, and Arrow round-trip."""

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.text.classifier import (
    HashedNgramModel,
    _score_docs,
    classifier_filter,
    classifier_score,
    train_classifier,
)

_GOOD_WORDS = (
    "the quick study found that careful analysis of the data shows "
    "clear results and the method was described in detail with sources"
).split()
_BAD_WORDS = (
    "click here buy now free winner casino jackpot xxx cheap pills "
    "subscribe deal offer limited act fast money prize claim bonus"
).split()


def _mk_docs(words, n, seed, length=25):
    rng = np.random.default_rng(seed)
    return [" ".join(rng.choice(words, size=length)) for _ in range(n)]


def _labeled(seed=0, n=80):
    pos = _mk_docs(_GOOD_WORDS, n, seed)
    neg = _mk_docs(_BAD_WORDS, n, seed + 1)
    return pos, neg


def test_train_separates_heldout():
    pos, neg = _labeled(seed=0)
    model = train_classifier(pos[:60], neg[:60], n_buckets=1 << 14)
    hp = _score_docs(pos[60:], model)
    hn = _score_docs(neg[60:], model)
    acc = (np.concatenate([hp >= 0.5, hn < 0.5])).mean()
    assert acc >= 0.95
    assert hp.mean() > 0.8 and hn.mean() < 0.2


def test_training_deterministic():
    pos, neg = _labeled(seed=3, n=30)
    m1 = train_classifier(pos, neg, n_buckets=1 << 12)
    m2 = train_classifier(pos, neg, n_buckets=1 << 12)
    assert m1.bias == m2.bias
    assert np.array_equal(m1.weights, m2.weights)


def test_distributed_score_matches_driver(ray_session):
    import ray.data

    pos, neg = _labeled(seed=5, n=40)
    model = train_classifier(pos, neg, n_buckets=1 << 13)
    docs = [*_mk_docs(_GOOD_WORDS, 30, 7), *_mk_docs(_BAD_WORDS, 30, 8), "", "   "]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = {r["doc_id"]: r["quality_prob"]
           for r in classifier_score(ds, model).take_all()}
    want = _score_docs(docs, model)
    assert len(got) == len(docs)
    for i, w in enumerate(want):
        assert got[i] == w  # bit-exact: same kernel, same float64 path
    # empty docs score sigmoid(bias)
    sig_b = 1.0 / (1.0 + np.exp(-model.bias))
    assert got[len(docs) - 2] == sig_b


def test_filter_form(ray_session):
    import ray.data

    pos, neg = _labeled(seed=9, n=40)
    model = train_classifier(pos, neg, n_buckets=1 << 13)
    docs = [*_mk_docs(_GOOD_WORDS, 25, 11), *_mk_docs(_BAD_WORDS, 25, 12)]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    kept = sorted(r["doc_id"] for r in classifier_filter(ds, model, 0.5).take_all())
    want = sorted(i for i, s in enumerate(_score_docs(docs, model)) if s >= 0.5)
    assert kept == want
    assert 15 <= len(kept) <= 35  # roughly the positive half survives


def test_arrow_roundtrip():
    pos, neg = _labeled(seed=13, n=20)
    model = train_classifier(pos, neg, n_buckets=1 << 10)
    back = HashedNgramModel.from_arrow(model.to_arrow())
    assert back.bias == model.bias and back.bigrams == model.bigrams
    assert np.array_equal(back.weights, model.weights)
    docs = _mk_docs(_GOOD_WORDS, 5, 1)
    assert np.array_equal(_score_docs(docs, back), _score_docs(docs, model))


def test_validation():
    with pytest.raises(ValueError, match="positive and one negative"):
        train_classifier([], ["x"])
