"""Exact-substring (span) dedup (text/spandup.py): winnowing guarantee,
planted duplicated passages, both policies, regime equivalence."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from changesetmd_ray.text.hashing import shingle_hashes, token_hashes
from changesetmd_ray.text.spandup import (
    _cut_spans,
    _fingerprints,
    _winnow,
    duplicated_fingerprints,
    span_dedup,
)

W, K = 8, 4
_PASSAGE = ("licensed under the creative commons attribution share alike "
            "terms with no warranty expressed or implied whatsoever in any "
            "jurisdiction worldwide forever")  # 22 tokens >= W+K-1


def _prose(i, n=30, seed=None):
    rng = np.random.default_rng(seed if seed is not None else i)
    return " ".join(f"w{i}t{rng.integers(1 << 20)}" for _ in range(n))


def _corpus():
    docs = []
    for i in range(10):
        if i < 6:  # passage planted mid-doc in 6 of 10
            docs.append({"doc_id": i,
                         "text": f"{_prose(i)} {_PASSAGE} {_prose(i + 100)}"})
        else:
            docs.append({"doc_id": i, "text": _prose(i)})
    return docs


def test_winnow_alignment_robust():
    """Two copies of one token sequence embedded at DIFFERENT offsets
    share at least one fingerprint — the winnowing guarantee."""
    rng = np.random.default_rng(0)
    core = rng.integers(1, 1 << 60, 40, dtype=np.uint64)
    for shift in (0, 1, 3, 7, 11):
        a = np.concatenate([rng.integers(1, 1 << 60, 5, np.uint64), core,
                            rng.integers(1, 1 << 60, 9, np.uint64)])
        b = np.concatenate([rng.integers(1, 1 << 60, 5 + shift, np.uint64),
                            core, rng.integers(1, 1 << 60, 2, np.uint64)])
        fa = shingle_hashes(a, W)[_winnow(shingle_hashes(a, W), K)]
        fb = shingle_hashes(b, W)[_winnow(shingle_hashes(b, W), K)]
        assert set(fa.tolist()) & set(fb.tolist())


def test_cut_spans_merges_overlaps():
    text = "0123456789abcdef"
    out, n, r = _cut_spans(text, np.array([2, 4, 10]), np.array([6, 8, 12]))
    assert out == "01" + "89" + "cdef" and n == 2 and r == 8
    assert _cut_spans(text, np.empty(0, np.int64), np.empty(0, np.int64)) == (
        text, 0, 0)


def test_duplicated_fingerprints_planted(ray_session):
    ds = ray.data.from_items(_corpus()).repartition(4)
    dup = duplicated_fingerprints(ds, w=W, winnow_k=K, num_buckets=8)
    rows = dup.take_all()
    assert rows  # the planted passage produced shared fingerprints
    assert all(r["n"] >= 6 for r in rows)  # each shared by all 6 carriers
    assert all(r["min_id"] == 0 for r in rows)  # global first = doc 0


@pytest.mark.parametrize("limit", [10**9, 0])  # broadcast / distributed
def test_span_dedup_removes_passage(ray_session, limit):
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(4)
    out = {r["doc_id"]: r["text"]
           for r in span_dedup(ds, w=W, winnow_k=K, broadcast_limit=limit,
                               num_buckets=8).take_all()}
    assert set(out) == set(range(10))
    # the passage CORE is cut from every carrier (fringes <= W-1 tokens
    # may survive; the middle words must not)
    for i in range(6):
        assert "no warranty expressed or implied" not in out[i]
        # unique prose on both sides survives
        assert out[i].startswith(docs[i]["text"].split()[0])
        assert docs[i]["text"].split()[-1] in out[i]
    for i in range(6, 10):
        assert out[i] == docs[i]["text"]  # untouched docs byte-identical


def test_span_dedup_keep_first(ray_session):
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(4)
    out = {r["doc_id"]: r["text"]
           for r in span_dedup(ds, w=W, winnow_k=K, keep="first",
                               num_buckets=8).take_all()}
    assert _PASSAGE in out[0]          # global first occurrence survives
    for i in range(1, 6):
        assert "no warranty expressed or implied" not in out[i]


def test_span_dedup_regimes_identical(ray_session):
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(4)
    a = sorted(span_dedup(ds, w=W, winnow_k=K, with_stats=True,
                          num_buckets=8).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(span_dedup(ds, w=W, winnow_k=K, with_stats=True,
                          broadcast_limit=0, num_buckets=8).take_all(),
               key=lambda r: r["doc_id"])
    assert [dict(r) for r in a] == [dict(r) for r in b]
    assert all(r["n_cuts"] >= 1 for r in a[:6])
    assert all(r["n_cuts"] == 0 and r["chars_removed"] == 0 for r in a[6:])


def test_short_doc_whole_shingle(ray_session):
    """Docs shorter than w tokens dedup on their whole token sequence;
    the cut removes everything (keep='none')."""
    docs = [{"doc_id": 0, "text": "tiny dup doc"},
            {"doc_id": 1, "text": "tiny dup doc"},
            {"doc_id": 2, "text": "a unique small one"}]
    out = {r["doc_id"]: r["text"]
           for r in span_dedup(ray.data.from_items(docs), w=W, winnow_k=K,
                               num_buckets=8).take_all()}
    assert out[0] == "" and out[1] == ""
    assert out[2] == "a unique small one"


def test_fingerprints_short_doc():
    h, pos = _fingerprints("only three tokens", W, K)
    assert len(h) == 1 and pos[0] == 0
