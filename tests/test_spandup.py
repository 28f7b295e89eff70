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


def test_token_hashes64_resists_crc_collisions(ray_session):
    """span_dedup deletes content on fingerprint EQUALITY, so its token
    hashes must not inherit crc32's 32-bit collision budget: find a
    real crc32-colliding token pair, embed each in the same context,
    and assert the windows do NOT share fingerprints (and span_dedup
    leaves both docs intact)."""
    import zlib

    from changesetmd_ray.text.hashing import token_hashes, token_hashes64

    rng = np.random.default_rng(0)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    seen: dict[int, str] = {}
    pair = None
    # random 12-char tokens: crc32 is INJECTIVE on short structured
    # strings (affine over ≤4-byte deltas), so vary many byte positions
    for chunk in range(64):
        toks = alpha[rng.integers(0, 26, (1 << 15, 12))]
        for row in toks:
            tok = "".join(row)
            c = zlib.crc32(tok.encode())
            if c in seen and seen[c] != tok:
                pair = (seen[c], tok)
                break
            seen[c] = tok
        if pair:
            break
    assert pair is not None, "no crc32 collision in 2M random tokens"
    a, b = pair
    # the old chain collided on these; the digest hash must not
    assert token_hashes([a])[0] == token_hashes([b])[0]
    assert token_hashes64([a])[0] != token_hashes64([b])[0]
    ctx = [f"c{j}" for j in range(W + K + 4)]
    doc_a = " ".join(ctx[: W // 2] + [a] + ctx[W // 2:])
    doc_b = " ".join(ctx[: W // 2] + [b] + ctx[W // 2:])
    # windows containing the colliding token must differ (so survive);
    # windows of pure shared context legitimately dedup away
    out = {r["doc_id"]: r["text"] for r in span_dedup(
        ray.data.from_items(
            [{"doc_id": 0, "text": doc_a}, {"doc_id": 1, "text": doc_b}]),
        w=W, winnow_k=1, min_count=2).take_all()}
    assert a in out[0] and b in out[1]  # colliding tokens NOT cut


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
    # the winnowing GUARANTEE is ≥1 fingerprint shared by all copies;
    # boundary k-runs may additionally select interior windows in only
    # a subset of carriers (hash-value-dependent), so other rows only
    # promise n ≥ min_count and a carrier min_id
    assert any(r["n"] >= 6 and r["min_id"] == 0 for r in rows)
    assert all(r["n"] >= 2 for r in rows)
    assert all(0 <= r["min_id"] <= 5 for r in rows)  # passage carriers


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
