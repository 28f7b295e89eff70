"""Repetition filter (Gopher rules), Bloom-filter decontamination, and
PII scrubbing — each pinned against an independent driver-side oracle
built straight from the feature definitions (no shared code paths
beyond tokenize; the PII oracle re-runs the patterns through Python's
``re``, checking the Arrow re2 kernels agree)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from changesetmd_ray.text.bloom import (
    BloomFilter,
    build_ngram_bloom,
    decontaminate,
    doc_ngram_hashes,
)
from changesetmd_ray.text.hashing import tokenize
from changesetmd_ray.text.repetition import (
    repetition_features,
    repetition_filter,
)

# ---------------------------------------------------------- repetition


def _oracle_dup_fracs(units):
    seen, dup_n, dup_chars, total_chars = {}, 0, 0, 0
    for u in units:
        total_chars += len(u)
        if u in seen:
            dup_n += 1
            dup_chars += len(u)
        seen[u] = True
    if not units:
        return 0.0, 0.0
    return dup_n / len(units), (dup_chars / total_chars if total_chars else 0.0)


def _oracle_ngram_fracs(text, n, top):
    toks = tokenize(text or "")
    total = sum(len(w) for w in toks)
    if not toks or total == 0 or len(toks) - n + 1 <= 0:
        return 0.0
    grams = {}
    for i in range(len(toks) - n + 1):
        g = tuple(toks[i : i + n])
        grams.setdefault(g, []).append(sum(len(w) for w in g))
    if top:
        mass = max(
            (len(v) * v[0] for v in grams.values() if len(v) > 1), default=0
        )
        return min(1.0, mass / total)
    rep = sum(sum(v[1:]) for v in grams.values() if len(v) > 1)
    return min(1.0, rep / total)


CASES = [
    "",  # empty
    "one line only with plenty of distinct words here today",
    "dup\nline a\ndup\nline b\ndup\n",  # repeated lines
    "para one here\n\npara two there\n\npara one here",  # repeated paragraph
    "spam spam spam spam spam spam ham",  # degenerate 2-grams
    "the quick brown fox jumps over the lazy dog " * 3,  # long-range repeats
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    # distinct identical-token pairs: "aa aa" and "bb bb" are DIFFERENT
    # grams, each occurring once → no repetition mass (regression: a
    # raw xor-chain first step hashed every such pair to splitmix64(0))
    "aa aa bb bb cc dd ee ff gg hh",
    "word " * 200,  # catastrophically repetitive
]


def test_repetition_features_match_oracle(ray_session):
    batch = pa.table({"text": pa.array(CASES, pa.string())})
    feat = repetition_features(batch)
    for i, t in enumerate(CASES):
        lines = [ln.rstrip("\r") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln.strip()]
        ef, ecf = _oracle_dup_fracs(lines)
        assert feat["dup_line_frac"][i].as_py() == pytest.approx(ef), (i, t)
        assert feat["dup_line_char_frac"][i].as_py() == pytest.approx(ecf)
        paras = [p.strip() for p in t.split("\n\n")]
        paras = [p for p in paras if p]
        ef, ecf = _oracle_dup_fracs(paras)
        assert feat["dup_para_frac"][i].as_py() == pytest.approx(ef)
        assert feat["dup_para_char_frac"][i].as_py() == pytest.approx(ecf)
        for n in (2, 3, 4):
            assert feat[f"top_{n}gram_frac"][i].as_py() == pytest.approx(
                _oracle_ngram_fracs(t, n, top=True)
            ), (i, n, t)
        for n in (5, 6, 7, 8, 9, 10):
            assert feat[f"dup_{n}gram_frac"][i].as_py() == pytest.approx(
                _oracle_ngram_fracs(t, n, top=False)
            ), (i, n, t)


def test_repetition_filter_keeps_clean_drops_spam(ray_session):
    clean = [
        f"document number {i} talks about a different topic entirely, "
        f"mentioning subject {i * 7} and concept {i * 13} in passing detail"
        for i in range(20)
    ]
    spam = ["buy now " * 50, "click\nclick\nclick\nclick\nclick\nhere",
            "lorem ipsum " * 40]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(23), pa.int64()),
                  "text": pa.array(clean + spam, pa.string())})
    ).repartition(3)
    kept = repetition_filter(ds).to_pandas()
    assert set(kept.columns) == {"doc_id", "text"}  # features dropped
    assert set(kept["doc_id"]) == set(range(20))  # spam gone, clean intact


# --------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.RandomState(7)
    items = rng.randint(0, 2**63, 5000).astype(np.uint64)
    bf = BloomFilter(m_bits=1 << 17, k=4)  # ~26 bits/item
    bf.add(items)
    assert bf.contains(items).all()  # Bloom property: no false negatives
    others = rng.randint(0, 2**63, 20000).astype(np.uint64)
    others = others[~np.isin(others, items)]
    fp = bf.contains(others).mean()
    assert fp < 0.01, fp


def test_bloom_merge_and_validation():
    a, b = BloomFilter(1 << 10, 3), BloomFilter(1 << 10, 3)
    xs = np.arange(10, dtype=np.uint64)
    ys = np.arange(50, 60, dtype=np.uint64)
    a.add(xs)
    b.add(ys)
    a.merge(b)
    assert a.contains(xs).all() and a.contains(ys).all()
    with pytest.raises(ValueError, match="different shape"):
        a.merge(BloomFilter(1 << 11, 3))
    with pytest.raises(ValueError, match="multiple of 64"):
        BloomFilter(100)


def test_decontaminate_flags_planted_overlap(ray_session):
    # benchmark: 5 "eval questions"; corpus: 40 clean docs + 5 docs
    # that embed a full benchmark sentence verbatim
    bench_texts = [
        f"what is the capital of country number {i} and why does the "
        f"river {i * 3} flow north through its mountain range" for i in range(5)
    ]
    bench = ray.data.from_arrow(
        pa.table({"text": pa.array(bench_texts, pa.string())})
    ).repartition(2)
    bloom = build_ngram_bloom(bench, n=13, m_bits=1 << 16)

    clean = [
        f"entirely unrelated page {i} discussing the weather patterns of "
        f"region {i * 11} with seasonal rainfall data and crop yields and "
        f"numerous other agricultural observations collected over decades"
        for i in range(40)
    ]
    dirty = [f"intro text; {b} ; trailing commentary" for b in bench_texts]
    corpus = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(45), pa.int64()),
                  "text": pa.array(clean + dirty, pa.string())})
    ).repartition(4)

    bloom_ref = ray.put(bloom)
    flagged = decontaminate(
        corpus, bloom_ref, n=13, keep_contaminated=True
    ).to_pandas().set_index("doc_id").sort_index()
    assert flagged.loc[40:, "contaminated"].all()  # planted docs caught
    assert not flagged.loc[:39, "contaminated"].any()  # clean docs pass
    # default mode drops the contaminated rows and the flag columns
    kept = decontaminate(corpus, bloom_ref, n=13).to_pandas()
    assert set(kept["doc_id"]) == set(range(40))
    assert set(kept.columns) == {"doc_id", "text"}


# ----------------------------------------------------------------- pii


PII_CASES = [
    "contact me at john.doe+spam@example.co.uk for details",
    "call +1 555 123 4567 or (030) 1234-5678 today",
    "server at 192.168.0.1 and 8.8.8.8 responded",
    "no pii here, just the number 123456789 and v1.2.3.4000",
    "dates 2024-12-31 and ranges 100-200-300 stay",
    "mixed: a@b.io, 10.0.0.255, 555-123-4567",
    "octets out of range 999.999.999.999 don't match",
    "",
]


def test_pii_features_match_re_oracle():
    import re

    from changesetmd_ray.text.pii import PII_PATTERNS, pii_features

    batch = pa.table({"text": pa.array(PII_CASES, pa.string())})
    feat = pii_features(batch)
    for kind, pattern in PII_PATTERNS.items():
        rx = re.compile(pattern)
        for i, t in enumerate(PII_CASES):
            exp = len(rx.findall(t))
            assert feat[f"n_{kind}"][i].as_py() == exp, (kind, t)
    # the no-PII rows are exactly rows 3, 4, 6, 7
    assert feat["has_pii"].to_pylist() == [
        True, True, True, False, False, True, False, False
    ]


def test_scrub_pii_redacts_and_preserves_clean(ray_session):
    import re

    from changesetmd_ray.text.pii import (
        PII_PATTERNS,
        REDACTION_TOKENS,
        scrub_pii,
    )

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(PII_CASES)), pa.int64()),
                  "text": pa.array(PII_CASES, pa.string())})
    ).repartition(2)
    out = scrub_pii(ds).to_pandas().sort_values("doc_id")
    for i, (orig, got) in enumerate(zip(PII_CASES, out["text"])):
        exp = orig
        for kind, pattern in PII_PATTERNS.items():
            exp = re.sub(pattern, REDACTION_TOKENS[kind], exp)
        assert got == exp, (i, orig)
        # nothing PII-shaped survives
        for pattern in PII_PATTERNS.values():
            assert not re.search(pattern, got), (i, got)
    # clean rows byte-identical
    assert out["text"].iloc[3] == PII_CASES[3]
    assert out["text"].iloc[4] == PII_CASES[4]
