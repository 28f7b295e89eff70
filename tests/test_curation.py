"""End-to-end curation recipe (pipelines/curation.py): every stage
removes exactly its planted artifact class; schema and report shape."""

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.pipelines.curation import CurationConfig, CurationResult, curate

_EN = ("the study found that analysis of the data shows clear results and "
       "the method was described in detail with careful sources given")


def _corpus():
    """ids partitioned by planted class (see asserts)."""
    rows = []

    def add(i, text, url=None):
        rows.append((i, text, url or f"https://h{i % 7}.example/d{i}"))

    # 0-39: clean English base docs — each tail is mostly doc-unique so
    # base docs do NOT near-dup-match each other (trigram Jaccard ≈ 0.3)
    def base_text(i):
        tail = " ".join(f"token{i}x{j}" for j in range(15))
        return f"{_EN} {tail}"

    for i in range(40):
        add(i, base_text(i))
    # 40-44: German → language stage
    for i in range(40, 45):
        add(i, "der hund und die katze das haus ist nicht mit einem von zu "
               "der die das und ist nicht mit ein von zu der die das und ist")
    # 45-49: too short → quality stage
    for i in range(45, 50):
        add(i, "tiny doc")
    # 50-54: one line repeated → repetition stage
    for i in range(50, 55):
        add(i, ("the cat sat on the mat and looked around slowly\n" * 15))
    # 55-57: exact duplicates of doc 0..2 → exact dedup keeps the smaller id
    for i in range(55, 58):
        add(i, base_text(i - 55))
    # 58-60: near-duplicates of docs 3..5 → minhash keeps the smaller id
    for i in range(58, 61):
        add(i, base_text(i - 55) + " slightly changed")
    # 61-62: contain the benchmark 13-gram → decontaminate
    bench = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu")
    for i in range(61, 63):
        add(i, f"{_EN} and then the benchmark text {bench} appears inside")
    # 63-64: carry an email → survive, scrubbed
    for i in range(63, 65):
        tail = " ".join(f"mail{i}y{j}" for j in range(12))
        add(i, f"{_EN} {tail} contact us at someone{i}@example.com today")
    # 65-69: blocked host → blocklist stage
    for i in range(65, 70):
        add(i, f"{_EN} hosted on a blocked domain variant {i}",
            url=f"https://ads.blocked.example/d{i}")
    ids, texts, urls = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "url": pa.array(urls, pa.string()),
        }
    ), bench


def test_curate_full_flow(ray_session):
    import ray.data

    tbl, bench = _corpus()
    bench_ds = ray.data.from_arrow(
        pa.table({"text": pa.array([f"question: {bench} answer: yes"])})
    )
    cfg = CurationConfig(
        blocklist=["blocked.example"],
        benchmark_texts=bench_ds,
        minhash_kwargs={"batch_size": 64},
    )
    res = curate(
        ray.data.from_arrow(tbl).repartition(5),
        url_col="url", config=cfg, report=True,
    )
    assert isinstance(res, CurationResult)
    out = {r["doc_id"]: r for r in res.dataset.take_all()}
    survivors = set(out)

    assert survivors & set(range(40)) == set(range(40)) - set()  # base kept
    assert not survivors & set(range(40, 45))   # German dropped
    assert not survivors & set(range(45, 50))   # short dropped
    assert not survivors & set(range(50, 55))   # repetitive dropped
    assert not survivors & set(range(55, 58))   # exact dups dropped (0-2 kept)
    assert not survivors & set(range(58, 61))   # near dups dropped (3-5 kept)
    assert not survivors & set(range(61, 63))   # contaminated dropped
    assert survivors & {63, 64} == {63, 64}     # email docs kept...
    assert "[EMAIL]" in out[63]["text"] or "@" not in out[63]["text"]
    assert not survivors & set(range(65, 70))   # blocked hosts dropped

    # report: monotone non-increasing, all stages present
    order = ["input", "blocklist", "language", "quality", "repetition",
             "exact_dedup", "minhash_dedup", "decontaminate", "pii_scrub"]
    assert list(res.report) == order
    counts = list(res.report.values())
    assert counts == sorted(counts, reverse=True)
    assert res.report["input"] == 70 and res.report["pii_scrub"] == len(survivors)
    # schema unchanged (no classifier configured)
    assert set(res.dataset.schema().names) == {"doc_id", "text", "url"}


def test_curate_line_dedup_stage(ray_session):
    """line_dedup=True strips corpus-wide boilerplate lines before the
    whole-doc dedup stages, and reports its stage count."""
    import ray.data

    boiler = "subscribe to the newsletter for updates every single week"
    rows = []
    for i in range(12):
        tail = " ".join(f"token{i}x{j}" for j in range(15))
        rows.append((i, f"{_EN} {tail}\n{boiler}"))
    rows.append((12, f"{_EN} solo doc without the chrome line at all"))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray([r[0] for r in rows], np.int64)),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    cfg = CurationConfig(line_dedup=True, minhash_kwargs={"batch_size": 64})
    res = curate(ray.data.from_arrow(tbl).repartition(3), config=cfg,
                 report=True)
    out = {r["doc_id"]: r["text"] for r in res.dataset.take_all()}
    assert boiler not in "\n".join(out.values())
    assert set(out) == set(range(13))  # unique prose all survives
    assert "line_dedup" in res.report
    assert res.report["line_dedup"] == 13


def test_curate_classifier_and_resample(ray_session):
    import ray.data

    from changesetmd_ray.text.classifier import train_classifier

    tbl, _ = _corpus()
    model = train_classifier(
        [f"{_EN} pos {i}" for i in range(20)],
        ["spam click buy now free " * 4 for _ in range(20)],
        n_buckets=1 << 12,
    )
    cfg = CurationConfig(
        langs=None, quality_rule=False, repetition=False, minhash=False,
        pii_scrub=False, classifier_model=model, classifier_threshold=0.5,
        resample_power=0.5,
    )
    res = curate(ray.data.from_arrow(tbl), config=cfg, report=True)
    rows = res.dataset.take_all()
    assert rows and all("quality_prob" in r for r in rows)
    assert all(r["quality_prob"] >= 0.5 for r in rows)
    assert list(res.report) == ["input", "classifier", "exact_dedup", "resample"]


def test_curate_span_dedup_stage(ray_session):
    """span_dedup=True cuts a corpus-wide duplicated passage out of
    its carriers before whole-doc dedup."""
    import ray.data

    passage = ("licensed under creative commons attribution share alike "
               "terms no warranty expressed or implied whatsoever in any "
               "jurisdiction worldwide forever and ever amen")
    rows = []
    for i in range(8):
        tail = " ".join(f"tok{i}q{j}" for j in range(18))
        rows.append((i, f"{_EN} {tail} {passage} {_EN} {tail} end{i}"))
    rows.append((8, f"{_EN} a document with no quoted block at all here"))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray([r[0] for r in rows], np.int64)),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    cfg = CurationConfig(
        span_dedup=True, span_dedup_kwargs={"w": 8, "winnow_k": 4},
        quality_rule=False, repetition=False, minhash=False, langs=None,
        minhash_kwargs={"batch_size": 64},
    )
    res = curate(ray.data.from_arrow(tbl).repartition(3), config=cfg,
                 report=True)
    out = {r["doc_id"]: r["text"] for r in res.dataset.take_all()}
    assert set(out) == set(range(9))
    for i in range(8):
        assert "no warranty expressed or implied" not in out[i]
        assert f"end{i}" in out[i]  # unique tail survives the cut
    assert "span_dedup" in res.report


def test_curate_lm_perplexity_stage(ray_session):
    """lm_model + lm_max_log2_ppl drops high-perplexity (gibberish)
    docs; score-only mode appends log2_ppl instead."""
    import ray.data

    from changesetmd_ray.text.lm import train_byte_lm

    rng = np.random.default_rng(11)
    fluent = [f"{_EN} extra words {i} for doc variety here" for i in range(20)]
    junk = ["".join(rng.choice(list("zqxjkvw#@%1"), 80)) for _ in range(5)]
    train = ray.data.from_arrow(
        pa.table({"text": pa.array(fluent, pa.string())}))
    model = train_byte_lm(train, n=3, n_buckets=1 << 14)

    rows = [(i, t) for i, t in enumerate(fluent + junk)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray([r[0] for r in rows], np.int64)),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    from changesetmd_ray.text.lm import score_docs

    cut = float(np.max(score_docs(fluent, model))) + 0.5
    cfg = CurationConfig(
        lm_model=model, lm_max_log2_ppl=cut,
        quality_rule=False, repetition=False, minhash=False,
        exact_dedup=False, pii_scrub=False, langs=None,
    )
    res = curate(ray.data.from_arrow(tbl).repartition(3), config=cfg,
                 report=True)
    out = sorted(r["doc_id"] for r in res.dataset.take_all())
    assert out == list(range(20))  # gibberish dropped, fluent kept
    assert res.report["lm_filter"] == 20

    # score-only mode appends the column
    cfg2 = CurationConfig(
        lm_model=model, quality_rule=False, repetition=False,
        minhash=False, exact_dedup=False, pii_scrub=False, langs=None,
    )
    res2 = curate(ray.data.from_arrow(tbl), config=cfg2)
    assert "log2_ppl" in res2.dataset.schema().names


def test_curate_validation(ray_session):
    import ray.data

    tbl, _ = _corpus()
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="url_col"):
        curate(ds, config=CurationConfig(domain_cap=5))
    with pytest.raises(ValueError, match="url_col"):
        curate(ds, config=CurationConfig(blocklist=["x.com"]))
    with pytest.raises(ValueError, match="classifier_model"):
        curate(ds, config=CurationConfig(resample_power=1.0))


def test_snapshot_auto_rule_both_regimes():
    """The size-aware "auto" rule (VERDICT r4 item 5), pure paths."""
    import math

    from changesetmd_ray.pipelines.curation import should_snapshot

    gib = 1024**3
    # small file-backed corpus, roomy store -> snapshot
    assert should_snapshot(1 * gib, 100 * gib)
    # corpus x decompression exceeds the store fraction -> stream
    assert not should_snapshot(40 * gib, 100 * gib)
    # boundary: 3x decompression vs 0.5 store fraction
    assert should_snapshot(16 * gib, 96 * gib)      # 48 <= 48
    assert not should_snapshot(17 * gib, 96 * gib)  # 51 > 48
    # non-file source (rows already store-resident) -> snapshot
    assert should_snapshot(None, 100 * gib)
    assert should_snapshot(None, None)
    # file-backed but unsizable (remote URIs) -> assume big -> stream
    assert not should_snapshot(math.inf, 100 * gib)
    # unknown store capacity for a file-backed source -> stream
    assert not should_snapshot(1 * gib, None)


def test_snapshot_auto_estimation(ray_session, tmp_path):
    """estimate_input_bytes + _resolve_snapshot over real datasets."""
    import math

    import pyarrow.parquet as pq
    import ray.data

    from changesetmd_ray.pipelines.curation import (
        _resolve_snapshot,
        estimate_input_bytes,
    )

    tbl, _ = _corpus()
    # non-file source: no input files -> None -> auto snapshots
    mem_ds = ray.data.from_arrow(tbl)
    assert estimate_input_bytes(mem_ds) is None
    assert _resolve_snapshot(mem_ds, "auto") is True

    # file-backed source: estimate == on-disk bytes, tiny -> snapshots
    path = tmp_path / "docs.parquet"
    pq.write_table(tbl, path)
    file_ds = ray.data.read_parquet(str(path))
    est = estimate_input_bytes(file_ds)
    assert est == float(path.stat().st_size)
    assert _resolve_snapshot(file_ds, "auto") is True

    # estimate survives downstream map transforms (lineage-tracked)
    mapped = file_ds.map_batches(lambda b: b, batch_format="pyarrow")
    assert estimate_input_bytes(mapped) in (est, None)

    # explicit knobs pass through; junk rejected
    assert _resolve_snapshot(file_ds, True) is True
    assert _resolve_snapshot(file_ds, False) is False
    with pytest.raises(ValueError, match="auto"):
        _resolve_snapshot(file_ds, "sometimes")


def test_curate_url_dedup_stage(ray_session):
    """Canonical-URL recrawl dedup as the first curation stage: rows
    differing only by tracking params / default port / fragment
    collapse to the lowest doc_id before any text stage runs."""
    import ray.data

    body = ("The survey ship logged tide heights and salinity readings "
            "near the harbor every single morning during the season %d.")
    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array([body % i for i in range(6)], pa.string()),
            "url": pa.array([
                "http://a.com/article?id=1",
                "HTTP://A.com:80/article?id=1&utm_source=feed#top",  # recrawl of 0
                "http://a.com/article?id=2",
                "https://b.org/page",
                "https://b.org/page?fbclid=xyz",                     # recrawl of 3
                "https://c.net/",
            ]),
        }
    )
    cfg = CurationConfig(url_dedup=True, quality_rule=False, repetition=False,
                         minhash=False, pii_scrub=False, langs=None)
    res = curate(ray.data.from_arrow(t).repartition(3), url_col="url",
                 config=cfg, report=True)
    assert sorted(r["doc_id"] for r in res.dataset.take_all()) == [0, 2, 3, 5]
    assert res.report["url_dedup"] == 4
    with pytest.raises(ValueError):
        curate(ray.data.from_arrow(t), config=CurationConfig(url_dedup=True))


def test_curate_semdedup_catches_reordered_neardup(ray_session):
    """The MinHash-blind spot: a SENTENCE-REORDERED copy shares almost
    no 3-gram shingles (order-sensitive) but nearly all tokens — the
    opt-in SemDeDup stage must drop it where MinHash alone keeps it."""
    import ray.data

    sents = [
        "the harbor council funds small research stations along the coast",
        "volunteers maintain the older lighthouses through every winter",
        "trade records from the archive describe cargo manifests in detail",
        "modern ferries follow the same channels past the shoals at night",
        "fishing crews report seasonal changes in water temperature daily",
    ]
    original = " ".join(sents)
    reordered = " ".join(sents[::-1])
    unrelated = ("quarterly revenue grew while the finance committee "
                 "debated currency hedging strategies and capital limits "
                 "for the upcoming fiscal review cycle this autumn")
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([original, reordered, unrelated], pa.string()),
        }
    )
    base_cfg = dict(langs=None, quality_rule=False, repetition=False,
                    pii_scrub=False, exact_dedup=False)
    ds = ray.data.from_arrow(t).repartition(2)

    # MinHash alone keeps all three (shingle overlap is tiny)
    res_mh = curate(ds, config=CurationConfig(**base_cfg), report=True)
    assert sorted(r["doc_id"] for r in res_mh.dataset.take_all()) == [1, 2, 3]

    # SemDeDup drops exactly one of the reordered pair
    res_sd = curate(ds, config=CurationConfig(
        **base_cfg, semdedup_threshold=0.9,
        semdedup_kwargs={"n_clusters": 1, "train_size": 8}), report=True)
    ids = sorted(r["doc_id"] for r in res_sd.dataset.take_all())
    assert 3 in ids and len({1, 2} & set(ids)) == 1
    assert res_sd.report["semdedup"] == 2
