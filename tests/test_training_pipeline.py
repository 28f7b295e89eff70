"""End-to-end training-data pipeline: the composition a 100-TB corpus
run would execute, chained over the real sf0.001 fixtures —

    read → exact_dedup → quality filter → repetition filter →
    decontaminate → mix_corpora → split_export(train/val) → read_export

Each operator is unit-tested on its own; this test pins the seams:
schemas survive every hop, dedup's winners feed the mixer, split
outputs stay disjoint, and the final shards are layout-deterministic.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_full_training_pipeline(ray_session, tmp_path):
    import ray.data

    from changesetmd_ray.stages.export import mix_corpora, read_export, split_export
    from changesetmd_ray.text.analysis import quality_features
    from changesetmd_ray.text.dedup import exact_dedup

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    n_raw = docs.count()

    deduped = exact_dedup(docs, key_col="text", id_col="doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_raw

    scored = deduped.map_batches(quality_features, batch_format="pyarrow")
    kept = scored.filter(expr="n_tokens_ws >= 5").materialize()
    n_kept = kept.count()
    assert 0 < n_kept <= n_dedup

    # Gopher repetition rule: the fixture docs are clean prose, so the
    # filter must be a (verified) no-op here — the spam-dropping
    # behavior is pinned in tests/test_text_filters.py
    from changesetmd_ray.text.repetition import repetition_filter

    kept = repetition_filter(kept).materialize()
    n_rep = kept.count()
    assert 0 < n_rep <= n_kept

    # benchmark decontamination: plant 3 of the corpus docs as the
    # "eval set" — exactly those plus any doc genuinely sharing a
    # 13-gram with them must drop, nothing else (exact driver-side
    # oracle over the tiny fixture; some fixture docs share template
    # sentences, so the overlap set is not always empty)
    import ray as _ray

    from changesetmd_ray.text.bloom import build_ngram_bloom, decontaminate
    from changesetmd_ray.text.hashing import tokenize

    def grams13(t):
        toks = tokenize(t or "")
        if len(toks) < 13:
            return {tuple(toks)} if toks else set()
        return {tuple(toks[i : i + 13]) for i in range(len(toks) - 12)}

    all_rows = kept.select_columns(["doc_id", "text"]).take_all()
    bench = kept.limit(3).materialize()
    bench_rows = bench.select_columns(["doc_id", "text"]).take_all()
    bench_ids = {r["doc_id"] for r in bench_rows}
    bench_grams = set().union(*(grams13(r["text"]) for r in bench_rows))
    contaminated = bench_ids | {
        r["doc_id"] for r in all_rows if grams13(r["text"]) & bench_grams
    }
    bloom = build_ngram_bloom(bench, n=13, m_bits=1 << 18)
    kept = decontaminate(kept, _ray.put(bloom), n=13).materialize()
    surv_ids = {r["doc_id"] for r in kept.select_columns(["doc_id"]).take_all()}
    assert surv_ids == {r["doc_id"] for r in all_rows} - contaminated

    major = kept.filter(expr="lang == 'en'").materialize()
    rest = kept.filter(expr="lang != 'en'").materialize()
    mixed, plan = mix_corpora(
        {"en": major, "other": rest}, {"en": 0.6, "other": 0.4}, id_col="doc_id", seed=13
    )
    assert set(plan) == {"en", "other"}

    res = split_export(
        mixed.materialize(),
        str(tmp_path / "out"),
        id_col="doc_id",
        fractions={"train": 0.9, "val": 0.1},
        seed=13,
        num_shards=4,
    )
    n_train = sum(res["train"]["rows"].to_pylist())
    n_val = sum(res["val"]["rows"].to_pylist())
    assert n_train + n_val == mixed.count()
    assert n_train > n_val

    train = read_export(str(tmp_path / "out" / "train"))
    cols = set(train.schema().names)
    assert {"doc_id", "text", "lang", "source"} <= cols  # schema survived
    tr_ids = {r["doc_id"] for r in train.select_columns(["doc_id"]).take_all()}
    va_ids = {
        r["doc_id"]
        for r in read_export(str(tmp_path / "out" / "val"))
        .select_columns(["doc_id"])
        .take_all()
    }
    assert not (tr_ids & va_ids)  # no leakage

    # shard files exist and are the resume units
    files = glob.glob(str(tmp_path / "out" / "train" / "shard-*.parquet"))
    assert files and sum(len(pq.read_table(f)) for f in files) == n_train


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_training_pipeline_pack_and_mix_export(ray_session, tmp_path):
    """Round-4 tail of the pipeline: the fused single-shuffle
    mix_export and a sequence-packing plan over the exported shards —
    the hand-off a trainer actually consumes."""
    import ray.data

    from changesetmd_ray.stages.export import mix_export, read_export
    from changesetmd_ray.stages.packing import pack_sequences
    from changesetmd_ray.text.analysis import quality_features
    from changesetmd_ray.text.dedup import exact_dedup

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    kept = (
        exact_dedup(docs, key_col="text", id_col="doc_id")
        .map_batches(quality_features, batch_format="pyarrow")
        .filter(expr="n_tokens_ws >= 5")
        .materialize()
    )
    major = kept.filter(expr="lang == 'en'").materialize()
    rest = kept.filter(expr="lang != 'en'").materialize()
    manifest, plan = mix_export(
        {"en": major, "other": rest}, {"en": 0.6, "other": 0.4},
        str(tmp_path / "mix"), id_col="doc_id", seed=13, num_shards=4,
        counts={"en": major.count(), "other": rest.count()},
    )
    total = sum(manifest["rows"].to_pylist())
    assert total > 0

    exported = read_export(str(tmp_path / "mix"))
    packed = pack_sequences(
        exported.map_batches(quality_features, batch_format="pyarrow"),
        id_col="doc_id", len_col="n_tokens_ws", max_tokens=256, num_shards=4,
    )
    rows = packed.take_all()
    assert len(rows) == total  # every exported doc planned exactly once
    seq_tot: dict[tuple, int] = {}
    seq_n: dict[tuple, int] = {}
    for r in rows:
        key = (r["shard"], r["seq"])
        seq_tot[key] = seq_tot.get(key, 0) + r["n_tokens"]
        seq_n[key] = seq_n.get(key, 0) + 1
    assert all(t <= 256 or seq_n[k] == 1 for k, t in seq_tot.items())
