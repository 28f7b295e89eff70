"""End-to-end corpus curation recipe — the FineWeb/RefinedWeb-shaped
composition of the engine's hygiene operators into ONE configurable
flow (north_rule capstone; every stage is an existing, individually
tested operator):

    unicode normalize (optional) → blocklist → canonical-URL recrawl
    dedup (optional) → language → Gopher quality rule → Gopher
    repetition
    → classifier score/threshold → LM perplexity score/cut (optional)
    → corpus-wide line dedup (optional) → exact-substring span
    dedup (optional)
    → exact dedup → MinHash cluster dedup → SemDeDup (optional —
    BoW-cosine semantic dedup; catches sentence-REORDERED near-dups
    shingle MinHash is blind to) → benchmark decontamination
    → per-domain cap → PII scrub → (optional) score-weighted
    resampling

Scale shape: the map-only stages (blocklist, language, quality,
repetition, classifier, decontaminate probe, PII, resample) FUSE into
the streaming pass; the shuffling stages (exact dedup, MinHash, cap)
each move only thin projections — keys, band pairs, (host, hash) —
never the text payload (see each operator's own docstring). With
``report=False`` (the 100-TB setting) nothing materializes until the
sink; ``report=True`` materializes after every stage to record
retention counts — a debugging/audit mode, priced accordingly.

Output schema = input schema, plus ``quality_prob`` when a classifier
is configured and ``log2_ppl`` when an LM model is configured
score-only (stage helper columns are dropped in-stage).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from changesetmd_ray.text.analysis import LangId, quality_features

# stage salt for the resample hash stream (see _key_hash32's coupling
# note) — any fixed value distinct from other consumers of id_col works
RESAMPLE_SALT = 0x52534D50  # "RSMP"


@dataclass
class CurationConfig:
    """Stage knobs; ``None``/``False`` skips a stage entirely."""

    normalize_text: bool = False           # unicode NFC + control strip
    normalize_kwargs: dict = field(default_factory=dict)
    blocklist: list | None = None          # blocked host suffixes
    url_dedup: bool = False                # canonical-URL recrawl dedup (needs url_col)
    langs: tuple | None = ("en",)          # allowed languages (None = keep all)
    quality_rule: bool = True              # Gopher-style quality_ok cut
    repetition: bool = True                # Gopher repetition rule
    classifier_model: object | None = None  # HashedNgramModel
    classifier_threshold: float | None = None  # None = score only, no cut
    lm_model: object | None = None          # ByteLmModel (CCNet ppl cut)
    lm_max_log2_ppl: float | None = None    # None = score only, no cut
    line_dedup: bool = False              # corpus-wide line/paragraph dedup
    line_dedup_kwargs: dict = field(default_factory=dict)
    span_dedup: bool = False              # exact-substring (span) dedup
    span_dedup_kwargs: dict = field(default_factory=dict)
    exact_dedup: bool = True
    minhash: bool = True
    minhash_threshold: float = 0.8
    minhash_kwargs: dict = field(default_factory=dict)
    semdedup_threshold: float | None = None  # BoW-cosine semantic dedup
    semdedup_kwargs: dict = field(default_factory=dict)
    semdedup_embed_kwargs: dict = field(default_factory=dict)
    benchmark_texts: object | None = None  # Dataset with text_col → decontaminate
    contam_ngram: int = 13
    domain_cap: int | None = None          # needs url_col
    pii_scrub: bool = True
    resample_power: float | None = None    # needs classifier_model
    # The dedup stages are MULTI-PASS consumers (exact-dedup keys,
    # MinHash bands, MinHash verify each execute their input's
    # lineage once). Snapshotting the filtered corpus to the object
    # store first makes those passes re-read cached blocks instead of
    # re-running the Python-heavy filter chain 3-4× (measured 18.5 s
    # -> 4.5 s at sf0.1). But at the 100-TB setting the snapshot is
    # ~the corpus and re-executing the map-only filters is cheaper
    # than spilling it, so the default is SIZE-AWARE: "auto" snapshots
    # only when the estimated in-memory corpus (on-disk input bytes ×
    # a decompression factor) fits in a fraction of the object store,
    # and always for non-file sources (from_items/from_arrow rows are
    # already store-resident). True/False force either regime.
    snapshot_before_dedup: bool | str = "auto"


# Auto-snapshot sizing: parquet compresses web text ~3x vs its
# in-memory Arrow footprint, and the snapshot must leave room for the
# dedup exchanges themselves, so snapshot only while the estimated
# corpus stays under half the store (spill covers mis-estimates; the
# rule just avoids CHOOSING to spill ~the corpus).
SNAPSHOT_DECOMPRESSION_FACTOR = 3.0
SNAPSHOT_STORE_FRACTION = 0.5


def estimate_input_bytes(ds) -> float | None:
    """On-disk bytes feeding ``ds``'s lineage. ``None`` = not
    file-backed (from_items / from_arrow — the rows already live in
    the object store); ``inf`` = file-backed but unsizable locally
    (remote URIs), which the auto rule treats as too big to snapshot.
    Never executes the dataset."""
    import math
    import os

    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        try:
            total += os.path.getsize(f)
        except OSError:
            return math.inf
    return float(total)


def should_snapshot(
    est_input_bytes: float | None,
    store_capacity: float | None,
    *,
    decompression: float = SNAPSHOT_DECOMPRESSION_FACTOR,
    fraction: float = SNAPSHOT_STORE_FRACTION,
) -> bool:
    """The ``snapshot_before_dedup="auto"`` rule (pure, unit-tested)."""
    if est_input_bytes is None:
        return True
    if not store_capacity:
        return False
    return est_input_bytes * decompression <= store_capacity * fraction


def _resolve_snapshot(ds, knob) -> bool:
    if knob is True or knob is False:
        return knob
    if knob != "auto":
        raise ValueError(
            f"snapshot_before_dedup must be True, False or 'auto', got {knob!r}")
    import ray

    capacity = ray.cluster_resources().get("object_store_memory") \
        if ray.is_initialized() else None
    return should_snapshot(estimate_input_bytes(ds), capacity)


@dataclass
class CurationResult:
    dataset: object                         # the curated ray.data.Dataset
    report: dict                            # stage → rows remaining (report=True)


def curate(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    lang_col: str | None = None,
    config: CurationConfig | None = None,
    report: bool = False,
):
    """Run the configured curation flow over ``ds``. ``lang_col``
    reuses an existing language column; otherwise the n-gram LangId
    stage predicts one in-flight. ``report=True`` materializes stage
    boundaries and returns per-stage retention counts (audit mode —
    each count is a full execution barrier)."""
    cfg = config or CurationConfig()
    if cfg.domain_cap is not None and url_col is None:
        raise ValueError("domain_cap requires url_col")
    if cfg.blocklist is not None and url_col is None:
        raise ValueError("blocklist requires url_col")
    if cfg.url_dedup and url_col is None:
        raise ValueError("url_dedup requires url_col")
    if cfg.resample_power is not None and cfg.classifier_model is None:
        raise ValueError("resample_power requires classifier_model")

    stages: dict = {}

    def checkpoint(name: str, d):
        if report:
            d = d.materialize()
            stages[name] = d.count()
        return d

    stages["input"] = ds.count() if report else None

    if cfg.normalize_text:
        from changesetmd_ray.text.normalize import normalize_text

        ds = checkpoint("normalize", normalize_text(
            ds, text_col=text_col, **cfg.normalize_kwargs))

    if cfg.blocklist is not None:
        from changesetmd_ray.text.domains import blocklist_filter

        ds = checkpoint("blocklist", blocklist_filter(
            ds, cfg.blocklist, url_col=url_col))

    if cfg.url_dedup:
        from changesetmd_ray.text.domains import url_dedup as _url_dedup

        ds = checkpoint("url_dedup", _url_dedup(
            ds, url_col=url_col, id_col=id_col))

    if cfg.langs is not None:
        allowed = pa.array(sorted(set(cfg.langs)), pa.string())
        if lang_col is not None:
            def lang_keep(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                keep = pc.is_in(batch[lang_col], value_set=allowed)
                return batch.filter(keep.fill_null(False))

            ds = checkpoint("language", ds.map_batches(
                lang_keep, batch_format="pyarrow"))
        else:
            stage = LangId(text_col=text_col)

            def lang_pred_keep(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                out = stage(batch)
                keep = pc.is_in(out["lang_pred"], value_set=allowed)
                return out.filter(keep.fill_null(False)).select(
                    batch.schema.names)

            ds = checkpoint("language", ds.map_batches(
                lang_pred_keep, batch_format="pyarrow"))

    if cfg.quality_rule:
        def quality_keep(batch: pa.Table) -> pa.Table:
            feat = quality_features(batch, text_col=text_col)
            return feat.filter(feat["quality_ok"]).select(batch.schema.names)

        ds = checkpoint("quality", ds.map_batches(
            quality_keep, batch_format="pyarrow"))

    if cfg.repetition:
        from changesetmd_ray.text.repetition import repetition_filter

        ds = checkpoint("repetition", repetition_filter(ds, text_col=text_col))

    if cfg.classifier_model is not None:
        from changesetmd_ray.text.classifier import classifier_score

        ds = classifier_score(ds, cfg.classifier_model, text_col=text_col)
        if cfg.classifier_threshold is not None:
            thr = float(cfg.classifier_threshold)

            def score_keep(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.filter(
                    pc.greater_equal(batch["quality_prob"], thr)
                )

            ds = ds.map_batches(score_keep, batch_format="pyarrow")
        ds = checkpoint("classifier", ds)

    if cfg.lm_model is not None:
        from changesetmd_ray.text.lm import lm_filter, lm_score

        if cfg.lm_max_log2_ppl is not None:
            ds = checkpoint("lm_filter", lm_filter(
                ds, cfg.lm_model, float(cfg.lm_max_log2_ppl),
                text_col=text_col))
        else:
            ds = checkpoint("lm_score", lm_score(
                ds, cfg.lm_model, text_col=text_col))

    multi_pass = [cfg.line_dedup, cfg.span_dedup, cfg.exact_dedup,
                  cfg.minhash]
    snapshot_on = (
        _resolve_snapshot(ds, cfg.snapshot_before_dedup)
        if any(multi_pass) else False
    )
    if snapshot_on:
        ds = ds.materialize()

    def resnapshot(done_idx: int):
        # each *_dedup stage is a multi-pass consumer of its input —
        # snapshot between them so no stage re-executes another's
        # rebuild passes (measured 18.5 s -> 4.5 s at sf0.1)
        return snapshot_on and any(multi_pass[done_idx + 1:])

    if cfg.line_dedup:
        # boilerplate lines removed BEFORE whole-doc dedup: docs that
        # differed only in chrome become identical and dedup away
        from changesetmd_ray.text.linedup import line_dedup

        ds = checkpoint("line_dedup", line_dedup(
            ds, text_col=text_col, id_col=id_col,
            **cfg.line_dedup_kwargs))
        if resnapshot(0):
            ds = ds.materialize()

    if cfg.span_dedup:
        # cut duplicated long spans before whole-doc dedup: docs that
        # shared only a quoted block keep their unique remainder
        from changesetmd_ray.text.spandup import span_dedup

        ds = checkpoint("span_dedup", span_dedup(
            ds, text_col=text_col, id_col=id_col,
            **cfg.span_dedup_kwargs))
        if resnapshot(1):
            ds = ds.materialize()

    if cfg.exact_dedup:
        from changesetmd_ray.text.dedup import exact_dedup

        ds = checkpoint("exact_dedup", exact_dedup(
            ds, key_col=text_col, id_col=id_col))

    if cfg.minhash:
        from changesetmd_ray.joins.broadcast import anti_join
        from changesetmd_ray.text.dedup import (
            duplicate_clusters_dataset,
            minhash_lsh_candidates,
        )

        pairs = minhash_lsh_candidates(
            ds, text_col=text_col, id_col=id_col,
            threshold=cfg.minhash_threshold, **cfg.minhash_kwargs,
        )
        clusters = duplicate_clusters_dataset(pairs)

        def losers_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.not_equal(batch["doc_id"], batch["rep_id"])
            return pa.table({id_col: batch.filter(keep)["doc_id"]})

        losers = clusters.map_batches(losers_only, batch_format="pyarrow")
        ds = checkpoint("minhash_dedup", anti_join(
            ds, losers, big_on=id_col, small_on=id_col))

    if cfg.semdedup_threshold is not None:
        # semantic (BoW-cosine) dedup catches what shingle MinHash
        # can't: SENTENCE-REORDERED near-dups share tokens but few
        # shingles. Embeds in-flight with the hashed-JL encoder (swap a
        # neural encoder at the same stage boundary), then the
        # cluster-bucketed SemDeDup sweep; only (id, embedding) rides
        # the exchange.
        from changesetmd_ray.text.embed import embed_documents
        from changesetmd_ray.text.semdedup import semdedup_decisions

        emb = embed_documents(
            ds.select_columns([id_col, text_col]),
            **cfg.semdedup_embed_kwargs)
        decisions = semdedup_decisions(
            emb, threshold=cfg.semdedup_threshold, id_col=id_col,
            **cfg.semdedup_kwargs)

        def sem_losers(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            dropped = batch.filter(pc.equal(batch["keep"], False))
            return pa.table({id_col: dropped[id_col]})

        from changesetmd_ray.joins.broadcast import anti_join as _aj

        ds = checkpoint("semdedup", _aj(
            ds, decisions.map_batches(sem_losers, batch_format="pyarrow"),
            big_on=id_col, small_on=id_col))

    if cfg.benchmark_texts is not None:
        import ray

        from changesetmd_ray.text.bloom import build_ngram_bloom, decontaminate

        bloom = build_ngram_bloom(
            cfg.benchmark_texts, text_col=text_col, n=cfg.contam_ngram)
        # decontaminate's default (keep_contaminated=False) already
        # drops flagged rows AND its contam_* working columns — no
        # re-select (and no schema() execution barrier) needed here
        ds = checkpoint("decontaminate", decontaminate(
            ds, ray.put(bloom), text_col=text_col, n=cfg.contam_ngram))

    if cfg.domain_cap is not None:
        from changesetmd_ray.text.domains import domain_cap

        ds = checkpoint("domain_cap", domain_cap(
            ds, key_col=id_col, url_col=url_col,
            max_per_host=cfg.domain_cap))

    if cfg.pii_scrub:
        from changesetmd_ray.text.pii import scrub_pii

        ds = checkpoint("pii_scrub", scrub_pii(ds, text_col=text_col))

    if cfg.resample_power is not None:
        from changesetmd_ray.stages.sample import weighted_sample

        # salted stream: domain_cap keeps the per-host LOWEST
        # hash32(id) rows, so an unsalted resample on the same id
        # stream would keep essentially every capped-domain survivor
        # regardless of quality_prob (stages/sample.py::_key_hash32)
        ds = checkpoint("resample", weighted_sample(
            ds, key_col=id_col, weight_col="quality_prob",
            power=cfg.resample_power, salt=RESAMPLE_SALT))

    return CurationResult(dataset=ds, report=stages)
