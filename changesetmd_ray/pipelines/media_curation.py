"""End-to-end MEDIA curation recipe — the multimodal counterpart of
``pipelines/curation.py::curate`` (text). One configurable flow over a
media table ``(media_id, media_type, payload)``:

1. **exact payload dedup** — 64-bit content hash
   (``stages/multimodal.py::media_metadata``), keep-first via the
   payload-never-shuffles exact dedup;
2. **image quality filter** — drop blurry / blank / extreme-brightness
   images (``stages/media_fp.py::ImageQuality`` thresholds; non-image
   rows pass);
3. **image near-dup dedup** — pHash → banded Hamming pairs →
   connected components → keep each cluster's min id (recompressed /
   brightness-shifted / resized copies collapse);
4. **audio near-dup dedup** — constellation landmarks with alignment
   verification (shifted / attenuated / noisy re-encodes collapse).

Every stage is opt-out via :class:`MediaCurationConfig`; ``report=True``
materializes stage boundaries and returns per-stage retention counts
(audit mode, each count a full barrier — same contract as the text
recipe).

Scale shape: the payload crosses each dedup decision as a thin
projection only (hashes / fingerprints / landmark tuples); drop
decisions come back to the payload stream through the size-gated
membership join. Pair lists ride ``duplicate_clusters`` below the
``cluster_dataset_limit`` and the distributed min-label propagation
above it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class MediaCurationConfig:
    """Stage knobs; ``None``/``False`` skips a stage entirely."""

    exact_dedup: bool = True
    quality_filter: bool = True
    min_sharpness: float = 1.0        # Laplacian variance floor
    brightness_range: tuple = (0.02, 0.98)
    min_entropy: float = 1.0          # bits; blank fills score ~0
    image_neardup: bool = True
    phash_max_hamming: int = 6
    audio_neardup: bool = True
    # all-pairs corpus dedup wants the arity-3 landmark space (hash
    # occupancy ~1 → linear pair stage; see stages/audio_fp.py and the
    # BASELINE scale-law measurement); arity 2 is the query/index shape
    audio_landmark_arity: int = 3
    audio_min_matches: int = 100
    strict_decode: bool = True
    cluster_dataset_limit: int = 2_000_000  # pairs; above → distributed CC


@dataclass
class MediaCurationResult:
    dataset: object
    report: dict


def _drop_ids(ds, drop_ids_table: pa.Table, *, id_col: str):
    import ray.data

    from changesetmd_ray.joins.broadcast import anti_join

    return anti_join(ds, ray.data.from_arrow(drop_ids_table),
                     big_on=id_col, small_on=id_col)


def _cluster_losers(pairs, *, limit: int) -> pa.Table:
    """Near-dup pairs → (id) table of every non-representative member
    (cluster rep = min id survives)."""
    from changesetmd_ray.text.dedup import (
        duplicate_clusters,
        duplicate_clusters_dataset,
    )

    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table({"media_id": pa.array([], pa.int64())})
    if n_pairs <= limit:
        rows = pairs.select_columns(["id_a", "id_b"]).take_all()
        cl = duplicate_clusters(pa.table(
            {"id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
             "id_b": pa.array([r["id_b"] for r in rows], pa.int64())}))
    else:
        cl = pa.concat_tables(
            [pa.table(b) for b in duplicate_clusters_dataset(
                pairs).iter_batches(batch_format="pyarrow")])
    doc = cl["doc_id"].to_numpy(zero_copy_only=False)
    rep = cl["rep_id"].to_numpy(zero_copy_only=False)
    return pa.table({"media_id": pa.array(doc[doc != rep], pa.int64())})


def curate_media(ds, *, id_col: str = "media_id",
                 config: MediaCurationConfig | None = None,
                 report: bool = False) -> MediaCurationResult:
    """Run the configured media-curation flow (see module docstring)."""
    cfg = config or MediaCurationConfig()
    stages: dict = {}

    def checkpoint(name: str, d):
        if report:
            d = d.materialize()
            stages[name] = d.count()
        return d

    stages["input"] = ds.count() if report else None

    if cfg.exact_dedup:
        from changesetmd_ray.stages.multimodal import media_metadata
        from changesetmd_ray.text.dedup import exact_dedup

        with_hash = ds.map_batches(
            lambda b: media_metadata(b), batch_format="pyarrow")
        deduped = exact_dedup(with_hash, key_col="payload_hash", id_col=id_col)
        ds = checkpoint("exact_dedup", deduped.drop_columns(
            ["payload_bytes", "payload_hash"]))

    # quality + pHash share ONE decode pass (MediaStats — decode is the
    # recipe's dominant cost); the fused columns drive both the quality
    # filter and the near-dup exchange, then drop before output
    if cfg.quality_filter or cfg.image_neardup:
        from changesetmd_ray.stages.media_fp import MediaStats

        stats = MediaStats(strict=cfg.strict_decode)
        ds = ds.map_batches(lambda b: stats(b), batch_format="pyarrow")

    if cfg.quality_filter:
        lo, hi = cfg.brightness_range
        min_sharp, min_ent = cfg.min_sharpness, cfg.min_entropy

        def quality_keep(batch: pa.Table) -> pa.Table:
            sharp = batch["sharpness"]
            ok = pc.and_(
                pc.and_(
                    pc.greater_equal(sharp, min_sharp),
                    pc.greater_equal(batch["entropy"], min_ent)),
                pc.and_(
                    pc.greater_equal(batch["brightness"], lo),
                    pc.less_equal(batch["brightness"], hi)))
            # non-image rows (null stats) pass through untouched
            keep = pc.fill_null(pc.or_(pc.is_null(sharp), ok), True)
            return batch.filter(keep)

        ds = checkpoint("quality", ds.map_batches(
            quality_keep, batch_format="pyarrow"))

    if cfg.image_neardup:
        from changesetmd_ray.text.dedup import hamming_candidates

        def image_fps(batch: pa.Table) -> pa.Table:
            t = batch.select([id_col, "phash"])
            return t.filter(pc.is_valid(t["phash"]))

        pairs = hamming_candidates(
            ds.map_batches(image_fps, batch_format="pyarrow"),
            fp_col="phash", id_col=id_col,
            max_hamming=cfg.phash_max_hamming)
        losers = _cluster_losers(pairs, limit=cfg.cluster_dataset_limit)
        ds = checkpoint("image_neardup", _drop_ids(ds, losers, id_col=id_col))

    if cfg.quality_filter or cfg.image_neardup:
        ds = ds.drop_columns(
            ["phash", "sharpness", "brightness", "contrast", "entropy"])

    if cfg.audio_neardup:
        from changesetmd_ray.stages.audio_fp import audio_neardup_candidates

        pairs = audio_neardup_candidates(
            ds, id_col=id_col, min_matches=cfg.audio_min_matches,
            landmark_arity=cfg.audio_landmark_arity)
        losers = _cluster_losers(pairs, limit=cfg.cluster_dataset_limit)
        ds = checkpoint("audio_neardup", _drop_ids(ds, losers, id_col=id_col))

    return MediaCurationResult(dataset=ds, report=stages)
