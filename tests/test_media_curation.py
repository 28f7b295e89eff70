"""Media curation recipe e2e (pipelines/media_curation.py): planted
artifact per stage — byte-dup BMP, blurry image, blank image,
JPEG-recompressed near-dup, shifted audio re-encode — each dies at
exactly its stage; clean rows survive."""

import numpy as np
import pyarrow as pa

import ray
from changesetmd_ray.pipelines.media_curation import (
    MediaCurationConfig,
    MediaCurationResult,
    curate_media,
)
from changesetmd_ray.stages.codecs import bmp_encode, wav_encode
from changesetmd_ray.stages.jpeg import jpeg_encode

RATE = 8000


def _photo(seed: int, noise: float = 25.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    img = np.zeros((96, 128, 3))
    for c in range(3):
        fy, fx = rng.uniform(0.5, 3.0, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        img[..., c] = 128 + 80 * np.sin(2 * np.pi * fy * yy / 96 + py) * np.cos(
            2 * np.pi * fx * xx / 128 + px)
    img += rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _chirp(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    seg, n = 1000, 16000
    out = np.zeros(n)
    t = np.arange(seg) / RATE
    for s in range(0, n - seg + 1, seg):
        out[s:s + seg] = np.sin(2 * np.pi * rng.uniform(200, 3500) * t)
    return (12000 * out).astype(np.int16)


def test_curate_media_full_flow(ray_session):
    img_a = _photo(1)
    img_b = _photo(2)
    near_b = np.clip(img_b.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    blurry = np.full((64, 64, 3), 128, np.uint8)  # blank: zero sharpness/entropy
    clip_a = _chirp(10)
    rng = np.random.default_rng(3)
    shifted = np.concatenate(
        [np.zeros(RATE // 4, np.int16),
         (0.7 * clip_a + rng.normal(0, 120, len(clip_a))).astype(np.int16)])

    rows = [
        (1, "image", bmp_encode(img_a)),          # survives
        (2, "image", bmp_encode(img_a)),          # byte dup of 1 → exact
        (3, "image", bmp_encode(img_b)),          # survives (cluster rep)
        (4, "image", jpeg_encode(near_b, quality=90)),  # near-dup of 3
        (5, "image", bmp_encode(blurry)),         # dies at quality
        (6, "audio", wav_encode(clip_a, RATE)),   # survives (cluster rep)
        (7, "audio", wav_encode(shifted, RATE)),  # audio near-dup of 6
        (8, "audio", wav_encode(_chirp(77), RATE)),  # survives
        (9, "video", b"VID1" + bytes(8)),         # passes every stage
    ]
    t = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "media_type": pa.array([r[1] for r in rows]),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    res = curate_media(ray.data.from_arrow(t).repartition(3), report=True)
    assert isinstance(res, MediaCurationResult)
    ids = sorted(r["media_id"] for r in res.dataset.take_all())
    assert ids == [1, 3, 6, 8, 9]
    r = res.report
    assert r["input"] == 9
    assert r["exact_dedup"] == 8        # row 2 died
    assert r["quality"] == 7            # row 5 died
    assert r["image_neardup"] == 6      # row 4 died
    assert r["audio_neardup"] == 5      # row 7 died


def test_curate_media_stages_opt_out(ray_session):
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "image"]),
            "payload": pa.array([bmp_encode(_photo(5))] * 2, pa.binary()),
        }
    )
    cfg = MediaCurationConfig(exact_dedup=False, quality_filter=False,
                              image_neardup=False, audio_neardup=False)
    res = curate_media(ray.data.from_arrow(t), config=cfg, report=True)
    assert sorted(r["media_id"] for r in res.dataset.take_all()) == [1, 2]
