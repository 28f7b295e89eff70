"""Perceptual-hash + audio-feature stage tests (stages/media_fp.py).

Planted-pixel fixtures through the REAL codecs: a base photo-like
image, a brightness-shifted JPEG recompression of it (must land within
the near-dup Hamming radius) and an unrelated image (must not)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
from changesetmd_ray.stages.codecs import bmp_encode, wav_encode
from changesetmd_ray.stages.media_fp import (
    AudioFeatures,
    MediaPHash,
    audio_features,
    box_resize,
    dhash64,
    luma_f64,
    media_neardup_candidates,
    media_phash,
    phash64,
    _dct_mat,
)


def _photo(seed: int, h: int = 96, w: int = 128) -> np.ndarray:
    """Deterministic photo-like RGB: smooth low-frequency gradients
    (pHash is a low-frequency sketch; iid noise would be adversarial
    for ANY perceptual hash)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        fy, fx = rng.uniform(0.5, 3.0, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        img[..., c] = 128 + 90 * np.sin(2 * np.pi * fy * yy / h + py) * np.cos(
            2 * np.pi * fx * xx / w + px
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def _hamming(a: np.uint64, b: np.uint64) -> int:
    return bin(int(a) ^ int(b)).count("1")


# ---------------------------------------------------------------- units


def test_dct_mat_orthonormal():
    m = _dct_mat(32)
    np.testing.assert_allclose(m @ m.T, np.eye(32), atol=1e-12)


def test_box_resize_exact_means():
    g = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = box_resize(g, 2, 2)
    expect = np.array([[g[:2, :2].mean(), g[:2, 2:].mean()],
                       [g[2:, :2].mean(), g[2:, 2:].mean()]])
    np.testing.assert_allclose(out, expect)


def test_box_resize_upscales_small_inputs():
    g = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = box_resize(g, 8, 8)
    assert out.shape == (8, 8)
    assert out[0, 0] == 1.0 and out[-1, -1] == 4.0


def test_luma_weights():
    img = np.zeros((1, 1, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    np.testing.assert_allclose(luma_f64(img)[0, 0], 255 * 0.299)


def test_phash_deterministic_and_popcount_balanced():
    img = _photo(1)
    f1, f2 = phash64(img), phash64(img)
    assert f1 == f2
    ones = bin(int(f1)).count("1")
    assert 16 <= ones <= 48  # AC-median split keeps bits balanced


def test_phash_brightness_and_scale_invariance():
    img = _photo(2)
    brighter = np.clip(img.astype(np.int16) + 18, 0, 255).astype(np.uint8)
    from changesetmd_ray.stages.codecs import nn_resize

    smaller = nn_resize(img, 64, 48)
    assert _hamming(phash64(img), phash64(brighter)) <= 4
    assert _hamming(phash64(img), phash64(smaller)) <= 8


def test_phash_jpeg_recompression_stays_close():
    from changesetmd_ray.stages.jpeg import jpeg_decode, jpeg_encode

    img = _photo(3)
    rt = jpeg_decode(jpeg_encode(img))
    assert _hamming(phash64(img), phash64(rt)) <= 6


def test_phash_separates_unrelated_images():
    dists = [
        _hamming(phash64(_photo(s)), phash64(_photo(s + 100)))
        for s in range(4, 10)
    ]
    assert min(dists) > 10  # unrelated low-freq content ≈ 32 ± noise


def test_dhash_gradient_semantics():
    # strictly increasing horizontal ramp → every gradient bit set
    ramp = np.tile(np.linspace(0, 255, 32, dtype=np.uint8)[None, :, None], (32, 1, 3))
    assert dhash64(ramp) == np.uint64(0xFFFFFFFFFFFFFFFF)
    assert dhash64(ramp[:, ::-1]) == np.uint64(0)


# ------------------------------------------------------------- datasets


def _media_table() -> pa.Table:
    base = _photo(42)
    near = np.clip(base.astype(np.int16) + 12, 0, 255).astype(np.uint8)
    other = _photo(7)
    rows = [
        (1, "image", bmp_encode(base)),
        (2, "image", bmp_encode(near)),
        (3, "image", bmp_encode(other)),
        (4, "audio", wav_encode(np.zeros(64, np.int16), 8000)),
    ]
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "media_type": pa.array([r[1] for r in rows]),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
        }
    )


def test_media_phash_stage_nulls_non_images(ray_session):
    out = media_phash(ray.data.from_arrow(_media_table())).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[4]["phash"] is None
    assert all(by_id[i]["phash"] is not None for i in (1, 2, 3))
    assert all("payload" not in r for r in out)


def test_media_neardup_finds_planted_pair_only(ray_session):
    ds = ray.data.from_arrow(_media_table())
    pairs = media_neardup_candidates(ds, max_hamming=6).take_all()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 6


def test_media_phash_strict_raises_on_garbage(ray_session):
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image"]),
            "payload": pa.array([b"not an image"], pa.binary()),
        }
    )
    with pytest.raises(Exception):
        media_phash(ray.data.from_arrow(t), strict=True).take_all()
    out = media_phash(ray.data.from_arrow(t), strict=False).take_all()
    assert out[0]["phash"] is None


# ---------------------------------------------------------------- audio


def test_audio_features_sine():
    rate, freq, n = 8000, 1000, 8000
    t = np.arange(n) / rate
    pcm = (20000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    stage = AudioFeatures()
    rms, zcr, centroid, roll = stage._features(wav_encode(pcm, rate))
    assert abs(rms - (20000 / 32768) / np.sqrt(2)) < 0.01
    assert abs(zcr - 2 * freq / rate) < 0.01
    assert abs(centroid - freq) < 25.0
    assert abs(roll - freq) < 25.0


def test_audio_features_silence_and_nulls(ray_session):
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["audio", "image"]),
            "payload": pa.array(
                [wav_encode(np.zeros(128, np.int16), 16000), b"x"], pa.binary()
            ),
        }
    )
    out = audio_features(ray.data.from_arrow(t)).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["rms"] == 0.0 and by_id[1]["spectral_centroid_hz"] == 0.0
    assert by_id[2]["rms"] is None


def test_hamming_candidates_generic_fp_column(ray_session):
    from changesetmd_ray.text.dedup import hamming_candidates

    fps = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "fp": pa.array(
                [0, 0b111, -1, int(np.uint64(2**64 - 2).view(np.int64))],
                pa.int64(),
            ),
        }
    )
    pairs = hamming_candidates(
        ray.data.from_arrow(fps), max_hamming=3
    ).take_all()
    got = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
    assert got == {(1, 2): 3, (3, 4): 1}


def test_hamming_hot_group_reduction_preserves_components(ray_session):
    """A planted mega-cluster (identical fps) plus satellite near-dups:
    the hot-group reduction must cut the pair LIST but keep connected
    components identical to the full enumeration."""
    from changesetmd_ray.text.dedup import duplicate_clusters, hamming_candidates

    rng = np.random.default_rng(11)
    n_clique, n_bg = 40, 200
    base = np.uint64(0xDEADBEEFCAFEF00D)
    fps = [base] * n_clique                       # identical-fp mega-class
    fps += [base ^ np.uint64(1 << int(b)) for b in range(8)]  # satellites d=1
    fps += list(rng.integers(0, 2**63, n_bg, dtype=np.uint64))  # background
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(fps))), pa.int64()),
            "fp": pa.array(np.asarray(fps, np.uint64).view(np.int64), pa.int64()),
        }
    )

    def components(pairs):
        tbl = pa.table(
            {"id_a": pa.array([p["id_a"] for p in pairs], pa.int64()),
             "id_b": pa.array([p["id_b"] for p in pairs], pa.int64())}
        )
        got = duplicate_clusters(tbl)
        return sorted(zip(got["doc_id"].to_pylist(), got["rep_id"].to_pylist()))

    full = hamming_candidates(
        ray.data.from_arrow(t).repartition(4), max_hamming=2,
        hot_group_limit=None).take_all()
    red = hamming_candidates(
        ray.data.from_arrow(t).repartition(4), max_hamming=2,
        hot_group_limit=8).take_all()
    assert len(red) < len(full)              # the list really shrank
    assert components(red) == components(full)
    # every emitted reduced pair is a true within-radius pair
    assert all(p["hamming"] <= 2 for p in red)
    # the mega-class star: every member connects to the class min id
    red_set = {(p["id_a"], p["id_b"]) for p in red}
    assert all((0, i) in red_set for i in range(1, n_clique))


def test_image_quality_signals():
    from changesetmd_ray.stages.media_fp import image_quality_stats

    # sharp = photo with fine-grained detail; blurred = same content
    # through a 3×3 box filter (the smoothing that kills the Laplacian)
    rng = np.random.default_rng(21)
    sharp = np.clip(
        _photo(21).astype(np.float64) + rng.normal(0, 25, (96, 128, 3)),
        0, 255).astype(np.uint8)
    f = sharp.astype(np.float64)
    acc = np.zeros_like(f)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc += np.roll(np.roll(f, dy, axis=0), dx, axis=1)
    blurred = np.clip(acc / 9.0, 0, 255).astype(np.uint8)
    s_sharp = image_quality_stats(sharp)
    s_blur = image_quality_stats(blurred)
    assert s_sharp[0] > 4 * s_blur[0]          # blur kills Laplacian var
    black = np.zeros((32, 32, 3), np.uint8)
    s_black = image_quality_stats(black)
    assert s_black[1] == 0.0 and s_black[2] == 0.0 and s_black[3] == 0.0
    assert 0.3 < s_sharp[1] < 0.8 and s_sharp[3] > 4.0


def test_image_quality_stage(ray_session):
    from changesetmd_ray.stages.media_fp import image_quality

    out = image_quality(ray.data.from_arrow(_media_table())).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[4]["sharpness"] is None       # audio row → nulls
    assert by_id[1]["entropy"] > 3.0           # photo-like
    assert by_id[1]["sharpness"] > 0.0


def test_hamming_candidates_empty_and_single(ray_session):
    from changesetmd_ray.text.dedup import hamming_candidates

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "fp": pa.array([], pa.int64())})
    assert hamming_candidates(ray.data.from_arrow(empty)).take_all() == []
    one = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "fp": pa.array([123], pa.int64())})
    assert hamming_candidates(ray.data.from_arrow(one)).take_all() == []
