"""Audio constellation fingerprints (stages/audio_fp.py): determinism,
shift/amplitude invariance of matching, planted-pair near-dup recall
with unrelated clips rejected."""

import numpy as np
import pyarrow as pa

import ray
from changesetmd_ray.stages.audio_fp import (
    audio_fingerprints,
    audio_neardup_candidates,
)
from changesetmd_ray.stages.codecs import wav_encode

RATE = 8000


def _chirp_clip(seed: int, n_sec: float = 2.0, amp: int = 12000) -> np.ndarray:
    """Deterministic melody-like clip: a sequence of random sine tones
    (200-3500 Hz), 125 ms each — structured spectra the landmark
    scheme is built for."""
    rng = np.random.default_rng(seed)
    seg = int(0.125 * RATE)
    n = int(n_sec * RATE)
    out = np.zeros(n)
    t = np.arange(seg) / RATE
    for s in range(0, n - seg + 1, seg):
        f = rng.uniform(200, 3500)
        out[s:s + seg] = np.sin(2 * np.pi * f * t)
    return (amp * out).astype(np.int16)


def test_fingerprints_deterministic_and_nonempty():
    pcm = _chirp_clip(1)
    h1, t1 = audio_fingerprints(pcm)
    h2, t2 = audio_fingerprints(pcm)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(t1, t2)
    assert len(h1) > 100
    assert audio_fingerprints(np.zeros(100, np.int16))[0].shape == (0,)


def test_fingerprints_amplitude_invariant():
    pcm = _chirp_clip(2)
    half = (pcm.astype(np.int32) // 2).astype(np.int16)
    h1, _ = audio_fingerprints(pcm)
    h2, _ = audio_fingerprints(half)
    common = len(np.intersect1d(h1, h2))
    assert common > 0.8 * min(len(np.unique(h1)), len(np.unique(h2)))


def _media(rows):
    return ray.data.from_arrow(pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "media_type": pa.array([r[1] for r in rows]),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
        }
    ))


def test_neardup_finds_shifted_noisy_copy_only(ray_session):
    rng = np.random.default_rng(7)
    base = _chirp_clip(42)
    # time-shifted (0.25 s), attenuated, noisy re-encode of the base
    shifted = np.concatenate(
        [np.zeros(RATE // 4, np.int16),
         (0.7 * base + rng.normal(0, 120, len(base))).astype(np.int16)])
    rows = [
        (1, "audio", wav_encode(base, RATE)),
        (2, "audio", wav_encode(shifted, RATE)),
        (3, "audio", wav_encode(_chirp_clip(99), RATE)),   # unrelated
        (4, "audio", wav_encode(_chirp_clip(123), RATE)),  # unrelated
        (5, "image", b"not audio"),
    ]
    pairs = audio_neardup_candidates(_media(rows).repartition(2)).take_all()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    p = pairs[0]
    assert p["matches"] >= 12
    # the consistent offset is the planted quarter-second shift
    from changesetmd_ray.stages.audio_fp import HOP

    assert abs(abs(p["offset"]) - (RATE // 4) / HOP) <= 2


def test_neardup_empty_and_single(ray_session):
    rows = [(1, "audio", wav_encode(_chirp_clip(5), RATE))]
    assert audio_neardup_candidates(_media(rows)).take_all() == []


def test_neardup_arity3_scale_path(ray_session):
    """The corpus-dedup scale knob: peak-TRIPLE landmarks must find the
    same planted pair (measured margins: planted >= 738 vs spurious
    <= 16 matches at 1k clips — see tools/stress_audio.py)."""
    rng = np.random.default_rng(7)
    base = _chirp_clip(42)
    shifted = np.concatenate(
        [np.zeros(RATE // 4, np.int16),
         (0.7 * base + rng.normal(0, 120, len(base))).astype(np.int16)])
    rows = [
        (1, "audio", wav_encode(base, RATE)),
        (2, "audio", wav_encode(shifted, RATE)),
        (3, "audio", wav_encode(_chirp_clip(99), RATE)),
    ]
    pairs = audio_neardup_candidates(
        _media(rows), landmark_arity=3, min_matches=100).take_all()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    import pytest

    from changesetmd_ray.stages.audio_fp import audio_fingerprints

    with pytest.raises(ValueError):
        audio_fingerprints(base, landmark_arity=4)


def test_fingerprints_short_clip_arity3():
    # shorter than one triple span at the smallest dt → empty, no crash
    short = (1000 * np.sin(np.arange(900) / 5.0)).astype(np.int16)
    h, t = audio_fingerprints(short, landmark_arity=3)
    assert h.shape == (0,) and t.shape == (0,)
