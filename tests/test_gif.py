"""GIF codec tests (stages/gif.py) — real LZW, animation, interlace."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.stages.gif import (
    _INTERLACE_PASSES,
    _color_table_bytes,
    _lzw_decode,
    _lzw_encode,
    _palette_of,
    _sub_blocks,
    gif_decode,
    gif_decode_frames,
    gif_encode,
    gif_encode_animated,
    gif_frame_count,
)


def test_lzw_roundtrip_fuzz():
    """Dictionary growth, width bumps and the 4096 reset all round-trip."""
    rng = np.random.default_rng(0)
    for n, alphabet, mcs in ((1, 2, 2), (10, 4, 2), (1000, 16, 4),
                             (20000, 256, 8), (6000, 2, 2)):
        idx = rng.integers(0, alphabet, n).astype(np.uint8)
        assert np.array_equal(
            _lzw_decode(_lzw_encode(idx, mcs), mcs, n), idx), (n, alphabet)


def test_gif_single_frame_roundtrip():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (6, 3)).astype(np.uint8)
    rgb = pal[rng.integers(0, 6, (23, 31)).astype(np.uint8)]
    assert np.array_equal(gif_decode(gif_encode(rgb)), rgb)
    # full 256-color palette
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    rgb = np.stack([img, (img * 3) % 256, (img * 7) % 256],
                   axis=-1).astype(np.uint8)
    assert np.array_equal(gif_decode(gif_encode(rgb)), rgb)


def test_gif_animation_and_header_facts():
    f1 = np.full((10, 12, 3), (10, 20, 30), np.uint8)
    f2 = np.full((10, 12, 3), (200, 100, 50), np.uint8)
    payload = gif_encode_animated([f1, f2, f1], delay_cs=5)
    frames = gif_decode_frames(payload)
    assert len(frames) == 3
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)
    # header facts without pixel decode
    assert gif_frame_count(payload) == (3, [5, 5, 5])


def test_gif_interlaced_hand_built():
    """Interlaced frame built by hand (4-pass row order) reassembles."""
    rng = np.random.default_rng(2)
    h, w = 13, 7
    pal4 = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    rgb = pal4[rng.integers(0, 4, (h, w)).astype(np.uint8)]
    palx, idx = _palette_of(rgb)
    tab, sf = _color_table_bytes(palx)
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in _INTERLACE_PASSES])
    inter = idx[order]
    mc = max(2, sf + 1)
    out = bytearray(b"GIF89a") + struct.pack("<HHBBB", w, h, 0x70, 0, 0)
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0xC0 | sf]) + tab  # LCT + interlace flag
    out += bytes([mc]) + _sub_blocks(_lzw_encode(inter.reshape(-1), mc))
    out += b"\x3b"
    assert np.array_equal(gif_decode(bytes(out)), rgb)


def test_gif_boundaries():
    with pytest.raises(ValueError, match="GIF87a/89a"):
        gif_decode(b"not a gif")
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError, match="256 distinct"):
        gif_encode(rng.integers(0, 256, (30, 30, 3)).astype(np.uint8))
    with pytest.raises(ValueError, match="at least one frame"):
        gif_encode_animated([])


def test_image_codec_mode_handles_gif(ray_session):
    """codec='image' sniffs GIF through resize + decode; NN resize
    preserves the palette bound so GIF re-encodes as GIF."""
    import ray.data

    from changesetmd_ray.stages.multimodal import decode_media, resize_media

    gif = gif_encode(np.full((7, 9, 3), (12, 34, 210), np.uint8))
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image"], pa.string()),
        "payload": pa.array([gif], pa.binary()),
    })
    ds = resize_media(ray.data.from_arrow(t), width=20, height=10,
                      codec="image", batch_size=8)
    out = decode_media(ds, feat_dim=16, codec="image", batch_size=8).take_all()
    f = out[0]["feature"]
    assert f[1] == 20.0 and f[2] == 10.0
    assert [round(x * 255) for x in f[3:6]] == [12, 34, 210]


def test_frame_sampler_handles_animated_gif(ray_session):
    """codec='video' sniffs animated GIFs: frame count + fps from the
    header-only walk (delay 5 cs -> 20 fps -> ts in 50 ms steps)."""
    import ray.data

    from changesetmd_ray.stages.multimodal import sample_frames

    f1 = np.full((6, 8, 3), (1, 2, 3), np.uint8)
    f2 = np.full((6, 8, 3), (9, 8, 7), np.uint8)
    payload = gif_encode_animated([f1, f2, f1, f2, f1], delay_cs=5)
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["video"], pa.string()),
        "payload": pa.array([payload], pa.binary()),
    })
    out = sample_frames(ray.data.from_arrow(t), stride=2, codec="video",
                        batch_size=8).take_all()
    got = sorted((r["frame_idx"], r["ts_ms"]) for r in out)
    assert got == [(0, 0), (2, 100), (4, 200)]
