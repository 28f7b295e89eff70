"""Baseline JPEG codec tests (stages/jpeg.py).

The decoder trusts only the wire bytes (tables from DQT/DHT, sampling
from SOF0), so encode → decode exercises the actual T.81 format, not a
shared in-process shortcut.
"""

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.stages.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    jpeg_decode,
    jpeg_encode,
    quality_scale,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256],
                    axis=-1).astype(np.uint8)


def test_solid_grey_roundtrip_bit_exact():
    """Grey with 8*(v-128) divisible by the q90 DC quantizer (3)
    round-trips exactly — the media_pipeline oracle contract."""
    assert quality_scale(QUANT_LUMA, 90)[0] == 3
    for v in (68, 92, 128, 131, 158, 188):
        img = np.full((24, 40, 3), v, np.uint8)
        for kw in ({}, {"subsampling": "420"}, {"restart_interval": 2}):
            out = jpeg_decode(jpeg_encode(img, quality=90, **kw))
            assert np.array_equal(out, img), (v, kw)


def test_gradient_roundtrip_tolerance():
    img = _gradient(64, 80)
    out = jpeg_decode(jpeg_encode(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4  # smooth content at q95 stays near-lossless


def test_non_multiple_of_8_dims():
    img = _gradient(13, 21)
    out = jpeg_decode(jpeg_encode(img, quality=90))
    assert out.shape == img.shape
    out420 = jpeg_decode(jpeg_encode(img, quality=90, subsampling="420"))
    assert out420.shape == img.shape


def test_chroma_subsampling_420():
    """4:2:0 writes 2x2 luma sampling in SOF0 and decodes through the
    replication upsampler; solid colors survive exactly-ish."""
    img = np.full((17, 26, 3), (200, 50, 90), np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90, subsampling="420"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_restart_intervals_equal_no_dri():
    img = _gradient(40, 48)
    base = jpeg_decode(jpeg_encode(img, quality=85))
    with_dri = jpeg_decode(jpeg_encode(img, quality=85, restart_interval=1))
    assert np.array_equal(base, with_dri)


def test_greyscale_single_component():
    g = np.full((20, 30), 158, np.uint8)
    out = jpeg_decode(jpeg_encode(g, quality=90))
    assert out.shape == (20, 30, 3)
    assert np.array_equal(out, np.stack([g] * 3, axis=-1))


def test_zigzag_is_the_standard_order():
    # spot-check the canonical T.81 zigzag prefix and closure
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_boundaries_still_marked():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg")
    # hand-built SOF9 frame header → arithmetic-coding boundary
    sof9 = (b"\xff\xd8" + b"\xff\xc9" + b"\x00\x0b"
            + b"\x08\x00\x10\x00\x10\x01" + b"\x01\x11\x00")
    with pytest.raises(NotImplementedError, match="SOF9"):
        jpeg_decode(sof9)
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 3), np.uint8), quality=0)


def test_progressive_decodes_identically_to_baseline():
    """SOF2 support (round 5): the progressive scan script produces the
    SAME quantized coefficients as sequential mode, so decodes must be
    pixel-identical — across spectral splits, successive-approximation
    refinement, EOB runs and both subsamplings."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:37, 0:53]
    grad = np.stack([(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256],
                    axis=-1).astype(np.uint8)
    cases = [
        (grad, {}), (grad, {"quality": 40}),
        (grad, {"subsampling": "420"}),
        (rng.integers(0, 256, (24, 31, 3)).astype(np.uint8), {"quality": 75}),
        (np.full((17, 26, 3), 131, np.uint8), {}),
    ]
    for img, kw in cases:
        prog_bytes = jpeg_encode(img, progressive=True, **kw)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        assert np.array_equal(
            jpeg_decode(prog_bytes),
            jpeg_decode(jpeg_encode(img, **kw))), kw
    # greyscale single-component progressive
    g = rng.integers(0, 256, (20, 30)).astype(np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(g, progressive=True)),
                          jpeg_decode(jpeg_encode(g)))


def test_progressive_solid_grey_bit_exact():
    """The media_pipeline planted-grey contract holds through the
    progressive path too (DC-only blocks, quant-divisible values)."""
    for v in (92, 128, 158, 188):
        img = np.full((24, 40, 3), v, np.uint8)
        assert np.array_equal(
            jpeg_decode(jpeg_encode(img, quality=90, progressive=True)), img)


def test_decoder_reads_tables_from_the_stream():
    """Corrupting the DHT segment must break decode — proof the decoder
    uses the file's tables, not module constants."""
    img = np.full((8, 8, 3), 131, np.uint8)
    data = bytearray(jpeg_encode(img, quality=90))
    i = bytes(data).find(b"\xff\xc4")
    assert i > 0
    # v=131 -> luma DC diff 8 -> category 4: swap huffman VALUES 4 and 5
    # in the first (DC luma) table so that symbol decodes as category 5
    # (value offset: marker 2 + len 2 + class/id 1 + bits 16 = 21)
    data[i + 21 + 4], data[i + 21 + 5] = data[i + 21 + 5], data[i + 21 + 4]
    try:
        out = jpeg_decode(bytes(data))
        assert not np.array_equal(out, img)
    except ValueError:
        pass  # misaligned entropy stream is an equally valid outcome


def test_image_codec_mode_dispatches_by_magic(ray_session):
    """MediaDecodeStub/MediaResizeStub codec='image' handle mixed
    BMP + JPEG payload columns through the real Ray stage."""
    import ray.data

    from changesetmd_ray.stages.codecs import bmp_encode
    from changesetmd_ray.stages.multimodal import decode_media, resize_media

    bmp = bmp_encode(np.full((6, 9, 3), (10, 200, 30), np.uint8))
    jpg = jpeg_encode(np.full((10, 14, 3), 158, np.uint8), quality=90)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([bmp, jpg], pa.binary()),
    })
    ds = resize_media(ray.data.from_arrow(t), width=16, height=12,
                      codec="image", batch_size=8)
    out = decode_media(ds, feat_dim=16, codec="image", batch_size=8).take_all()
    by_id = {r["media_id"]: r for r in out}
    f_bmp = by_id[1]["feature"]
    f_jpg = by_id[2]["feature"]
    assert f_bmp[1] == 16.0 and f_bmp[2] == 12.0
    # solid colors survive resize: channel means are the planted values
    assert [round(x * 255) for x in f_bmp[3:6]] == [10, 200, 30]
    assert [round(x * 255) for x in f_jpg[3:6]] == [158, 158, 158]
    assert f_jpg[0] == np.float32(3 * 158 / 765.0)
