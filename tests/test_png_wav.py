"""PNG (stages/png.py) and WAV (stages/codecs.py) codec tests.

The PNG filter/color-type cases build their streams BY HAND (filtering
pixel math independent of the encoder), so decode is checked against
the spec, not against our own encoder's habits.
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.stages.codecs import wav_decode, wav_encode
from changesetmd_ray.stages.png import _SIG, _chunk, png_decode, png_encode


def _build_png(px: np.ndarray, filters, ctype: int = 2, plte=None) -> bytes:
    """Hand-filter pixels into a PNG stream (independent of png_encode)."""
    h, w, ch = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    recon = px.reshape(h, w * ch).astype(np.int32)
    rows = []
    for y, f in enumerate(filters):
        cur = recon[y]
        prev = recon[y - 1] if y else np.zeros(w * ch, np.int32)
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) // 2)
        else:
            p = left + prev - upleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, upleft))
            filt = cur - pred
        rows.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.tobytes())
    return out + _chunk(b"IDAT", zlib.compress(b"".join(rows))) \
               + _chunk(b"IEND", b"")


def test_png_roundtrip_lossless():
    rng = np.random.default_rng(0)
    for shape in ((1, 1, 3), (13, 21, 3), (64, 80, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_all_five_filters_decode():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    for filters in ([0] * 9, [1] * 9, [2] * 9, [3] * 9, [4] * 9,
                    [0, 1, 2, 3, 4, 4, 3, 2, 1]):
        assert np.array_equal(png_decode(_build_png(img, filters)), img)


def test_png_color_types():
    rng = np.random.default_rng(2)
    h, w = 6, 5
    grey = rng.integers(0, 256, (h, w, 1)).astype(np.uint8)
    assert np.array_equal(png_decode(_build_png(grey, [0] * h, ctype=0)),
                          np.repeat(grey, 3, axis=2))
    rgba = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    assert np.array_equal(png_decode(_build_png(rgba, [0] * h, ctype=6)),
                          rgba[:, :, :3])
    ga = rng.integers(0, 256, (h, w, 2)).astype(np.uint8)
    assert np.array_equal(png_decode(_build_png(ga, [0] * h, ctype=4)),
                          np.repeat(ga[:, :, :1], 3, axis=2))
    plte = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (h, w, 1)).astype(np.uint8)
    assert np.array_equal(png_decode(_build_png(idx, [0] * h, ctype=3,
                                                plte=plte)),
                          plte[idx[:, :, 0]])


def test_png_error_paths():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png")
    img = np.zeros((4, 4, 3), np.uint8)
    bad = bytearray(png_encode(img))
    bad[20] ^= 0xFF  # corrupt IHDR body → CRC check must fire
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    # illegal depth/color-type combination
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)  # 4-bit RGB
    raw = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(raw)
    with pytest.raises(ValueError):
        png_encode(np.zeros((0, 4, 3), np.uint8))


def test_wav_roundtrip_and_chunk_walk():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, (777, 2)).astype(np.int16)
    out, rate = wav_decode(wav_encode(pcm, 44100))
    assert rate == 44100 and np.array_equal(out, pcm)
    mono = rng.integers(-32768, 32768, 100).astype(np.int16)
    out, rate = wav_decode(wav_encode(mono, 8000))
    assert out.shape == (100, 1) and np.array_equal(out[:, 0], mono)
    # decoder walks chunks: inject a LIST chunk between fmt and data
    raw = bytearray(wav_encode(mono, 8000))
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = bytes(raw[:fmt_end]) + extra + bytes(raw[fmt_end:])
    patched = (patched[:4] + struct.pack("<I", len(patched) - 8)
               + patched[8:])
    out2, _ = wav_decode(patched)
    assert np.array_equal(out2, out)


def test_wav_boundaries():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"junk")
    # IEEE-float format tag → marked boundary
    raw = bytearray(wav_encode(np.zeros(4, np.int16), 8000))
    raw[20] = 3  # audio_format = IEEE float
    with pytest.raises(NotImplementedError, match="PCM"):
        wav_decode(bytes(raw))
    with pytest.raises(ValueError):
        wav_encode(np.zeros(4, np.int16), 0)


def test_image_codec_mode_handles_png(ray_session):
    """codec='image' sniffs PNG through resize + decode stages."""
    import ray.data

    from changesetmd_ray.stages.multimodal import decode_media, resize_media

    png = png_encode(np.full((7, 9, 3), (12, 34, 210), np.uint8))
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image"], pa.string()),
        "payload": pa.array([png], pa.binary()),
    })
    ds = resize_media(ray.data.from_arrow(t), width=20, height=10,
                      codec="image", batch_size=8)
    out = decode_media(ds, feat_dim=16, codec="image", batch_size=8).take_all()
    f = out[0]["feature"]
    assert f[1] == 20.0 and f[2] == 10.0
    assert [round(x * 255) for x in f[3:6]] == [12, 34, 210]


def test_audio_stats_stage(ray_session):
    """AudioStatsStub codec='wav': real RIFF parse + exact PCM stats;
    non-audio rows keep null stats."""
    import ray.data

    from changesetmd_ray.stages.multimodal import audio_stats

    pcm = np.full(200, -1234, np.int16)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["audio", "video"], pa.string()),
        "payload": pa.array([wav_encode(pcm, 8000), b"VID1junk"], pa.binary()),
    })
    out = audio_stats(ray.data.from_arrow(t), codec="wav",
                      batch_size=8).take_all()
    by_id = {r["media_id"]: r for r in out}
    a = by_id[1]
    assert a["n_samples"] == 200 and a["sample_rate"] == 8000
    assert a["duration_ms"] == 25
    assert a["mean_abs"] == 1234.0
    v = by_id[2]
    assert v["n_samples"] is None and v["mean_abs"] is None


def test_mp4_box_walk():
    """mp4_header parses a real ISO BMFF box tree (and rejects junk)."""
    import struct

    from changesetmd_ray.stages.codecs import mp4_encode, mp4_header

    for n, fps in ((1, 25), (60, 30), (0, 24)):
        payload = mp4_encode(n, fps, b"opaque")
        assert payload[4:8] == b"ftyp"
        if n == 0:
            with pytest.raises(ValueError, match="no video trak"):
                mp4_header(payload)
        else:
            assert mp4_header(payload) == (n, fps)
    with pytest.raises(ValueError, match="ftyp"):
        mp4_header(b"VID1\x00\x00\x00\x00\x00\x00\x00\x00")
    # non-uniform stts, hand-built: 10 samples at delta 1 + 10 at
    # delta 3 with timescale 50 -> avg delta 2 -> fps 25
    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload
    stts = box(b"stts", struct.pack(">II", 0, 2)
               + struct.pack(">II", 10, 1) + struct.pack(">II", 10, 3))
    stbl = box(b"stbl", stts)
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", struct.pack(">II4sIII", 0, 0, b"vide", 0, 0, 0) + b"\x00")
    mdhd = box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, 50, 40, 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", box(b"tkhd", b"\x00" * 84) + mdia)
    moov = box(b"moov", box(b"mvhd", b"\x00" * 100) + trak)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    assert mp4_header(ftyp + moov) == (20, 25)


def test_frame_sampler_sniffs_containers(ray_session):
    """codec='video' handles VID1 and MP4 rows in one column."""
    import ray.data

    from changesetmd_ray.stages.codecs import mp4_encode, vid1_encode
    from changesetmd_ray.stages.multimodal import sample_frames

    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["video", "video"], pa.string()),
        "payload": pa.array([vid1_encode(5, 25, b"x"),
                             mp4_encode(5, 25, b"y")], pa.binary()),
    })
    out = sample_frames(ray.data.from_arrow(t), stride=2, codec="video",
                        batch_size=8).take_all()
    per_id = {}
    for r in out:
        per_id.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    # identical facts from both containers
    assert sorted(per_id[1]) == sorted(per_id[2]) == [(0, 0), (2, 80), (4, 160)]


def _ihdr(w, h, depth, ctype, interlace=0):
    return _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))


def _png(w, h, depth, ctype, idat, interlace=0, plte=None):
    out = _SIG + _ihdr(w, h, depth, ctype, interlace)
    if plte is not None:
        out += _chunk(b"PLTE", plte.tobytes())
    return out + _chunk(b"IDAT", zlib.compress(idat)) + _chunk(b"IEND", b"")


def test_png_adam7_interlaced():
    """Adam7: seven hand-built filtered sub-images reassemble exactly
    (RGB8 pass grid + a filtered 16-bit grey variant)."""
    from changesetmd_ray.stages.png import _ADAM7

    rng = np.random.default_rng(5)
    w, h = 13, 9
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub = img[y0::dy, x0::dx]
        raw = np.zeros((ph, 1 + pw * 3), np.uint8)
        raw[:, 1:] = sub.reshape(ph, pw * 3)
        parts.append(raw.tobytes())
    got = png_decode(_png(w, h, 8, 2, b"".join(parts), interlace=1))
    assert np.array_equal(got, img)

    w2, h2 = 6, 7
    img2 = rng.integers(0, 65536, (h2, w2)).astype(np.uint16)
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w2 - x0 + dx - 1) // dx
        ph = (h2 - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sb = np.frombuffer(img2[y0::dy, x0::dx].astype(">u2").tobytes(),
                           np.uint8).reshape(ph, pw * 2)
        raw = np.zeros((ph, 1 + pw * 2), np.uint8)
        raw[0, 1:] = sb[0]
        for y in range(1, ph):
            raw[y, 0] = 2  # up filter inside an interlace pass
            raw[y, 1:] = (sb[y].astype(np.int32) - sb[y - 1]).astype(np.uint8)
        parts.append(raw.tobytes())
    got = png_decode(_png(w2, h2, 16, 0, b"".join(parts), interlace=1))
    assert np.array_equal(
        got, np.repeat((img2 >> 8).astype(np.uint8)[:, :, None], 3, axis=2))


def test_png_16bit_and_low_depths():
    rng = np.random.default_rng(6)
    # 16-bit RGB → high-byte reduction
    img16 = rng.integers(0, 65536, (5, 4, 3)).astype(np.uint16)
    raw = np.zeros((5, 1 + 4 * 3 * 2), np.uint8)
    raw[:, 1:] = np.frombuffer(img16.astype(">u2").tobytes(),
                               np.uint8).reshape(5, 24)
    got = png_decode(_png(4, 5, 16, 2, raw.tobytes()))
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))
    # 1/2/4-bit grey with exact expansion
    for d in (1, 2, 4):
        gw, gh = 11, 6
        vals = rng.integers(0, 1 << d, (gh, gw)).astype(np.uint8)
        rows = []
        for y in range(gh):
            bits = np.zeros(gw * d, np.uint8)
            for x in range(gw):
                for b in range(d):
                    bits[x * d + b] = (vals[y, x] >> (d - 1 - b)) & 1
            rows.append(b"\x00" + np.packbits(bits).tobytes())
        got = png_decode(_png(gw, gh, d, 0, b"".join(rows)))
        want = np.repeat(
            (vals * (255 // ((1 << d) - 1)))[:, :, None], 3, axis=2)
        assert np.array_equal(got, want), d
    # 4-bit palette (indices used verbatim)
    plte = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (5, 7)).astype(np.uint8)
    rows = []
    for y in range(5):
        bits = np.zeros(7 * 4, np.uint8)
        for x in range(7):
            for b in range(4):
                bits[x * 4 + b] = (idx[y, x] >> (3 - b)) & 1
        rows.append(b"\x00" + np.packbits(bits).tobytes())
    got = png_decode(_png(7, 5, 4, 3, b"".join(rows), plte=plte))
    assert np.array_equal(got, plte[idx])


def test_wav_8_and_24_bit_pcm():
    """8-bit (unsigned) and 24-bit PCM decode to int16 correctly."""
    import struct as _s

    # hand-build an 8-bit mono wav: samples 0,128,255 -> int16
    def wav(bits, ch, rate, data):
        fmt = _s.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
        return (b"RIFF" + _s.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + _s.pack("<I", 16) + fmt
                + b"data" + _s.pack("<I", len(data)) + data)

    out, rate = wav_decode(wav(8, 1, 8000, bytes([0, 128, 255])))
    assert rate == 8000
    assert out[:, 0].tolist() == [-32768, 0, 32512]  # (u-128)<<8

    # 24-bit: values -(1<<23), 0, (1<<23)-1 -> top 16 bits
    vals = [-(1 << 23), 0, (1 << 23) - 1, -256, 257]
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    out, _ = wav_decode(wav(24, 1, 8000, raw))
    assert out[:, 0].tolist() == [v >> 8 for v in vals]

    # 32-bit float still refuses at the boundary
    with pytest.raises(NotImplementedError, match="PCM"):
        wav_decode(wav(32, 1, 8000, b"\x00" * 8))
