"""Dependency-free media codecs (the REAL side of the codec boundary).

Two formats are implemented for real, in pure numpy/struct, so the
multimodal stages (:mod:`changesetmd_ray.stages.multimodal`) have an
actually-decodable path that needs no image/video libraries:

- **BMP**: uncompressed 24-bit BI_RGB windows bitmaps
  (BITMAPINFOHEADER), the classic library-free raster format — both
  bottom-up (the convention :func:`bmp_encode` writes) and top-down
  (negative height) decode. Everything else (palettes, RLE, 16/32-bpp,
  V4/V5 headers) raises ``NotImplementedError`` — that remains the
  documented boundary where PIL would take over. (Baseline JPEG — the
  format web crawls actually contain — is implemented for real in
  :mod:`changesetmd_ray.stages.jpeg` since round 5.)
- **VID1**: this engine's toy video container — a 12-byte header
  ``b"VID1" + n_frames:uint32le + fps:uint32le`` followed by opaque
  payload bytes. It exists so the frame-sampling stage has a real
  header parse (count/fps come from the bytes, not a hash) while the
  actual frame decode stays stubbed.

Reference analogue: none (ChangesetMD is text/XML only); this is part
of the multimodal training-data additions.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def bmp_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → uncompressed 24-bit bottom-up BMP.
    Rows are padded to 4-byte multiples per the format; fully
    vectorized (one reverse-reshape, no per-pixel loop)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {px.shape}")
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    file_header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER_BYTES + data_size, 0, 0,
                              _BMP_HEADER_BYTES)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + rows.tobytes()


def bmp_decode(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 RGB array.
    Handles bottom-up and top-down (negative height) images; anything
    outside the 24-bpp BI_RGB / BITMAPINFOHEADER subset raises
    ``NotImplementedError`` (the documented real-codec boundary)."""
    if len(payload) < _BMP_HEADER_BYTES or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size} not supported")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is implemented (bpp={bpp}, "
            f"compression={compression}) — a real image library is needed here"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    row_bytes = (w * 3 + 3) & ~3
    need = offset + row_bytes * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes, need {need}")
    data = np.frombuffer(payload, np.uint8, row_bytes * h, offset).reshape(h, row_bytes)
    img = data[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor mapping
    ``dst[y, x] = src[y·sh // height, x·sw // width]`` — integer-exact
    and deterministic (no rounding-mode ambiguity), one fancy-index
    gather."""
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be >= 1, got {width}x{height}")
    sh, sw = img.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * sh) // height
    xs = (np.arange(width, dtype=np.int64) * sw) // width
    return np.ascontiguousarray(img[ys[:, None], xs[None, :]])


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 PCM ``(n,)`` or ``(n, channels)`` → canonical 44-byte-header
    RIFF/WAVE bytes — the audio counterpart of :func:`bmp_encode`, so
    the ``audio`` media type has a REAL library-free codec too."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0:
        raise ValueError(f"expected (n,) or (n, ch) int16 PCM, got {s.shape}")
    if rate < 1:
        raise ValueError(f"bad sample rate {rate}")
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ``((n, channels) int16 array, sample_rate)``.
    Proper chunk walk (fmt/data need not be adjacent; LIST/fact/…
    chunks are skipped). PCM at 8 bits (unsigned, rescaled to int16),
    16 bits (native) and 24 bits (truncated to the top 16) all decode;
    IEEE-float, ADPCM, mp3-in-wav etc. raise ``NotImplementedError``
    — the audio boundary where soundfile would take over."""
    p = payload or b""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", p, pos + 4)
        body = p[pos + 8: pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAVE without fmt/data chunks")
    audio_format, ch, rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits not in (8, 16, 24):
        raise NotImplementedError(
            f"only PCM 8/16/24-bit WAV is implemented "
            f"(format={audio_format}, bits={bits}) — a real audio "
            f"library is needed here")
    if ch < 1:
        raise ValueError(f"bad channel count {ch}")
    if bits == 16:
        n = len(data) // (2 * ch)
        arr = np.frombuffer(data, "<i2", n * ch).reshape(n, ch)
    elif bits == 8:  # unsigned, midpoint 128 → int16 full-scale
        n = len(data) // ch
        u = np.frombuffer(data, np.uint8, n * ch).reshape(n, ch)
        arr = ((u.astype(np.int16) - 128) << 8)
    else:  # 24-bit little-endian → top 16 bits
        n = len(data) // (3 * ch)
        b = np.frombuffer(data, np.uint8, n * ch * 3).reshape(-1, 3)
        i32 = (b[:, 0].astype(np.int32)
               | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
        arr = (i32 >> 8).astype(np.int16).reshape(n, ch)
    return np.ascontiguousarray(arr), int(rate)


# ------------------------------------------------------------ ISO BMFF

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for the boxes in
    ``data[start:end]`` (32-bit and 64-bit largesize forms)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated mp4 largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad mp4 box size {size} at {pos}")
        yield btype, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, path: list[bytes]):
    """All body ranges reached by descending ``path`` through
    container boxes."""
    if not path:
        yield start, end
        return
    for btype, b0, b1 in _mp4_boxes(data, start, end):
        if btype == path[0]:
            yield from _mp4_find(data, b0, b1, path[1:])


def mp4_encode(n_frames: int, fps: int, body: bytes = b"") -> bytes:
    """Minimal valid ISO BMFF: ``ftyp`` + ``moov`` (mvhd + one video
    trak whose ``stts`` carries ``n_frames`` samples of delta 1 at a
    media timescale of ``fps``) + ``mdat`` with opaque payload bytes —
    the real-container counterpart of :func:`vid1_encode` for planting
    fixtures. Sample DATA stays opaque (no codec payloads)."""
    if n_frames < 0 or fps < 1:
        raise ValueError(f"bad mp4 params n_frames={n_frames} fps={fps}")

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    stts = box(b"stts", struct.pack(">II", 0, 1)
               + struct.pack(">II", n_frames, 1))
    stbl = box(b"stbl", stts)
    minf = box(b"minf", stbl)
    # hdlr: version/flags, pre_defined, handler='vide', 3 reserved, name
    hdlr = box(b"hdlr", struct.pack(">II4sIII", 0, 0, b"vide", 0, 0, 0) + b"\x00")
    mdhd = box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, fps, n_frames, 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = box(b"tkhd", struct.pack(">II", 0x00000007, 0) + b"\x00" * 76)
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, fps, n_frames)
               + b"\x00" * 80)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + box(b"mdat", body)


def mp4_header(payload: bytes) -> tuple[int, int]:
    """ISO BMFF bytes → ``(n_frames, fps)`` for the first video trak:
    a REAL box walk (ftyp check, moov → trak → mdia, hdlr='vide'
    match, mdhd timescale, stts sample count / average delta). Frame
    PIXEL decode (avc1/hevc bitstreams) stays behind the ``'strict'``
    boundary — this parses the container, the same split as VID1."""
    p = payload or b""
    if len(p) < 12 or p[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (missing ftyp)")
    for trak0, trak1 in _mp4_find(p, 0, len(p), [b"moov", b"trak"]):
        handler = None
        for h0, h1 in _mp4_find(p, trak0, trak1, [b"mdia"]):
            for btype, b0, b1 in _mp4_boxes(p, h0, h1):
                if btype == b"hdlr":
                    handler = p[b0 + 8: b0 + 12]
        if handler != b"vide":
            continue
        timescale = None
        for m0, m1 in _mp4_find(p, trak0, trak1, [b"mdia"]):
            for btype, b0, b1 in _mp4_boxes(p, m0, m1):
                if btype == b"mdhd":
                    version = p[b0]
                    off = b0 + (4 + 8 + 8 if version == 1 else 4 + 4 + 4)
                    (timescale,) = struct.unpack_from(">I", p, off)
        total = 0
        weighted = 0
        for s0, s1 in _mp4_find(p, trak0, trak1,
                                [b"mdia", b"minf", b"stbl"]):
            for btype, b0, b1 in _mp4_boxes(p, s0, s1):
                if btype == b"stts":
                    (n_entries,) = struct.unpack_from(">I", p, b0 + 4)
                    for i in range(n_entries):
                        cnt, delta = struct.unpack_from(
                            ">II", p, b0 + 8 + 8 * i)
                        total += cnt
                        weighted += cnt * delta
        if timescale is None or total == 0:
            continue
        avg_delta = weighted / total
        if avg_delta <= 0:
            raise ValueError("mp4 stts with zero sample delta")
        fps = max(1, round(timescale / avg_delta))
        return int(total), int(fps)
    raise ValueError("no video trak with samples found in mp4")


_VID1_MAGIC = b"VID1"
VID1_HEADER_BYTES = 12


def vid1_encode(n_frames: int, fps: int, body: bytes = b"") -> bytes:
    """``n_frames``/``fps`` header + opaque body → VID1 container."""
    if n_frames < 0 or fps < 1:
        raise ValueError(f"bad VID1 params n_frames={n_frames} fps={fps}")
    return _VID1_MAGIC + struct.pack("<II", n_frames, fps) + body


def vid1_header(payload: bytes) -> tuple[int, int]:
    """VID1 bytes → ``(n_frames, fps)`` (real header parse; the frame
    pixel data itself stays behind the stub boundary)."""
    if len(payload) < VID1_HEADER_BYTES or payload[:4] != _VID1_MAGIC:
        raise ValueError("not a VID1 payload (missing magic)")
    n_frames, fps = struct.unpack_from("<II", payload, 4)
    if fps < 1:
        raise ValueError(f"bad VID1 fps {fps}")
    return int(n_frames), int(fps)
