"""Pure-Python GIF codec (GIF87a/89a, real LZW).

Completes the web-image codec set (BMP/JPEG/PNG/GIF cover ~all crawl
image payloads). Everything is stdlib + numpy:

- :func:`gif_decode` — first frame as ``(h, w, 3)`` uint8 RGB (the
  image-stage contract, same as the other codecs).
- :func:`gif_decode_frames` — ALL frames composited to full-canvas RGB
  (animation): global/local color tables, per-frame offsets,
  interlaced frames (4-pass row shuffle), transparency, disposal
  methods 0/1 (draw over) and 2 (restore to background). Disposal 3
  (restore previous) raises ``NotImplementedError`` — rare and the
  documented remaining boundary.
- :func:`gif_frame_count` — frame count + per-frame delays WITHOUT
  LZW-decoding pixel data (sub-block skip only) — the cheap header
  fact the frame-sampling stage needs, like ``vid1_header`` /
  ``mp4_header``.
- :func:`gif_encode` / :func:`gif_encode_animated` — REAL LZW
  compression (dictionary build, width growth, 4096 reset) over a
  palette built from the image's unique colors (≤ 256 required — an
  NN-resized decode always satisfies this since gathers create no new
  colors).

LZW is inherently sequential per frame (a Python loop, like JPEG's
entropy decode); palette mapping and compositing are vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-LZW → uint8 index array of length ``n_pixels``."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary: list of byte strings
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                if len(out) < n_pixels:
                    raise ValueError("GIF LZW ended before all pixels")
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                # some encoders omit the END code; accept exactly-full
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
    raise ValueError("truncated GIF LZW stream")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array → GIF-LZW bytes (real dictionary compression,
    width growth, table reset at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    width = min_code_size + 1
    next_code = end + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset_table() -> None:
        nonlocal width, next_code, table
        width = min_code_size + 1
        next_code = end + 1
        table = {bytes([i]): i for i in range(clear)}

    emit(clear)
    data = indices.astype(np.uint8).tobytes()
    if data:
        s = data[0:1]
        for i in range(1, len(data)):
            c = data[i:i + 1]
            if s + c in table:
                s += c
                continue
            emit(table[s])
            table[s + c] = next_code
            next_code += 1
            # width covers codes UP TO next_code-1 after emit; grow when
            # the next code to be ASSIGNED no longer fits
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            if next_code == 4096:
                emit(clear)
                reset_table()
            s = c
        emit(table[s])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Payload → length-prefixed GIF sub-block chain + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        pos += n


def _skip_sub_blocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


# ------------------------------------------------------------ encode


def _palette_of(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) → (palette (n, 3), indices (h, w)); requires ≤ 256
    distinct colors."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32) << 16) \
        | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(
            f"GIF needs <= 256 distinct colors, image has {len(uniq)}")
    pal = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF],
                   axis=1).astype(np.uint8)
    return pal, inv.astype(np.uint8).reshape(h, w)


def _color_table_bytes(pal: np.ndarray) -> tuple[bytes, int]:
    """Palette → GCT bytes padded to a power of two ≥ 2, and the size
    exponent field (2^(n+1) entries)."""
    n = max(2, len(pal))
    bits = max(1, (n - 1).bit_length())
    full = 1 << bits
    tab = np.zeros((full, 3), np.uint8)
    tab[:len(pal)] = pal
    return tab.tobytes(), bits - 1


def gif_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB (≤ 256 distinct colors) → single-frame
    GIF89a."""
    return gif_encode_animated([pixels], delay_cs=0)


def gif_encode_animated(frames: list, delay_cs: int = 10) -> bytes:
    """List of (h, w, 3) uint8 RGB frames (same dims, each ≤ 256
    colors, per-frame LOCAL color tables) → animated GIF89a with the
    given per-frame delay in centiseconds."""
    if not frames:
        raise ValueError("need at least one frame")
    first = np.asarray(frames[0], np.uint8)
    if first.ndim != 3 or first.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) frames, got {first.shape}")
    h, w, _ = first.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x70, 0, 0)  # no GCT, 8-bit res
    if len(frames) > 1:
        # Netscape looping extension (standard for animation)
        out += bytes([_EXTENSION, 0xFF, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1, 0, 0, 0])
    for fr in frames:
        px = np.asarray(fr, np.uint8)
        if px.shape != first.shape:
            raise ValueError("all frames must share dimensions")
        pal, idx = _palette_of(px)
        tab, size_field = _color_table_bytes(pal)
        if len(frames) > 1:
            out += bytes([_EXTENSION, _GCE_LABEL, 4])
            out += struct.pack("<BHB", 0x04, delay_cs, 0)  # disposal 1
            out += b"\x00"
        out += bytes([_IMAGE]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x80 | size_field])  # local color table, no interlace
        out += tab
        min_code = max(2, size_field + 1)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(idx.reshape(-1), min_code))
    out.append(_TRAILER)
    return bytes(out)


# ------------------------------------------------------------ decode


def _parse(payload: bytes, *, pixels: bool, max_frames: int | None = None):
    """Walk the GIF block structure. ``pixels=False`` skips LZW data
    (header-facts mode). Yields dict per frame."""
    p = payload or b""
    if len(p) < 13 or p[:4] != b"GIF8" or p[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", p, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    gce = {"delay_cs": 0, "transparent": None, "disposal": 0}
    frames = 0
    while pos < len(p):
        block = p[pos]
        pos += 1
        if block == _TRAILER:
            return
        if block == _EXTENSION:
            label = p[pos]
            pos += 1
            data, pos = _read_sub_blocks(p, pos)
            if label == _GCE_LABEL and len(data) >= 4:
                flags, delay = struct.unpack_from("<BH", data, 0)
                gce = {
                    "delay_cs": delay,
                    "transparent": data[3] if flags & 0x01 else None,
                    "disposal": (flags >> 2) & 0x07,
                }
            continue
        if block != _IMAGE:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", p, pos)
        pos += 8
        fpacked = p[pos]
        pos += 1
        lct = None
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(p, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        interlaced = bool(fpacked & 0x40)
        min_code = p[pos]
        pos += 1
        if pixels:
            data, pos = _read_sub_blocks(p, pos)
            idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
            if interlaced:
                order = np.concatenate(
                    [np.arange(start, fh, step)
                     for start, step in _INTERLACE_PASSES])
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
        else:
            pos = _skip_sub_blocks(p, pos)
            idx = None
        table = lct if lct is not None else gct
        if pixels and table is None:
            raise ValueError("GIF frame without any color table")
        yield {"canvas": (w, h), "rect": (fx, fy, fw, fh), "idx": idx,
               "table": table, **gce}
        gce = {"delay_cs": 0, "transparent": None, "disposal": 0}
        frames += 1
        if max_frames is not None and frames >= max_frames:
            return
    raise ValueError("truncated GIF (no trailer)")


def gif_frame_count(payload: bytes) -> tuple[int, list[int]]:
    """(n_frames, per-frame delays in centiseconds) WITHOUT decoding
    pixel data — the frame-sampler's header fact."""
    delays = [f["delay_cs"] for f in _parse(payload, pixels=False)]
    return len(delays), delays


def gif_decode_frames(payload: bytes, max_frames: int | None = None) -> list:
    """All frames as full-canvas (h, w, 3) uint8 RGB (composited)."""
    out = []
    canvas = None
    for f in _parse(payload, pixels=True, max_frames=max_frames):
        w, h = f["canvas"]
        if canvas is None:
            canvas = np.zeros((h, w, 3), np.uint8)
        if f["disposal"] == 3:
            raise NotImplementedError(
                "GIF disposal method 3 (restore previous) not supported")
        fx, fy, fw, fh = f["rect"]
        if fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rect outside canvas")
        idx = f["idx"]
        table = f["table"]
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF index outside color table")
        rgb = table[idx]
        region = canvas[fy:fy + fh, fx:fx + fw]
        if f["transparent"] is not None:
            mask = (idx != f["transparent"])[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        out.append(canvas.copy())
        if f["disposal"] == 2:  # restore to background (black) after use
            canvas[fy:fy + fh, fx:fx + fw] = 0
    if not out:
        raise ValueError("GIF with no image frames")
    return out


def gif_decode(payload: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB — the image-stage contract."""
    return gif_decode_frames(payload, max_frames=1)[0]
