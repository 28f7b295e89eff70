"""Pure-numpy + stdlib-zlib PNG codec (RFC 2083 / ISO 15948).

Companion to :mod:`changesetmd_ray.stages.jpeg`: together with baseline
JPEG this covers ~all image payloads a web crawl contains. DEFLATE
comes from stdlib ``zlib`` (always present), so unlike JPEG nothing has
to be approximated — PNG decode here covers the full static format:

- :func:`png_decode` — color types 0 (grey), 2 (RGB), 3 (palette),
  4 (grey+alpha), 6 (RGBA); ALL legal bit depths (1/2/4-bit grey and
  palette with exact expansion, 8-bit, 16-bit via the standard
  high-byte reduction); Adam7 interlacing (seven independently
  filtered sub-images scattered back on the pass grid); all five
  scanline filters; chunk CRC verification. Alpha is dropped (media
  features are RGB stats); palette expands through PLTE; ancillary
  chunks (tEXt/gAMA/tRNS…) are skipped.
- :func:`png_encode` — ``(h, w, 3)`` RGB → color-type-2 PNG. By
  default rows use filter 0 with a fixed zlib level, so decode of our
  own planted payloads takes the fully-vectorized fast path.

Filter performance shape: filters 0/2 (none/up) and 1 (sub, a
per-channel ``cumsum % 256``) are vectorized whole-image numpy; 3/4
(average/paeth) fall back to a per-pixel loop on exactly the rows that
use them — external PNGs decode correctly, planted fixtures never pay
the loop. PNG is LOSSLESS, so planted solid colors survive decode →
resize → re-encode → decode bit-exactly with no divisibility contract
needed (the JPEG oracle's trick is unnecessary here).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_encode(pixels: np.ndarray, *, compress_level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit color-type-2 PNG (filter 0 rows)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got shape {px.shape}")
    h, w, _ = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), np.uint8)
    raw[:, 1:] = px.reshape(h, w * 3)  # filter byte 0 per row
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_ALLOWED_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                   4: (8, 16), 6: (8, 16)}
# Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _scanline_bytes(w: int, ch: int, depth: int) -> int:
    return (w * ch * depth + 7) // 8


def _unpack_samples(recon: np.ndarray, w: int, ch: int,
                    depth: int) -> np.ndarray:
    """(h, stride_bytes) defiltered rows → (h, w*ch) sample array
    (uint8 for depths ≤ 8, uint16 for 16)."""
    h = recon.shape[0]
    if depth == 8:
        return recon[:, : w * ch]
    if depth == 16:
        return recon[:, : w * ch * 2].reshape(h, w * ch, 2).astype(
            np.uint16)[:, :, 0] * 256 + recon[:, : w * ch * 2].reshape(
            h, w * ch, 2)[:, :, 1]
    # 1/2/4-bit (single channel only per spec): unpack MSB-first
    bits = np.unpackbits(recon, axis=1)
    per = bits[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (per * weights).sum(axis=2).astype(np.uint8)


def _decode_subimage(raw: np.ndarray, w: int, h: int, ch: int,
                     depth: int) -> np.ndarray:
    """Filtered scanlines of one (sub)image → (h, w*ch) samples."""
    stride = _scanline_bytes(w, ch, depth)
    bpp = max(1, ch * depth // 8)
    ftypes = raw[:, 0]
    if np.all(ftypes == 0):
        recon = raw[:, 1:].copy()
    elif set(np.unique(ftypes)) <= {0, 2}:
        recon = raw[:, 1:].astype(np.uint8).copy()
        for y in range(1, h):
            if ftypes[y] == 2:
                recon[y] += recon[y - 1]
    else:
        recon = _defilter(raw, h, stride, bpp)
    return _unpack_samples(recon, w, ch, depth)


def _defilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines → (h, stride) reconstructed."""
    ftypes = raw[:, 0]
    lines = raw[:, 1:].astype(np.uint8)
    out = np.zeros((h, stride), np.uint8)
    bad = set(np.unique(ftypes)) - {0, 1, 2, 3, 4}
    if bad:
        raise ValueError(f"invalid PNG filter type(s) {sorted(bad)}")
    for y in range(h):
        f = int(ftypes[y])
        cur = lines[y]
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # up
            out[y] = cur + prev  # uint8 wraparound is the mod-256 spec math
        elif f == 1:  # sub: recon[x] = cur[x] + recon[x-bpp] → cumsum
            lanes = cur.copy()
            for lane in range(bpp):  # mod-256 survives the u64 cumsum+cast
                sl = lanes[lane::bpp]
                lanes[lane::bpp] = np.cumsum(
                    sl.astype(np.uint64)).astype(np.uint8)
            out[y] = lanes
        elif f == 3:  # average: needs left (sequential) + up
            row = np.zeros(stride, np.uint16)
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (int(cur[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
            out[y] = row.astype(np.uint8)
        else:  # 4, paeth
            row = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(cur[x]) + pred) & 0xFF
            out[y] = row.astype(np.uint8)
    return out


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB (see module doc for subset)."""
    data = payload or b""
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + clen
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, …) are skipped
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad IHDR compression/filter {comp}/{filt}")
    if interlace not in (0, 1):
        raise ValueError(f"bad IHDR interlace {interlace}")
    if ctype_i not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {ctype_i}")
    if depth not in _ALLOWED_DEPTHS[ctype_i]:
        raise ValueError(
            f"invalid bit depth {depth} for color type {ctype_i}")
    if w == 0 or h == 0:
        raise ValueError("empty PNG")
    ch = _CHANNELS[ctype_i]
    raw_b = zlib.decompress(bytes(idat))

    if interlace == 0:
        stride = _scanline_bytes(w, ch, depth)
        if len(raw_b) != h * (1 + stride):
            raise ValueError(
                f"PNG data size {len(raw_b)} != expected {h * (1 + stride)}")
        samples = _decode_subimage(
            np.frombuffer(raw_b, np.uint8).reshape(h, 1 + stride),
            w, h, ch, depth)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        buf = np.frombuffer(raw_b, np.uint8)
        samples = np.zeros((h, w * ch),
                           np.uint16 if depth == 16 else np.uint8)
        grid = samples.reshape(h, w, ch)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = _scanline_bytes(pw, ch, depth)
            need = ph * (1 + stride)
            if off + need > len(buf):
                raise ValueError("truncated interlaced PNG pass")
            sub = _decode_subimage(
                buf[off: off + need].reshape(ph, 1 + stride),
                pw, ph, ch, depth)
            off += need
            rows = y0 + dy * np.arange(ph)
            cols = x0 + dx * np.arange(pw)
            grid[np.ix_(rows, cols)] = sub.reshape(ph, pw, ch)
        if off != len(buf):
            raise ValueError("PNG interlaced data size mismatch")

    if depth == 16:  # high byte (the standard 16→8 approximation)
        img = (samples >> 8).astype(np.uint8).reshape(h, w, ch)
    elif depth < 8 and ctype_i == 0:
        # exact grey expansion: 255/(2^d − 1) is an integer for d=1/2/4
        img = (samples * (255 // ((1 << depth) - 1))).astype(
            np.uint8).reshape(h, w, ch)
    else:  # 8-bit samples, or palette indices used verbatim
        img = samples.astype(np.uint8).reshape(h, w, ch)
    if ctype_i == 2:
        rgb = img
    elif ctype_i == 6:
        rgb = img[:, :, :3]
    elif ctype_i == 0:
        rgb = np.repeat(img, 3, axis=2)
    elif ctype_i == 4:
        rgb = np.repeat(img[:, :, :1], 3, axis=2)
    else:  # 3: palette
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = img[:, :, 0]
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
    return np.ascontiguousarray(rgb)
