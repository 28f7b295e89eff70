"""Perceptual fingerprints + near-duplicate detection for media rows.

Image near-dup is a first-class training-data operator at CC scale:
the same photo recompressed, brightness-shifted or resized must dedup
even though its bytes (and exact payload hash) differ. This module
gives the media table the same two-phase shape the text stack uses:

- :class:`MediaPHash` — actor/task-pool ``map_batches`` stage that
  decodes each payload through the REAL codecs (BMP/PNG/GIF/JPEG,
  stages/codecs.py + png.py + gif.py + jpeg.py), grayscales, box-resizes
  and emits a 64-bit perceptual hash column. Payloads are dropped after
  hashing, so only the thin (id, fp) projection reaches the shuffle.
- :func:`media_phash` / :func:`media_neardup_candidates` — fingerprints,
  then Hamming-≤-t pairs via the generic pigeonhole-banded engine
  (:func:`changesetmd_ray.text.dedup.hamming_candidates`, the exact
  machinery under ``simhash_candidates`` — recall 1.0 w.r.t. the
  fingerprints, no all-pairs).
- :class:`AudioFeatures` — vectorized spectral features (RMS,
  zero-crossing rate, spectral centroid/rolloff via one rFFT) over
  WAV-decoded PCM, the audio-side analog of the image feature stage.

Hash conventions (pinned by tests/test_media_fp.py):

- ``phash64``: luma → 32×32 box-average → orthonormal 2-D DCT-II →
  top-left 8×8 block, bit i set iff coeff i > median of the 63 non-DC
  coefficients (DC participates in the bits but not the median, the
  standard pHash convention — median over AC keeps exactly ~32 bits
  set for natural images, making random-pair Hamming ≈ 32).
- ``dhash64``: luma → 8×9 box-average → bit = left-neighbor gradient
  sign, row-major.

Scale shape: decode cost dominates and parallelizes per block (the
stage is compute-bound, sized like MediaDecodeStub); the banding
exchange moves 8 bytes/row × (t+1) bands. 100 TB of images is ~10 B
rows → the pair stage sees only band-collision groups, same as the
text SimHash path stressed in BASELINE.md.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa


@lru_cache(maxsize=8)
def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix M (n×n): X = M @ x applies the 1-D
    transform; 2-D is M @ img @ M.T. float64, cached per size."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def luma_f64(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → (h, w) float64 ITU-R BT.601 luma."""
    f = img.astype(np.float64)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def box_resize(gray: np.ndarray, height: int, width: int) -> np.ndarray:
    """Area-average (box-filter) resize of a 2-D array to
    (height, width) — the antialiasing downscale perceptual hashes
    need (nearest-neighbor would alias high-frequency texture into
    the hash). Bin edges use the same floor mapping as ``nn_resize``;
    inputs smaller than the target are first nn-upscaled so every bin
    is non-empty. Pure reduceat arithmetic, no Python per-pixel loop."""
    sh, sw = gray.shape
    if sh < height or sw < width:
        from changesetmd_ray.stages.codecs import nn_resize

        gray = nn_resize(gray, max(sw, width), max(sh, height))
        sh, sw = gray.shape
    ye = (np.arange(height + 1, dtype=np.int64) * sh) // height
    xe = (np.arange(width + 1, dtype=np.int64) * sw) // width
    rows = np.add.reduceat(gray, ye[:-1], axis=0)
    cells = np.add.reduceat(rows, xe[:-1], axis=1)
    area = (ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :]
    return cells / area


def phash64(img: np.ndarray) -> np.uint64:
    """DCT perceptual hash of an RGB image (see module docstring for
    the pinned convention). Robust to recompression, ±brightness and
    mild resizing; Hamming distance ≈ 32 for unrelated images."""
    g = box_resize(luma_f64(img), 32, 32)
    m = _dct_mat(32)
    coeffs = (m @ g @ m.T)[:8, :8].reshape(-1)
    med = np.median(coeffs[1:])
    bits = coeffs > med
    return np.uint64(np.packbits(bits).view(">u8")[0])


def dhash64(img: np.ndarray) -> np.uint64:
    """Gradient (difference) hash: 8 rows × 8 horizontal luma
    gradients. Cheaper than pHash, less robust to resizing."""
    g = box_resize(luma_f64(img), 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    return np.uint64(np.packbits(bits).view(">u8")[0])


class MediaPHash:
    """``map_batches`` stage: image payload → 64-bit perceptual hash.

    ``method`` is ``'phash'`` (default) or ``'dhash'``. Non-image rows
    (``media_type != 'image'``) get a null fingerprint and are excluded
    from the near-dup exchange downstream. Decode failures raise under
    ``strict=True`` (the default — silent nulls hide corpus corruption);
    ``strict=False`` nulls them for dirty-crawl tolerance."""

    def __init__(self, *, payload_col: str = "payload", id_col: str = "media_id",
                 type_col: str = "media_type", method: str = "phash",
                 strict: bool = True):
        if method not in ("phash", "dhash"):
            raise ValueError(f"unknown perceptual-hash method {method!r}")
        self.payload_col = payload_col
        self.id_col = id_col
        self.type_col = type_col
        self.hash_fn = phash64 if method == "phash" else dhash64
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from changesetmd_ray.stages.multimodal import _decode_image

        types = (batch[self.type_col].to_pylist()
                 if self.type_col in batch.column_names else ["image"] * len(batch))
        payloads = batch[self.payload_col].to_pylist()
        fps: list[int | None] = []
        for t, p in zip(types, payloads):
            if t != "image" or p is None:
                fps.append(None)
                continue
            try:
                fps.append(int(self.hash_fn(_decode_image(p)).view(np.int64)))
            except Exception:
                if self.strict:
                    raise
                fps.append(None)
        return batch.drop_columns([self.payload_col]).append_column(
            "phash", pa.array(fps, pa.int64())
        )


def media_phash(ds, *, payload_col: str = "payload", id_col: str = "media_id",
                type_col: str = "media_type", method: str = "phash",
                strict: bool = True, batch_size: int = 64, concurrency=None):
    """Media Dataset → (id, ..., phash) with the payload dropped.
    Task pool by default; pass ``concurrency`` for an actor pool when a
    model-backed hasher replaces the codecs (same convention as
    :func:`changesetmd_ray.stages.multimodal.decode_media`)."""
    kwargs = dict(payload_col=payload_col, id_col=id_col, type_col=type_col,
                  method=method, strict=strict)
    if concurrency is None:
        stage = MediaPHash(**kwargs)
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(MediaPHash, fn_constructor_kwargs=kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def media_neardup_candidates(ds, *, id_col: str = "media_id",
                             payload_col: str = "payload",
                             type_col: str = "media_type",
                             method: str = "phash", max_hamming: int = 6,
                             strict: bool = True, batch_size: int = 64,
                             concurrency=None, num_fold_buckets: int = 256,
                             hot_group_limit: int | None = 4096):
    """Near-duplicate image pairs ``(id_a, id_b, hamming)`` with
    perceptual-hash Hamming ≤ ``max_hamming`` — decode+hash stage, then
    the pigeonhole-banded pair engine shared with SimHash. Feed the
    pairs to ``duplicate_clusters`` / ``keep_best`` exactly like the
    text near-dup outputs."""
    from changesetmd_ray.text.dedup import hamming_candidates

    fps = media_phash(ds, payload_col=payload_col, id_col=id_col,
                      type_col=type_col, method=method, strict=strict,
                      batch_size=batch_size, concurrency=concurrency)
    def drop_null_fp(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch["phash"]))

    fps = fps.map_batches(drop_null_fp, batch_format="pyarrow")
    return hamming_candidates(fps, fp_col="phash", id_col=id_col,
                              max_hamming=max_hamming,
                              num_fold_buckets=num_fold_buckets,
                              hot_group_limit=hot_group_limit)


class AudioFeatures:
    """``map_batches`` stage: WAV payload → spectral feature columns.

    Emits per row (nulls for non-audio rows):

    - ``rms`` — root-mean-square amplitude in [0, 1] (÷ 32768)
    - ``zcr`` — zero-crossing rate per sample
    - ``spectral_centroid_hz`` — amplitude-weighted mean frequency of
      the one-sided rFFT magnitude spectrum
    - ``spectral_rolloff_hz`` — lowest frequency below which ``rolloff``
      (default 0.85) of the total magnitude lies

    One vectorized pass per row (np.fft.rfft); silence yields centroid/
    rolloff 0. The real boundary for mp3/flac remains AudioStatsStub's
    ``strict`` raise — this stage consumes the decoded-PCM side."""

    def __init__(self, *, payload_col: str = "payload",
                 type_col: str = "media_type", rolloff: float = 0.85):
        if not 0.0 < rolloff <= 1.0:
            raise ValueError(f"rolloff must be in (0, 1], got {rolloff}")
        self.payload_col = payload_col
        self.type_col = type_col
        self.rolloff = rolloff

    def _features(self, payload: bytes) -> tuple[float, float, float, float]:
        from changesetmd_ray.stages.codecs import wav_decode

        pcm, rate = wav_decode(payload or b"")
        x = pcm.astype(np.float64).reshape(pcm.shape[0], -1).mean(axis=1) / 32768.0
        n = x.shape[0]
        if n == 0:
            return 0.0, 0.0, 0.0, 0.0
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])) / n)
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        total = mag.sum()
        if total <= 0.0:
            return rms, zcr, 0.0, 0.0
        centroid = float((freqs * mag).sum() / total)
        cum = np.cumsum(mag)
        roll = float(freqs[np.searchsorted(cum, self.rolloff * total)])
        return rms, zcr, centroid, roll

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = (batch[self.type_col].to_pylist()
                 if self.type_col in batch.column_names else ["audio"] * len(batch))
        payloads = batch[self.payload_col].to_pylist()
        cols: dict[str, list] = {"rms": [], "zcr": [], "spectral_centroid_hz": [],
                                 "spectral_rolloff_hz": []}
        for t, p in zip(types, payloads):
            if t != "audio" or p is None:
                for v in cols.values():
                    v.append(None)
                continue
            r, z, c, ro = self._features(p)
            cols["rms"].append(r)
            cols["zcr"].append(z)
            cols["spectral_centroid_hz"].append(c)
            cols["spectral_rolloff_hz"].append(ro)
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, pa.float64()))
        return batch


def audio_features(ds, *, payload_col: str = "payload",
                   type_col: str = "media_type", rolloff: float = 0.85,
                   batch_size: int = 64, concurrency=None):
    """Audio Dataset → spectral feature columns (see
    :class:`AudioFeatures`)."""
    kwargs = dict(payload_col=payload_col, type_col=type_col, rolloff=rolloff)
    if concurrency is None:
        stage = AudioFeatures(**kwargs)
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(AudioFeatures, fn_constructor_kwargs=kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def image_quality_stats(img: np.ndarray) -> tuple[float, float, float, float]:
    """(sharpness, brightness, contrast, entropy) of an RGB image —
    the standard curation signals for dropping blurry / blank / low-
    information images:

    - ``sharpness``: variance of the 3×3 Laplacian of the luma (the
      classic blur detector — box-blurred copies score far lower);
    - ``brightness``: mean luma / 255 in [0, 1];
    - ``contrast``: luma standard deviation / 255;
    - ``entropy``: Shannon entropy of the 256-bin luma histogram in
      bits (blank/synthetic fills score near 0, photos 6-8).

    All vectorized numpy; one pass over the pixels."""
    g = luma_f64(img)
    lap = (-4.0 * g[1:-1, 1:-1] + g[:-2, 1:-1] + g[2:, 1:-1]
           + g[1:-1, :-2] + g[1:-1, 2:]) if min(g.shape) >= 3 else np.zeros((1, 1))
    hist = np.bincount(
        np.clip(g, 0, 255).astype(np.uint8).reshape(-1), minlength=256)
    p = hist[hist > 0] / hist.sum()
    return (float(lap.var()), float(g.mean() / 255.0),
            float(g.std() / 255.0), float(-(p * np.log2(p)).sum()))


class ImageQuality:
    """``map_batches`` stage: image payload → quality columns
    (``sharpness, brightness, contrast, entropy``; nulls for non-image
    rows). Same decode/strict conventions as :class:`MediaPHash`."""

    def __init__(self, *, payload_col: str = "payload",
                 type_col: str = "media_type", strict: bool = True):
        self.payload_col = payload_col
        self.type_col = type_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from changesetmd_ray.stages.multimodal import _decode_image

        types = (batch[self.type_col].to_pylist()
                 if self.type_col in batch.column_names else ["image"] * len(batch))
        payloads = batch[self.payload_col].to_pylist()
        cols: dict[str, list] = {"sharpness": [], "brightness": [],
                                 "contrast": [], "entropy": []}
        for t, p in zip(types, payloads):
            if t != "image" or p is None:
                for v in cols.values():
                    v.append(None)
                continue
            try:
                s, b, c, e = image_quality_stats(_decode_image(p))
            except Exception:
                if self.strict:
                    raise
                for v in cols.values():
                    v.append(None)
                continue
            cols["sharpness"].append(s)
            cols["brightness"].append(b)
            cols["contrast"].append(c)
            cols["entropy"].append(e)
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, pa.float64()))
        return batch


def image_quality(ds, *, payload_col: str = "payload",
                  type_col: str = "media_type", strict: bool = True,
                  batch_size: int = 64, concurrency=None):
    """Media Dataset → + image-quality columns (see
    :class:`ImageQuality`); filter downstream with plain expressions
    (e.g. ``sharpness > 30 and 0.05 < brightness < 0.95``)."""
    kwargs = dict(payload_col=payload_col, type_col=type_col, strict=strict)
    if concurrency is None:
        stage = ImageQuality(**kwargs)
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(ImageQuality, fn_constructor_kwargs=kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class MediaStats:
    """Fused decode stage: ONE decode per image emits BOTH the
    perceptual hash and the quality columns — the media-curation
    recipe's hot path is decode-bound, so separate quality and pHash
    stages pay the dominant cost twice. Appends ``phash, sharpness,
    brightness, contrast, entropy`` (nulls for non-image rows), keeps
    the payload (the recipe filters/anti-joins on the appended
    columns and emits original rows)."""

    def __init__(self, *, payload_col: str = "payload",
                 type_col: str = "media_type", method: str = "phash",
                 strict: bool = True):
        if method not in ("phash", "dhash"):
            raise ValueError(f"unknown perceptual-hash method {method!r}")
        self.payload_col = payload_col
        self.type_col = type_col
        self.hash_fn = phash64 if method == "phash" else dhash64
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from changesetmd_ray.stages.multimodal import _decode_image

        types = (batch[self.type_col].to_pylist()
                 if self.type_col in batch.column_names else ["image"] * len(batch))
        payloads = batch[self.payload_col].to_pylist()
        fps: list[int | None] = []
        cols: dict[str, list] = {"sharpness": [], "brightness": [],
                                 "contrast": [], "entropy": []}
        for t, p in zip(types, payloads):
            if t != "image" or p is None:
                fps.append(None)
                for v in cols.values():
                    v.append(None)
                continue
            try:
                img = _decode_image(p)
                fp = int(self.hash_fn(img).view(np.int64))
                s, b, c, e = image_quality_stats(img)
            except Exception:
                if self.strict:
                    raise
                fps.append(None)
                for v in cols.values():
                    v.append(None)
                continue
            fps.append(fp)
            cols["sharpness"].append(s)
            cols["brightness"].append(b)
            cols["contrast"].append(c)
            cols["entropy"].append(e)
        batch = batch.append_column("phash", pa.array(fps, pa.int64()))
        for name, vals in cols.items():
            batch = batch.append_column(name, pa.array(vals, pa.float64()))
        return batch
