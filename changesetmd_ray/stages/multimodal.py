"""Multimodal (image/audio/video) column plumbing (north_rule addition).

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, byte size, content hash). Three codec modes per stage:

- ``codec='bmp'`` / ``'image'`` / ``'vid1'`` / ``'wav'`` — REAL decode
  paths: uncompressed 24-bit BMP and 16-bit PCM WAV
  (:mod:`changesetmd_ray.stages.codecs`) and, since round 5,
  sequential AND progressive JPEG (:mod:`changesetmd_ray.stages.jpeg`
  — pure-numpy huffman + IDCT, 4:4:4/4:2:0/greyscale/restart
  intervals/SOF2 successive approximation) and full-static-format PNG
  (:mod:`changesetmd_ray.stages.png` — stdlib-zlib DEFLATE, all five
  filters, grey/RGB/palette/alpha, 1-16-bit depths, Adam7
  interlacing) and GIF87a/89a (:mod:`changesetmd_ray.stages.gif` —
  real LZW, animation frames, interlace, transparency). ``'image'``
  sniffs the payload magic (``BM`` → BMP, ``FF D8`` → JPEG, PNG
  signature → PNG, ``GIF8`` → GIF);
  pixels actually decode, resize (nearest-neighbor) and re-encode, and
  features are genuine pixel statistics. VID1 containers parse their
  frame-count/fps header from the bytes; WAV payloads chunk-walk RIFF
  and decode real samples. These need no external libraries and make
  the media pipeline exactly SQL-oracle-able.
- ``codec='strict'`` — raises ``NotImplementedError`` at the exact line
  a general-format decoder (PIL / torchaudio / pyav) would be called;
  the (round-5-shrunk) boundary for formats still undecodable here
  (arithmetic/12-bit JPEG, float/ADPCM WAV, mp4 frame pixels…).
- ``codec='fake'`` — deterministic content-derived fake features, for
  plumbing tests where pixel math is irrelevant.

Scale notes: media batches are large per row, so the stage defaults to a
small ``batch_size`` (SURVEY.md §4.3.3: "large binary payloads need
small batches") and an actor pool (decoder state loads once per actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from changesetmd_ray.text.hashing import splitmix64

# the media-table input contract (what producers actually emit and
# decode_media consumes)
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
    ]
)


def _decode_image(payload: bytes, *, bmp_only: bool = False) -> np.ndarray:
    """Magic-sniffing image decode: BMP, JPEG or PNG → RGB."""
    p = payload or b""
    if not bmp_only and p[:2] == b"\xff\xd8":
        from changesetmd_ray.stages.jpeg import jpeg_decode

        return jpeg_decode(p)
    if not bmp_only and p[:8] == b"\x89PNG\r\n\x1a\n":
        from changesetmd_ray.stages.png import png_decode

        return png_decode(p)
    if not bmp_only and p[:4] == b"GIF8":
        from changesetmd_ray.stages.gif import gif_decode

        return gif_decode(p)
    from changesetmd_ray.stages.codecs import bmp_decode

    return bmp_decode(p)


def media_metadata(batch: pa.Table, *, payload_col: str = "payload") -> pa.Table:
    """Cheap typed metadata without decoding: byte size + stable 64-bit
    content hash (the exact-dedup key for media payloads)."""
    from changesetmd_ray.text.hashing import hash_bytes64

    size = pc.binary_length(batch[payload_col])
    h = np.fromiter(
        (hash_bytes64(p if p is not None else b"") for p in batch[payload_col].to_pylist()),
        np.uint64,
        len(batch),
    )
    return batch.append_column("payload_bytes", pc.cast(size, pa.int64())).append_column(
        "payload_hash", pa.array(h.astype(np.int64), pa.int64())
    )


class MediaDecodeStub:
    """Actor-pool decode/feature stage.

    ``codec='bmp'`` REALLY decodes (24-bit uncompressed BMP,
    stages/codecs.py); ``codec='image'`` additionally sniffs and
    decodes JPEG (sequential + progressive, stages/jpeg.py) and PNG
    (stages/png.py). All emit genuine pixel
    statistics as the feature vector: ``f[0] = (meanR+meanG+meanB)/765`` (overall
    brightness, exactly SQL-reproducible), ``f[1]=width``,
    ``f[2]=height``, ``f[3..5]`` per-channel means / 255, rest zero.
    ``codec='strict'`` raises ``NotImplementedError`` at the exact line
    a general decoder (PIL / torchaudio / pyav) would be called — the
    marked boundary for formats this sandbox can't decode.
    ``codec='fake'`` derives a deterministic fake vector from the bytes
    (plumbing tests).
    """

    def __init__(self, feat_dim: int = 16, codec: str = "fake"):
        if codec == "bmp" and feat_dim < 6:
            raise ValueError("bmp features need feat_dim >= 6")
        self.feat_dim = feat_dim
        self.codec = codec

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.codec in ("bmp", "image"):
            px = _decode_image(payload, bmp_only=self.codec == "bmp")
            h, w, _ = px.shape
            # channel sums are exact ints < 2^53; / (w·h) then the sums'
            # own sum / 765 are single float roundings → bit-equal to
            # the SQL oracle's arithmetic over the planted colors
            means = px.reshape(-1, 3).sum(axis=0, dtype=np.int64) / float(w * h)
            f = np.zeros(self.feat_dim, np.float64)
            f[0] = (means[0] + means[1] + means[2]) / 765.0
            f[1], f[2] = float(w), float(h)
            f[3:6] = means / 255.0
            return f
        if self.codec == "strict":
            # real implementation: PIL.Image.open / av.open / soundfile.read
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "install an image/audio library and replace MediaDecodeStub._decode"
            )
        import zlib

        seeds = splitmix64(
            np.uint64(zlib.crc32(payload or b"")) + np.arange(self.feat_dim, dtype=np.uint64)
        )
        return (seeds.astype(np.float64) / np.float64(2**64)) * 2.0 - 1.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode(p) for p in payloads]) if payloads else np.empty((0, self.feat_dim))
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.feat_dim
        )
        return batch.drop_columns(["payload"]).append_column("feature", arr)


def decode_media(ds, *, feat_dim: int = 16, codec: str = "fake", batch_size: int = 64,
                 concurrency=None):
    """Media Dataset → metadata + feature vectors (payload dropped after
    decode so the big binary column doesn't travel further).

    Default is a TASK pool (the stub's state rebuilds in µs, and
    autoscaling actor pools ramp too slowly to saturate a node on short
    jobs — measured in round 2). Pass ``concurrency=(lo, hi)`` to run
    the actor-pool shape a REAL codec needs (model/codec loaded once
    per actor in ``__init__``)."""
    meta = ds.map_batches(media_metadata, batch_format="pyarrow")
    if concurrency is None:
        stub = MediaDecodeStub(feat_dim=feat_dim, codec=codec)
        return meta.map_batches(
            lambda b: stub(b), batch_format="pyarrow", batch_size=batch_size
        )
    return meta.map_batches(
        MediaDecodeStub,
        fn_constructor_kwargs={"feat_dim": feat_dim, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizeStub:
    """Actor-pool image resize: payload in → payload out with updated
    ``meta_width``/``meta_height``. ``codec='bmp'`` REALLY resizes:
    decode → nearest-neighbor gather → re-encode (stages/codecs.py);
    ``codec='image'`` also handles JPEG (decode → gather →
    deterministic sequential 4:4:4 q90 re-encode, stages/jpeg.py) and
    PNG (decode → gather → filter-0 re-encode, stages/png.py).
    ``strict`` raises where PIL.Image.resize would run for general
    formats; ``fake`` emits a deterministic content-derived payload so
    byte-level downstream tests are real. Non-image rows pass through
    untouched — a resize stage must never disturb audio/video
    payloads."""

    def __init__(self, width: int, height: int, codec: str = "fake"):
        if width < 1 or height < 1:
            raise ValueError(f"target dims must be >= 1, got {width}x{height}")
        self.width = width
        self.height = height
        self.codec = codec

    def _resize(self, payload: bytes) -> bytes:
        if self.codec in ("bmp", "image"):
            from changesetmd_ray.stages.codecs import bmp_encode, nn_resize

            p = payload or b""
            if self.codec == "image" and p[:2] == b"\xff\xd8":
                from changesetmd_ray.stages.jpeg import jpeg_decode, jpeg_encode

                # deterministic re-encode contract: baseline 4:4:4 q90
                return jpeg_encode(
                    nn_resize(jpeg_decode(p), self.width, self.height),
                    quality=90)
            if self.codec == "image" and p[:8] == b"\x89PNG\r\n\x1a\n":
                from changesetmd_ray.stages.png import png_decode, png_encode

                return png_encode(
                    nn_resize(png_decode(p), self.width, self.height))
            if self.codec == "image" and p[:4] == b"GIF8":
                from changesetmd_ray.stages.gif import gif_decode, gif_encode

                # NN gather creates no new colors, so the palette
                # bound (<=256) is preserved by construction
                return gif_encode(
                    nn_resize(gif_decode(p), self.width, self.height))
            return bmp_encode(
                nn_resize(_decode_image(p, bmp_only=True),
                          self.width, self.height))
        if self.codec == "strict":
            # real implementation: PIL.Image.open(payload).resize((w, h))
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "install PIL and replace MediaResizeStub._resize"
            )
        import zlib

        h = int(splitmix64(np.uint64(zlib.crc32(payload or b"")))[()])
        return (
            b"RSZ1"
            + self.width.to_bytes(4, "little")
            + self.height.to_bytes(4, "little")
            + h.to_bytes(8, "little")
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        mtype = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_payload = [
            self._resize(p) if t == "image" else p for t, p in zip(mtype, payloads)
        ]
        w = pa.array(
            [self.width if t == "image" else None for t in mtype], pa.int32()
        )
        h = pa.array(
            [self.height if t == "image" else None for t in mtype], pa.int32()
        )
        # null-safe: a null media_type is NOT an image — fill_null(True)
        # keeps such rows' original metadata instead of letting the null
        # condition null out meta_width/meta_height through if_else
        not_image = pc.fill_null(pc.invert(pc.equal(batch["media_type"], "image")), True)
        cols = {c: batch[c] for c in batch.column_names}
        cols["payload"] = pa.array(out_payload, pa.binary())
        for name, arr in (("meta_width", w), ("meta_height", h)):
            # non-image rows keep their original metadata
            cols[name] = pc.if_else(not_image, batch[name], arr) if name in cols else arr
        return pa.table(cols)


def resize_media(ds, *, width: int, height: int, codec: str = "fake",
                 batch_size: int = 32, concurrency=None):
    """Image rows resized to ``width × height`` (stubbed codec, real
    payload/metadata plumbing); other media types pass through. Task
    pool by default, actor pool on request (see :func:`decode_media`)."""
    if concurrency is None:
        stub = MediaResizeStub(width=width, height=height, codec=codec)
        return ds.map_batches(
            lambda b: stub(b), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        MediaResizeStub,
        fn_constructor_kwargs={"width": width, "height": height, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStub:
    """Actor-pool video frame sampler: one video row → N frame rows
    ``(media_id, frame_idx, ts_ms, payload)``, every ``stride``-th frame
    — the 1→N flatten shape of video preprocessing. ``codec='vid1'``
    REALLY parses the container header for frame count AND per-payload
    fps (stages/codecs.py); ``codec='video'`` additionally sniffs ISO
    BMFF (``ftyp``) and box-walks moov → video trak → mdhd/stts for
    the same facts (stages/codecs.py::mp4_header) — frame PIXEL decode
    stays behind ``strict``, which raises where pyav would demux;
    ``fake`` derives a deterministic frame count from the bytes.
    Non-video rows produce no frames."""

    def __init__(self, stride: int = 2, fps: int = 30, codec: str = "fake"):
        if stride < 1:
            raise ValueError(f"stride must be ≥ 1, got {stride}")
        if fps < 1:
            raise ValueError(f"fps must be ≥ 1, got {fps}")
        self.stride = stride
        self.fps = fps
        self.codec = codec

    def _frames_fps(self, payload: bytes) -> tuple[int, int]:
        if self.codec in ("vid1", "video"):
            from changesetmd_ray.stages.codecs import mp4_header, vid1_header

            p = payload or b""
            if self.codec == "video" and len(p) >= 8 and p[4:8] == b"ftyp":
                return mp4_header(p)  # real ISO BMFF box walk
            if self.codec == "video" and p[:4] == b"GIF8":
                # animated GIF as a video row: frame count + fps from
                # the header-only walk (no LZW decode)
                from changesetmd_ray.stages.gif import gif_frame_count

                n, delays = gif_frame_count(p)
                nonzero = [d for d in delays if d > 0]
                fps = (round(100 * len(nonzero) / sum(nonzero))
                       if nonzero else self.fps)
                return n, max(1, fps)
            return vid1_header(p)
        if self.codec == "strict":
            # real implementation: av.open(BytesIO(payload)) demux/decode
            raise NotImplementedError(
                "video codecs are not available in this environment; "
                "install pyav and replace FrameSampleStub"
            )
        import zlib

        # int() BEFORE the mod: np.uint64 % python-int promotes to
        # float64 and zeroes the low bits (every count collapsed to 1)
        return 1 + int(splitmix64(np.uint64(zlib.crc32(payload or b"")))[()]) % 64, self.fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids = batch["media_id"].to_pylist()
        mtype = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_idx, out_ts, out_pl = [], [], [], []
        for mid, t, p in zip(mids, mtype, payloads):
            if t != "video":
                continue
            n, fps = self._frames_fps(p)
            for f in range(0, n, self.stride):
                out_id.append(mid)
                out_idx.append(f)
                out_ts.append(int(f * 1000 / fps))
                out_pl.append(b"FRM1" + int(f).to_bytes(4, "little") + (p or b"")[:8])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "ts_ms": pa.array(out_ts, pa.int64()),
                "payload": pa.array(out_pl, pa.binary()),
            }
        )


def sample_frames(ds, *, stride: int = 2, fps: int = 30, codec: str = "fake",
                  batch_size: int = 16, concurrency=None):
    """Video Dataset → sampled frame rows (1→N flatten; stubbed codec,
    real plumbing). Small batches: video payloads are the largest media
    rows (SURVEY.md §4.3.3). Task pool by default, actor pool on
    request (see :func:`decode_media`)."""
    if concurrency is None:
        stub = FrameSampleStub(stride=stride, fps=fps, codec=codec)
        return ds.map_batches(
            lambda b: stub(b), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={"stride": stride, "fps": fps, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioStatsStub:
    """Audio analysis stage: one audio row → PCM stats
    ``(n_samples, sample_rate, duration_ms, mean_abs)``.
    ``codec='wav'`` REALLY parses RIFF/WAVE and decodes 16-bit PCM
    (stages/codecs.py::wav_decode) — the stats are genuine sample
    math, exactly SQL-reproducible for planted PCM (``mean_abs / 32768``
    divides by a power of two, so no float32 rounding dance is
    needed); ``strict`` raises where soundfile/torchaudio would run;
    ``fake`` derives deterministic stats from the bytes. Non-audio
    rows pass through with null stats."""

    def __init__(self, codec: str = "fake"):
        self.codec = codec

    def _stats(self, payload: bytes) -> tuple[int, int, float]:
        if self.codec == "wav":
            from changesetmd_ray.stages.codecs import wav_decode

            pcm, rate = wav_decode(payload or b"")
            n = pcm.shape[0]
            # exact: |int16| sums are < 2^53, one float division
            mean_abs = float(np.abs(pcm.astype(np.int64)).sum()
                             / (pcm.size or 1))
            return n, rate, mean_abs
        if self.codec == "strict":
            # real implementation: soundfile.read(BytesIO(payload))
            raise NotImplementedError(
                "audio codecs are not available in this environment; "
                "install soundfile and replace AudioStatsStub._stats"
            )
        import zlib

        h = splitmix64(np.uint64(zlib.crc32(payload or b"")))
        return 1 + int(h[()]) % 100000, 16000, float(int(h[()]) % 32768)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mtype = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        n_s, rate, dur, mean_abs = [], [], [], []
        for t, p in zip(mtype, payloads):
            if t != "audio":
                n_s.append(None); rate.append(None)
                dur.append(None); mean_abs.append(None)
                continue
            n, r, m = self._stats(p)
            n_s.append(n)
            rate.append(r)
            dur.append(n * 1000 // r)
            mean_abs.append(m)
        return (batch.append_column("n_samples", pa.array(n_s, pa.int64()))
                     .append_column("sample_rate", pa.array(rate, pa.int64()))
                     .append_column("duration_ms", pa.array(dur, pa.int64()))
                     .append_column("mean_abs", pa.array(mean_abs, pa.float64())))


def audio_stats(ds, *, codec: str = "fake", batch_size: int = 64,
                concurrency=None):
    """Audio Dataset → PCM statistics columns (real WAV parse under
    ``codec='wav'``). Task pool by default, actor pool on request (see
    :func:`decode_media`)."""
    if concurrency is None:
        stub = AudioStatsStub(codec=codec)
        return ds.map_batches(
            lambda b: stub(b), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        AudioStatsStub,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
