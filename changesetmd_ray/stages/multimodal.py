"""Multimodal (image/audio/video) column plumbing (north_rule addition).

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, byte size, content hash). The decode / feature-extract
kernels require codec libraries NOT present in this container, so the
codec boundary is STUBBED — either raising ``NotImplementedError``
(``codec='strict'``) or producing a deterministic fake feature vector
derived from the bytes (``codec='fake'``, default, so the Ray-side
plumbing — schema, actor pool, batch sizing, output layout — is real and
testable end-to-end).

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

    ``codec='strict'`` raises ``NotImplementedError`` at the exact line a
    real decoder (PIL / torchaudio / pyav) would be called — the marked
    stub the environment requires. ``codec='fake'`` derives a
    deterministic ``feature`` vector (dim ``feat_dim``) from the payload
    bytes so downstream stages (ANN over features, groupbys) can be
    tested for real.
    """

    def __init__(self, feat_dim: int = 16, codec: str = "fake"):
        self.feat_dim = feat_dim
        self.codec = codec

    def _decode(self, payload: bytes) -> np.ndarray:
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
                 concurrency=(1, 8)):
    """Media Dataset → metadata + feature vectors (payload dropped after
    decode so the big binary column doesn't travel further)."""
    return ds.map_batches(media_metadata, batch_format="pyarrow").map_batches(
        MediaDecodeStub,
        fn_constructor_kwargs={"feat_dim": feat_dim, "codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
