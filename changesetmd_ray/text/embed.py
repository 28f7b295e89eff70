"""Deterministic document embeddings from raw text — the encoder stage
of the embedding-based curation ops (SemDeDup, ANN, embedding near-dup)
so the whole path runs self-contained from a text column.

``HashedEmbedder`` is signed feature hashing (Weinberger et al.,
arXiv:0902.2206) over token counts, projected to ``dim`` with a SEEDED
on-the-fly Gaussian random matrix (Johnson-Lindenstrauss; rows are
derived from splitmix64 streams per feature index, so the full
``n_features × dim`` matrix never materializes), then L2-normalized.
Properties the tests pin:

- deterministic and layout-invariant: a document's vector depends only
  on its text and the (seed, dim, n_features) config — never on batch
  composition (per-doc independent math);
- cosine tracks lexical overlap: near-duplicate documents score far
  above unrelated ones (the signal SemDeDup/embedding-neardup consume);
- unit norm (empty/whitespace docs get the zero vector).

A real neural encoder (sentence-transformers et al.) swaps in at
exactly this stage boundary: same (text → fixed-size ``list<float32>``)
contract, same actor-pool ``map_batches`` shape with the model loaded
once per actor in ``__init__``.

Scale shape: one vectorized pass per batch — token hashing reuses the
engine's crc32→splitmix kernel, per-(doc, feature) counts come from ONE
``np.unique`` over packed keys, and the projection touches only the
batch's DISTINCT features (generated Box-Muller from hash streams, then
a single dense (entries × dim) scatter-add). No shuffle; the stage
fuses with its neighbors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import splitmix64, token_hashes, tokenize


def _gaussian_rows(feats: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """(len(feats), dim) float64 Gaussian projection rows, derived
    deterministically from the feature indices: two splitmix64 uniform
    streams → Box-Muller. Only the DISTINCT features of a batch pay."""
    base = splitmix64(
        feats[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ np.uint64(seed)
    )
    idx = np.arange(dim, dtype=np.uint64)[None, :]
    u1 = splitmix64(base + idx).astype(np.float64) / 2.0**64
    u2 = splitmix64(base ^ (idx + np.uint64(0xD1B54A32D192ED03))).astype(
        np.float64) / 2.0**64
    # keep u1 off the log(0) singularity
    u1 = np.maximum(u1, 1.0 / 2.0**64)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


class HashedEmbedder:
    """``map_batches`` stage: ``text_col`` → ``out_col`` fixed-size
    ``list<float32>[dim]`` (see module docstring)."""

    def __init__(self, *, dim: int = 64, n_features: int = 1 << 18,
                 seed: int = 7, text_col: str = "text",
                 out_col: str = "embedding"):
        from changesetmd_ray.text.hashing import check_pow2

        check_pow2(n_features, "n_features")
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        self.dim = dim
        self.n_features = n_features
        self.seed = seed
        self.text_col = text_col
        self.out_col = out_col

    def _embed(self, texts: list) -> np.ndarray:
        n = len(texts)
        emb = np.zeros((n, self.dim), np.float64)
        th: list[np.ndarray] = []
        doc_of: list[np.ndarray] = []
        for i, t in enumerate(texts):
            h = token_hashes(tokenize(t or ""))
            if len(h):
                th.append(h)
                doc_of.append(np.full(len(h), i, np.int64))
        if not th:
            return emb
        h = np.concatenate(th)
        d = np.concatenate(doc_of)
        feat = (h & np.uint64(self.n_features - 1)).astype(np.int64)
        sign = np.where((h >> np.uint64(62)) & np.uint64(1), -1.0, 1.0)
        # per-(doc, feature, sign) counts in ONE unique over packed keys
        key = (d * self.n_features + feat) * 2 + (sign > 0)
        uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        u_sign = np.where(uk % 2 == 1, 1.0, -1.0)
        u_feat = (uk // 2) % self.n_features
        u_doc = uk // (2 * self.n_features)
        # sublinear tf, the classic BoW damping
        w = u_sign * np.log1p(cnt.astype(np.float64))
        uf, fpos = np.unique(u_feat, return_inverse=True)
        proj = _gaussian_rows(uf.astype(np.uint64), self.dim, self.seed)
        np.add.at(emb, u_doc, w[:, None] * proj[fpos])
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        np.divide(emb, norm, out=emb, where=norm > 0)
        return emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self._embed(batch[self.text_col].to_pylist())
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.astype(np.float32).reshape(-1), pa.float32()), self.dim
        )
        return batch.append_column(self.out_col, arr)


def embed_documents(ds, *, dim: int = 64, n_features: int = 1 << 18,
                    seed: int = 7, text_col: str = "text",
                    out_col: str = "embedding", batch_size: int = 256,
                    concurrency=None):
    """Document Dataset → + ``out_col`` embedding column. Task pool by
    default; pass ``concurrency`` for an actor pool when a real model
    replaces the hashed encoder (load in ``__init__``, once per
    actor)."""
    kwargs = dict(dim=dim, n_features=n_features, seed=seed,
                  text_col=text_col, out_col=out_col)
    if concurrency is None:
        stage = HashedEmbedder(**kwargs)
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(HashedEmbedder, fn_constructor_kwargs=kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
