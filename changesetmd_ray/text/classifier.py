"""Model-based quality scoring — a fastText-style hashed n-gram linear
classifier (Joulin et al. 2016, arXiv:1607.01759) trained and applied
without ML libraries (north_rule addition; the DCLM/FineWeb-Edu
pipeline archetype: score every document with a small classifier, then
threshold-filter or resample).

Shape:

- **Features**: lowercase word tokens (the shared ``tokenize``) plus
  adjacent-pair bigrams, hashed into ``n_buckets`` via the engine's
  crc32→splitmix64 chain; a document is the MEAN of its feature
  one-hots (fastText's averaged bag with scalar "embeddings" — i.e.
  logistic regression over hashed bag-of-ngrams).
- **Training** (:func:`train_classifier`): driver-side, full-batch
  gradient descent on a BOUNDED labeled sample — deterministic (fixed
  epochs, fixed order, no stochastic shuffling), so retrains are
  reproducible. The labeled set is small by construction (that is the
  point of distillation-style quality classifiers); the CORPUS never
  goes near the driver.
- **Inference** (:func:`classifier_score`): the model (one float64
  weight vector, ≤ a few MB) is ``ray.put`` once and read zero-copy in
  every task; scoring is one gather+segment-mean per batch (T2/T3
  pattern: state loaded once, per-batch work vectorized).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.text.hashing import splitmix64, token_hashes, tokenize

_BIGRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


@dataclass(frozen=True)
class HashedNgramModel:
    """Immutable trained model: ``weights[b]`` is the logit
    contribution of hash bucket ``b``; prediction is
    ``sigmoid(mean_b∈doc weights[b] + bias)``."""

    weights: np.ndarray  # float64 (n_buckets,)
    bias: float
    bigrams: bool = True

    @property
    def n_buckets(self) -> int:
        return len(self.weights)

    def to_arrow(self) -> pa.Table:
        """Serialize to one Arrow table (parquet-friendly model store)."""
        return pa.table(
            {"weights": pa.array(self.weights, pa.float64())},
            metadata={b"bias": repr(float(self.bias)).encode(),
                      b"bigrams": str(int(self.bigrams)).encode()},
        )

    @classmethod
    def from_arrow(cls, tbl: pa.Table) -> "HashedNgramModel":
        md = tbl.schema.metadata or {}
        return cls(
            weights=np.asarray(tbl["weights"].to_numpy(zero_copy_only=False), np.float64),
            bias=float(md.get(b"bias", b"0.0").decode()),
            bigrams=bool(int(md.get(b"bigrams", b"1").decode())),
        )


def _doc_buckets(text: str, n_buckets: int, bigrams: bool) -> np.ndarray:
    """Hashed feature buckets for one document (with repeats — the mean
    weights them naturally)."""
    h = token_hashes(tokenize(text or ""))
    if bigrams and len(h) > 1:
        bg = splitmix64(h[:-1] * _BIGRAM_MIX ^ h[1:])
        h = np.concatenate([h, bg])
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _score_docs(texts: list, model: HashedNgramModel) -> np.ndarray:
    """sigmoid(mean-bucket-weight + bias) per doc; empty docs score
    sigmoid(bias). One gather + one segment mean across the batch."""
    per_doc = [_doc_buckets(t, model.n_buckets, model.bigrams) for t in texts]
    counts = np.fromiter((len(b) for b in per_doc), np.int64, len(per_doc))
    logits = np.full(len(per_doc), model.bias, dtype=np.float64)
    if counts.sum():
        flat = np.concatenate([b for b in per_doc if len(b)])
        sums = np.add.reduceat(
            model.weights[flat],
            np.concatenate([[0], np.cumsum(counts[counts > 0])[:-1]]),
        )
        logits[counts > 0] += sums / counts[counts > 0]
    return 1.0 / (1.0 + np.exp(-logits))


def train_classifier(
    pos_texts: list,
    neg_texts: list,
    *,
    n_buckets: int = 1 << 18,
    bigrams: bool = True,
    epochs: int = 200,
    lr: float = 10.0,
    l2: float = 1e-6,
) -> HashedNgramModel:
    """Deterministic full-batch logistic regression over the hashed
    bag-of-ngrams of a bounded labeled sample. No randomness: zero
    init, fixed epoch count, documents processed in the given order —
    identical inputs produce an identical model."""
    if not pos_texts or not neg_texts:
        raise ValueError("need at least one positive and one negative example")
    docs = [_doc_buckets(t, n_buckets, bigrams) for t in [*pos_texts, *neg_texts]]
    y = np.concatenate(
        [np.ones(len(pos_texts)), np.zeros(len(neg_texts))]
    )
    counts = np.fromiter((len(b) for b in docs), np.int64, len(docs))
    nz = counts > 0
    flat = (
        np.concatenate([b for b in docs if len(b)])
        if counts.sum()
        else np.empty(0, np.int64)
    )
    starts = np.concatenate([[0], np.cumsum(counts[nz])[:-1]]) if nz.any() else np.empty(0, np.int64)
    # per-feature doc weight 1/len(doc): X is row-normalized implicitly
    inv = np.repeat(1.0 / counts[nz], counts[nz]) if nz.any() else np.empty(0)
    doc_of = np.repeat(np.arange(len(docs))[nz], counts[nz]) if nz.any() else np.empty(0, np.int64)

    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    n = float(len(docs))
    for _ in range(epochs):
        logits = np.full(len(docs), b)
        if len(flat):
            logits[nz] += np.add.reduceat(w[flat] * inv, starts) if len(starts) else 0.0
        p = 1.0 / (1.0 + np.exp(-logits))
        resid = (p - y) / n  # dL/dlogit per doc
        if len(flat):
            gw = np.zeros_like(w)
            np.add.at(gw, flat, resid[doc_of] * inv)
            w -= lr * (gw + l2 * w)
        b -= lr * float(resid.sum())
    return HashedNgramModel(weights=w, bias=b, bigrams=bigrams)


class ClassifierScore:
    """Actor stage (T2/T3): the broadcast model is fetched zero-copy
    once per actor in ``__init__``; ``__call__`` scores a batch
    vectorized. Appends ``out_col`` (float64 in (0, 1))."""

    def __init__(self, model_ref, text_col: str = "text", out_col: str = "quality_prob"):
        self.model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = _score_docs(batch[self.text_col].to_pylist(), self.model)
        return batch.append_column(self.out_col, pa.array(scores, pa.float64()))


def classifier_score(
    ds,
    model: HashedNgramModel,
    *,
    text_col: str = "text",
    out_col: str = "quality_prob",
    batch_size: int = 1024,
    concurrency=(1, 8),
):
    """Append the classifier probability to every row. The weight
    vector ships to the cluster ONCE (``ray.put``) and is fetched once
    per ACTOR in ``ClassifierScore.__init__`` — an actor pool, so no
    per-batch ``ray.get``/deserialize of the model."""
    ref = ray.put(model)
    return ds.map_batches(
        ClassifierScore,
        fn_constructor_args=(ref, text_col, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ClassifierFilter(ClassifierScore):
    """Actor-pool threshold filter: score with the once-per-actor model
    and keep rows ≥ ``threshold`` without retaining the score column."""

    def __init__(self, model_ref, threshold: float, text_col: str = "text"):
        super().__init__(model_ref, text_col)
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = _score_docs(batch[self.text_col].to_pylist(), self.model)
        return batch.filter(pa.array(scores >= self.threshold))


def classifier_filter(
    ds,
    model: HashedNgramModel,
    threshold: float,
    *,
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency=(1, 8),
):
    """Keep rows scoring ≥ ``threshold`` — the DCLM-style hard quality
    cut. Score column is not retained (pure filter). Same
    fetch-once-per-actor pattern as :func:`classifier_score`."""
    ref = ray.put(model)
    return ds.map_batches(
        ClassifierFilter,
        fn_constructor_args=(ref, threshold, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
