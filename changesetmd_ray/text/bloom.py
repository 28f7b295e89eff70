"""Benchmark decontamination via a broadcast Bloom filter — the
standard guard against evaluation-set leakage in a pre-training corpus
(GPT-3 appendix C / Gopher §A2 use 13-gram overlap; Dolma ships the
same design as a Bloom-filter dedup/decontam stage).

Reference analogue: none (training-data layer addition, like
:mod:`changesetmd_ray.text.dedup`).

Scale shape — the asymmetry is the point:

- The CONTAMINATION SOURCE (benchmark/eval sets) is small by nature
  (thousands of documents). ``build_ngram_bloom`` still builds it
  distributed — per-block partial bitmaps OR-folded driver-side (each
  partial is ``m_bits/8`` bytes regardless of row count, so the
  driver collect is #blocks × filter-size, bounded by the SMALL
  side's block count, not its rows).
- The CORPUS (100 TB) is only ever probed: ``ray.put`` the bitmap
  once, ``decontaminate`` reads it inside ``map_batches`` (T3
  broadcast pattern) — a pure per-batch map, no shuffle, no
  per-batch re-ship of the filter.

False positives: standard Bloom bound ((1-e^{-kn/m})^k); with the
default k=4 and m sized at ≥ 16 bits/n-gram it is < 0.3 %, and a hit
only flags a document when ≥ ``threshold`` of its n-grams hit, which
drives the document-level FP rate to ~0 for real thresholds. False
negatives: none (Bloom property) — contaminated documents cannot slip
through. Tests pin both directions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import splitmix64, token_hashes, tokenize


class BloomFilter:
    """Vectorized Bloom filter over uint64 item hashes: a packed
    uint64 bit array + k derived probe positions per item (splitmix64
    re-seeding, so the k probes are independent)."""

    def __init__(self, m_bits: int, k: int = 4, bits: np.ndarray | None = None):
        if m_bits <= 0 or m_bits % 64:
            raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
        if not 1 <= k <= 16:
            raise ValueError(f"k must be in [1, 16], got {k}")
        self.m_bits = m_bits
        self.k = k
        self.bits = (
            np.zeros(m_bits // 64, np.uint64) if bits is None else bits
        )
        if len(self.bits) != m_bits // 64:
            raise ValueError("bits array does not match m_bits")

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(k, n) bit positions for n item hashes."""
        h = np.asarray(hashes, np.uint64)
        pos = np.empty((self.k, len(h)), np.uint64)
        g = h
        for j in range(self.k):
            g = splitmix64(g ^ np.uint64(0xA076_1D64_78BD_642F + j))
            pos[j] = g % np.uint64(self.m_bits)
        return pos

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """bool array: True where ALL k probe bits are set."""
        if len(hashes) == 0:
            return np.empty(0, bool)
        pos = self._positions(hashes)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("cannot merge Bloom filters of different shape")
        self.bits |= other.bits
        return self


def doc_ngram_hashes(text: str, n: int) -> np.ndarray:
    """uint64 hash per consecutive word n-gram (position-sensitive
    splitmix chain; same normalization as the analysis stages). Docs
    shorter than n tokens contribute their whole token sequence as one
    gram, so short benchmark items are still guarded.

    The chain is seeded with ``splitmix64(h0)``: a raw first combine
    ``splitmix64(h0 ^ h1)`` cancels for identical adjacent tokens, so
    any two grams whose first pairs were identical-token pairs and
    whose tails matched would collide — measured as spurious
    decontamination drops on the sf0.001 e2e fixture (same fix as
    ``repetition._ngram_hashes``)."""
    toks = tokenize(text or "")
    if not toks:
        return np.empty(0, np.uint64)
    h = token_hashes(toks)
    m = len(h) - n + 1
    if m <= 0:
        acc = splitmix64(h[:1])
        for j in range(1, len(h)):
            acc = splitmix64(acc ^ h[j : j + 1])
        return acc
    acc = splitmix64(h[:m])
    for j in range(1, n):
        acc = splitmix64(acc ^ h[j : j + m])
    return acc


def build_ngram_bloom(
    ds, *, text_col: str = "text", n: int = 13,
    m_bits: int = 1 << 22, k: int = 4,
):
    """Benchmark set → BloomFilter of its word n-grams, built
    distributed: each block emits one packed partial bitmap row; the
    driver OR-folds them (collect bounded by #blocks × m_bits/8,
    fine for any real benchmark suite — size ``m_bits`` to the SMALL
    side's gram count, ≥ 16 bits per gram)."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        for t in batch[text_col].to_pylist():
            bf.add(doc_ngram_hashes(t, n))
        return pa.table({"bits": pa.array([bf.bits.view(np.int64)],
                                          pa.list_(pa.int64()))})

    out = BloomFilter(m_bits, k)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in b["bits"].to_pylist():
            out.bits |= np.asarray(row, np.int64).view(np.uint64)
    return out


def decontaminate(
    ds, bloom_ref, *, text_col: str = "text", n: int = 13,
    threshold: float = 0.0, keep_contaminated: bool = False,
    concurrency: tuple[int, int] = (1, 8),
):
    """Corpus → corpus with ``contam_frac`` (fraction of the doc's
    n-grams present in the benchmark filter) and ``contaminated``
    (contam_frac > threshold; docs with no n-grams are clean). By
    default contaminated docs are DROPPED; pass
    ``keep_contaminated=True`` to keep all rows flagged instead.

    ``bloom_ref`` is a ``ray.ObjectRef`` from ``ray.put(bloom)`` —
    the filter ships to each task via the object store once, never
    per batch."""
    import ray

    class Probe:
        def __init__(self):
            self.bf: BloomFilter = ray.get(bloom_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            frac = np.zeros(len(texts))
            for i, t in enumerate(texts):
                grams = doc_ngram_hashes(t, n)
                if len(grams):
                    frac[i] = float(self.bf.contains(grams).mean())
            flagged = frac > threshold
            batch = batch.append_column(
                "contam_frac", pa.array(frac, pa.float64())
            ).append_column("contaminated", pa.array(flagged))
            if keep_contaminated:
                return batch
            return batch.filter(pa.array(~flagged)).drop_columns(
                ["contam_frac", "contaminated"]
            )

    return ds.map_batches(Probe, batch_format="pyarrow", concurrency=concurrency)
