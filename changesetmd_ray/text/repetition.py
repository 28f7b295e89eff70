"""Within-document repetition features + keep rule — the Gopher-style
repetition filter of a web-scale training-data pipeline (Rae et al.
2021 §A1.1; also used by RefinedWeb / Dolma). Removes boilerplate-heavy
and degenerately repetitive pages BEFORE the cross-document dedup
passes, which is where most of a raw web crawl's junk mass lives.

Reference analogue: none (the reference loads changesets into
Postgres); this belongs to the training-data layer the engine adds on
top, like :mod:`changesetmd_ray.text.analysis`.

Scale shape: a pure per-batch map (no shuffle, no state beyond the
per-actor compiled regex) — embarrassingly parallel over 100 TB. The
per-document loop is Python, like every string stage in this sandbox
(no ML/string kernels available); all n-gram counting inside it is
vectorized numpy over token-hash arrays.

Feature definitions (deterministic; the tests pin them against an
independent driver-side oracle):

- ``dup_line_frac``      — duplicated lines / total lines, where a
  line counts as duplicated on its 2nd+ occurrence (exact match after
  stripping trailing ``\\r``; blank lines excluded).
- ``dup_line_char_frac`` — characters in those 2nd+ occurrences /
  total line characters.
- ``dup_para_frac`` / ``dup_para_char_frac`` — same over paragraphs
  (``\\n\\n+``-separated spans, surrounding whitespace stripped).
- ``top_{n}gram_frac`` (n = 2, 3, 4) — characters covered by the most
  frequent word n-gram / total word characters, where the covered
  mass is ``count × chars(gram)`` and word chars exclude whitespace
  (Gopher's "fraction of characters contained in the most frequently
  occurring n-gram"). A gram occurring only ONCE contributes 0 — a
  unique gram is not repetition, and short documents would otherwise
  trip the thresholds purely by being short (same call as DataTrove's
  GopherRepetitionFilter). Ties break toward the larger mass.
- ``dup_{n}gram_frac`` (n = 5..10) — characters covered by all n-gram
  occurrences that are repeats (2nd+ occurrence of their gram) /
  total word characters, overlap allowed but clipped to 1.0.

``repetition_ok`` applies Gopher's published thresholds (Table A1):
dup_line_frac ≤ 0.30, dup_para_frac ≤ 0.30, dup_line_char_frac ≤ 0.20,
dup_para_char_frac ≤ 0.20, top 2/3/4-gram ≤ 0.20/0.18/0.16, dup
5..10-gram ≤ 0.15/0.14/0.13/0.12/0.11/0.10.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import splitmix64, token_hashes, tokenize

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)
_TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
_DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _ngram_hashes(tok_h: np.ndarray, n: int) -> np.ndarray:
    """uint64 hash per CONSECUTIVE word n-gram (position-sensitive
    splitmix chain — unlike shingle_hashes' rotate-xor, two grams with
    the same tokens in different order hash differently). The chain is
    SEEDED with ``splitmix64(h0)``, not ``h0``: a raw first combine
    ``splitmix64(h0 ^ h1)`` cancels to ``splitmix64(0)`` for every
    identical-token pair, which (a) merged all "x x" grams with all
    "y y" grams inside a document and (b) made them collide across
    per-row SALTED hash spaces in the batched feature kernel."""
    m = len(tok_h) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    acc = splitmix64(tok_h[:m])
    for j in range(1, n):
        acc = splitmix64(acc ^ tok_h[j : j + m])
    return acc


def _dup_fracs(units: list[str]) -> tuple[float, float]:
    """(dup count frac, dup char frac) over exact-match units; a unit
    is duplicated on its 2nd+ occurrence."""
    if not units:
        return 0.0, 0.0
    arr = np.asarray(units, dtype=object)
    lens = np.fromiter((len(u) for u in units), np.int64, len(units))
    _, inv, counts = np.unique(arr, return_inverse=True, return_counts=True)
    # per unique value: count-1 occurrences are "duplicates"
    dup_n = int((counts - 1).sum())
    # char mass of duplicates = (count-1) * len(value); len via first
    # occurrence (all occurrences of a value have equal length)
    first_len = np.zeros(len(counts), np.int64)
    first_len[inv[::-1]] = lens[::-1]  # last write wins → first occurrence
    dup_chars = int(((counts - 1) * first_len).sum())
    total_chars = int(lens.sum())
    return (
        dup_n / len(units),
        dup_chars / total_chars if total_chars else 0.0,
    )


def repetition_features(
    batch: pa.Table, *, text_col: str = "text", with_ok: bool = True
) -> pa.Table:
    """Append the repetition feature columns (+ ``repetition_ok``).

    Gram features are computed BATCH-vectorized: every document's
    token hashes are salted with a per-row value and concatenated, so
    one global ``np.unique`` per n groups within-document grams only
    (equal grams in different rows get different salted hashes), and
    the per-row reductions are ``bincount``/``maximum.at``. Windows
    crossing a document boundary are masked out. Measured 7.0 s →
    ~1.5 s single-thread on 5 k sf0.1 docs vs the per-doc-loop
    version (which paid 45 k tiny splitmix calls + 85 k np.unique)."""
    texts = batch[text_col].to_pylist()
    n_rows = len(texts)
    out: dict[str, np.ndarray] = {
        "dup_line_frac": np.zeros(n_rows),
        "dup_line_char_frac": np.zeros(n_rows),
        "dup_para_frac": np.zeros(n_rows),
        "dup_para_char_frac": np.zeros(n_rows),
    }
    for n in _TOP_NS:
        out[f"top_{n}gram_frac"] = np.zeros(n_rows)
    for n in _DUP_NS:
        out[f"dup_{n}gram_frac"] = np.zeros(n_rows)

    toks_per_doc: list[list[str]] = []
    for i, t in enumerate(texts):
        t = t or ""
        lines = [ln.rstrip("\r") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln.strip()]
        out["dup_line_frac"][i], out["dup_line_char_frac"][i] = _dup_fracs(lines)
        paras = [p.strip() for p in t.split("\n\n")]
        paras = [p for p in paras if p]
        out["dup_para_frac"][i], out["dup_para_char_frac"][i] = _dup_fracs(paras)
        toks_per_doc.append(tokenize(t))

    n_toks = np.fromiter((len(ts) for ts in toks_per_doc), np.int64, n_rows)
    all_toks = [w for ts in toks_per_doc for w in ts]
    if all_toks:
        doc_of_tok = np.repeat(np.arange(n_rows, dtype=np.int64), n_toks)
        # per-row salt: within a row gram equality is preserved
        # (x ↦ splitmix64(x ^ salt) is injective for fixed salt);
        # across rows equal grams hash apart, so the global unique
        # counts per row exactly as the old per-doc unique did
        salt = splitmix64(np.arange(n_rows, dtype=np.uint64))
        tok_h = splitmix64(token_hashes(all_toks) ^ salt[doc_of_tok])
        tok_len = np.fromiter((len(w) for w in all_toks), np.int64,
                              len(all_toks))
        twc = np.bincount(doc_of_tok, weights=tok_len,
                          minlength=n_rows)  # total word chars per row
        cum = np.concatenate([[0], np.cumsum(tok_len)])
        for n in _TOP_NS + _DUP_NS:
            grams = _ngram_hashes(tok_h, n)
            m = len(grams)
            if m == 0:
                continue
            # window must not cross a document boundary
            valid = doc_of_tok[:m] == doc_of_tok[n - 1 : n - 1 + m]
            grams = grams[valid]
            gram_chars = (cum[n:] - cum[:m])[valid]
            doc_idx = doc_of_tok[:m][valid]
            if len(grams) == 0:
                continue
            _, inv, counts = np.unique(
                grams, return_inverse=True, return_counts=True)
            if n in _TOP_NS:
                # mass per unique gram: count × chars (first occurrence;
                # equal-hash ⇒ same tokens so any occurrence's chars do);
                # count-1 grams contribute 0: unique ≠ repetition
                first_chars = np.zeros(len(counts), np.int64)
                first_chars[inv[::-1]] = gram_chars[::-1]
                mass = np.where(counts > 1, counts * first_chars, 0)
                doc_of_gram = np.zeros(len(counts), np.int64)
                doc_of_gram[inv] = doc_idx  # a gram lives in one row
                top = np.zeros(n_rows, np.int64)
                np.maximum.at(top, doc_of_gram, mass)
                np.divide(top, twc, out=out[f"top_{n}gram_frac"],
                          where=twc > 0)
            else:
                dup_occ = counts[inv] > 1
                # 2nd+ occurrences only: drop one occurrence per gram
                # (np.unique's first index is global position order =
                # document order, and a gram belongs to one row)
                first_seen = np.zeros(len(grams), bool)
                first_seen[np.unique(inv, return_index=True)[1]] = True
                rep = dup_occ & ~first_seen
                dup_chars = np.bincount(
                    doc_idx[rep], weights=gram_chars[rep], minlength=n_rows)
                np.divide(dup_chars, twc, out=out[f"dup_{n}gram_frac"],
                          where=twc > 0)
            np.minimum(out[f"{'top' if n in _TOP_NS else 'dup'}_{n}gram_frac"],
                       1.0,
                       out=out[f"{'top' if n in _TOP_NS else 'dup'}_{n}gram_frac"])

    for name, arr in out.items():
        idx = batch.schema.get_field_index(name)
        col = pa.array(arr, pa.float64())
        batch = (
            batch.set_column(idx, name, col) if idx != -1
            else batch.append_column(name, col)
        )
    if with_ok:
        ok = (
            (out["dup_line_frac"] <= 0.30)
            & (out["dup_para_frac"] <= 0.30)
            & (out["dup_line_char_frac"] <= 0.20)
            & (out["dup_para_char_frac"] <= 0.20)
        )
        for n in _TOP_NS:
            ok &= out[f"top_{n}gram_frac"] <= _TOP_THRESHOLDS[n]
        for n in _DUP_NS:
            ok &= out[f"dup_{n}gram_frac"] <= _DUP_THRESHOLDS[n]
        idx = batch.schema.get_field_index("repetition_ok")
        col = pa.array(ok)
        batch = (
            batch.set_column(idx, "repetition_ok", col) if idx != -1
            else batch.append_column("repetition_ok", col)
        )
    return batch


def repetition_filter(ds, *, text_col: str = "text"):
    """Dataset → Dataset keeping only rows that pass the Gopher
    repetition rule (features computed and dropped in-stage; chain
    :func:`repetition_features` directly to keep them)."""
    cols = list(ds.schema().names)

    def fn(batch: pa.Table) -> pa.Table:
        feat = repetition_features(batch, text_col=text_col)
        keep = feat.filter(feat["repetition_ok"])
        return keep.select(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
