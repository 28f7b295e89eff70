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
    the same tokens in different order hash differently)."""
    m = len(tok_h) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    acc = tok_h[:m].copy()
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
    """Append the repetition feature columns (+ ``repetition_ok``)."""
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

    for i, t in enumerate(texts):
        t = t or ""
        lines = [ln.rstrip("\r") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln.strip()]
        out["dup_line_frac"][i], out["dup_line_char_frac"][i] = _dup_fracs(lines)
        paras = [p.strip() for p in t.split("\n\n")]
        paras = [p for p in paras if p]
        out["dup_para_frac"][i], out["dup_para_char_frac"][i] = _dup_fracs(paras)

        toks = tokenize(t)
        if not toks:
            continue
        tok_h = token_hashes(toks)
        tok_len = np.fromiter((len(w) for w in toks), np.int64, len(toks))
        total_word_chars = int(tok_len.sum())
        if total_word_chars == 0:
            continue
        # chars(gram at position p) = cumulative token-length window
        cum = np.concatenate([[0], np.cumsum(tok_len)])
        for n in _TOP_NS + _DUP_NS:
            m = len(toks) - n + 1
            if m <= 0:
                continue
            grams = _ngram_hashes(tok_h, n)
            gram_chars = cum[n:] - cum[:m]  # window char sums
            _, inv, counts = np.unique(grams, return_inverse=True, return_counts=True)
            if n in _TOP_NS:
                # mass of the most frequent gram: count × chars(gram);
                # chars via any occurrence (equal-hash ⇒ same tokens)
                first_chars = np.zeros(len(counts), np.int64)
                first_chars[inv[::-1]] = gram_chars[::-1]
                # count-1 grams contribute 0: unique ≠ repetition
                mass = np.where(counts > 1, counts * first_chars, 0)
                out[f"top_{n}gram_frac"][i] = min(
                    1.0, int(mass.max()) / total_word_chars
                )
            else:
                dup_occ = counts[inv] > 1
                # 2nd+ occurrences only: drop one occurrence per gram
                first_seen = np.zeros(len(grams), bool)
                first_seen[np.unique(inv, return_index=True)[1]] = True
                rep = dup_occ & ~first_seen
                out[f"dup_{n}gram_frac"][i] = min(
                    1.0, int(gram_chars[rep].sum()) / total_word_chars
                )

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
