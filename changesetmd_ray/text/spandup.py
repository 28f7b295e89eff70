"""Exact-substring (span) deduplication — the Lee et al. 2021 step
("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): long token spans that repeat ACROSS the corpus
(licenses, quoted articles, templated passages) are cut out of the
documents that carry them, leaving the surrounding unique prose.

The paper builds a corpus-wide suffix array — inherently a
single-machine memory-bound structure. The distributed approximation
here is winnowed rolling fingerprints (Schleimer et al. 2003, the
MOSS scheme): hash every ``w``-token window (the engine's rotate-xor
:func:`~changesetmd_ray.text.hashing.shingle_hashes` kernel), then in
every run of ``winnow_k`` consecutive window hashes keep the minimum
as a fingerprint. Winnowing is ALIGNMENT-ROBUST: two copies of any
span of ≥ ``w + winnow_k − 1`` tokens are guaranteed to share at
least one fingerprint no matter how the copies are positioned, so
sampling misses nothing above the guarantee threshold — the property
positional striding lacks.

Semantics (documented approximation vs the suffix array):

- A shared fingerprint marks its ``w``-token window for removal; the
  cut therefore covers the CORE of each duplicated span and may leave
  fringes of up to ``w − 1`` tokens on each side. Overlapping marked
  windows merge into one cut.
- ``keep="none"`` removes every occurrence; ``keep="first"`` skips
  cutting the occurrence at the globally minimal ``(id, position)``
  per fingerprint — for block duplicates (the common case) one copy
  survives intact, though a winner doc keeps a span only if it wins
  every fingerprint covering it (per-hash winners, exact global
  resolution would need a second exchange).

Scale shape: identical to :mod:`changesetmd_ray.text.linedup`, whose
generic :func:`~changesetmd_ray.text.linedup.duplicated_hashes`
counting exchange this module reuses — per-block combined partials on
the thin list-packed exchange (fingerprints, never text), then a
map-only broadcast cut below ``broadcast_limit`` duplicated
fingerprints and an exploded thin probe + single payload join above
it. The reference (a per-record XML loader) has no counterpart; this
is a training-data-layer operator.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.text.hashing import (
    TOKEN_RE,
    shingle_hashes,
    token_hashes64,
)
from changesetmd_ray.text.linedup import duplicated_hashes


def _doc_tokens(text: str):
    """(token_hash uint64[], start int64[], end int64[]) with char
    offsets into the ORIGINAL text (hashing lowercases, offsets
    don't)."""
    starts: list[int] = []
    ends: list[int] = []
    toks: list[str] = []
    for m in TOKEN_RE.finditer(text or ""):
        starts.append(m.start())
        ends.append(m.end())
        toks.append(m.group(0).lower())
    # 64-bit digest token hashes, NOT the crc32→splitmix chain: span
    # dedup deletes content on fingerprint equality, so fingerprints
    # need real collision resistance (hashing.py::token_hashes64)
    return (
        token_hashes64(toks),
        np.asarray(starts, np.int64),
        np.asarray(ends, np.int64),
    )


def _winnow(win_h: np.ndarray, k: int) -> np.ndarray:
    """Positions of winnowing fingerprints: the (leftmost) argmin of
    every k-run of window hashes, deduplicated. k=1 keeps every
    window."""
    m = len(win_h)
    if m == 0:
        return np.empty(0, np.int64)
    if m <= k or k <= 1:
        return (
            np.arange(m, dtype=np.int64) if k <= 1
            else np.array([int(win_h.argmin())], np.int64)
        )
    sw = np.lib.stride_tricks.sliding_window_view(win_h, k)
    pos = sw.argmin(axis=1) + np.arange(m - k + 1, dtype=np.int64)
    return np.unique(pos)


def _doc_windows(text: str, w: int, k: int):
    """One tokenize+winnow pass per doc → (fingerprint uint64[],
    token position int64[], cut_start char int64[], cut_end char
    int64[]) — the single definition of the window-coverage rule
    (window at token p covers tokens [p, p+w), clamped so the sub-w
    whole-doc shingle covers everything), shared by the count, mark
    and explode phases so the regimes cannot diverge."""
    tok_h, t_start, t_end = _doc_tokens(text)
    win = shingle_hashes(tok_h, w)
    pos = _winnow(win, k)
    if len(t_start) == 0:
        z = np.zeros(len(pos), np.int64)
        return win[pos], pos, z, z
    last = np.minimum(pos + w - 1, len(t_start) - 1)
    return win[pos], pos, t_start[pos], t_end[last]


def _fingerprints(text: str, w: int, k: int):
    """(fingerprint uint64[], token position int64[]) for one doc.
    Docs shorter than ``w`` tokens emit their whole-sequence shingle
    at position 0 (so short exact dups still count)."""
    fp, pos, _, _ = _doc_windows(text, w, k)
    return fp, pos


def duplicated_fingerprints(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 50,
    winnow_k: int = 8,
    min_count: int = 2,
    num_buckets: int = 64,
):
    """Dataset of ``(h, n, min_id, min_seq)`` over winnowed window
    fingerprints (``seq`` = token position of the window start)."""
    return duplicated_hashes(
        ds, lambda t: _fingerprints(t, w, winnow_k),
        text_col=text_col, id_col=id_col, min_count=min_count,
        num_buckets=num_buckets,
    )


def _cut_spans(text: str, starts: np.ndarray, ends: np.ndarray) -> tuple[str, int, int]:
    """Remove the (merged) char ranges from text → (new_text, n_cuts,
    chars_removed). Ranges must be within the text."""
    if len(starts) == 0:
        return text, 0, 0
    order = np.argsort(starts)
    s, e = starts[order], ends[order]
    merged: list[list[int]] = [[int(s[0]), int(e[0])]]
    for i in range(1, len(s)):
        if int(s[i]) <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], int(e[i]))
        else:
            merged.append([int(s[i]), int(e[i])])
    pieces = []
    prev = 0
    removed = 0
    for a, b in merged:
        pieces.append(text[prev:a])
        removed += b - a
        prev = b
    pieces.append(text[prev:])
    return "".join(pieces), len(merged), removed


def _mark_doc(text: str, doc_id: int, dup, w: int, k: int, keep: str):
    """Char ranges of this doc's duplicated windows → (starts, ends)."""
    h_sorted, win_id, win_seq = dup
    fp, pos, cs, ce = _doc_windows(text, w, k)
    if len(h_sorted) == 0 or len(fp) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    at = np.searchsorted(h_sorted, fp)
    at_c = np.minimum(at, len(h_sorted) - 1)
    hit = h_sorted[at_c] == fp
    if keep == "first":
        winner = (win_id[at_c] == doc_id) & (win_seq[at_c] == pos)
        hit &= ~winner
    return cs[hit], ce[hit]


class _CutDocs:
    """Task-map span cutter; the broadcast state (sorted fingerprint
    array + winners) resolves lazily per worker, zero-copy."""

    def __init__(self, dup_ref, text_col, id_col, w, k, keep, with_stats):
        self._ref = dup_ref
        self.dup = None
        self.text_col = text_col
        self.id_col = id_col
        self.w = w
        self.k = k
        self.keep = keep
        self.with_stats = with_stats

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.dup is None:
            self.dup = (
                ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef)
                else self._ref
            )
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out: list[str] = []
        n_cuts = np.empty(len(texts), np.int64)
        n_chars = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            s, e = _mark_doc(t, int(ids[i]), self.dup, self.w, self.k,
                             self.keep)
            new, c, r = _cut_spans(t, s, e)
            out.append(new)
            n_cuts[i] = c
            n_chars[i] = r
        res = batch.set_column(
            batch.schema.get_field_index(self.text_col),
            self.text_col, pa.array(out, pa.string()),
        )
        if self.with_stats:
            res = res.append_column("n_cuts", pa.array(n_cuts)).append_column(
                "chars_removed", pa.array(n_chars))
        return res


def span_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 50,
    winnow_k: int = 8,
    min_count: int = 2,
    keep: str = "none",
    with_stats: bool = False,
    broadcast_limit: int = 16_000_000,
    num_buckets: int = 64,
):
    """Corpus → corpus with duplicated ≥``w + winnow_k − 1``-token
    spans cut out. See the module docstring for guarantees and the
    regime split. Two passes over the input lineage — snapshot
    upstream if it is transform-heavy."""
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    dup_ds = duplicated_fingerprints(
        ds, text_col=text_col, id_col=id_col, w=w, winnow_k=winnow_k,
        min_count=min_count, num_buckets=num_buckets,
    ).materialize()  # thin: one row per DUPLICATED fingerprint
    n_dup = dup_ds.count()
    if n_dup > broadcast_limit:
        return _span_dedup_distributed(
            ds, dup_ds, text_col=text_col, id_col=id_col, w=w, k=winnow_k,
            keep=keep, with_stats=with_stats, num_buckets=num_buckets,
        )
    tabs = [
        t for t in ray.get(dup_ds.to_arrow_refs())
        if len(t) and "h" in t.schema.names
    ]
    if tabs:
        allt = pa.concat_tables(tabs)
        h = allt["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(h)
        empty = np.empty(0, np.int64)
        dup = (
            h[order],
            # keep='none' never reads winners — don't ship them
            allt["min_id"].to_numpy(zero_copy_only=False)[order]
            if keep == "first" else empty,
            allt["min_seq"].to_numpy(zero_copy_only=False)[order]
            if keep == "first" else empty,
        )
    else:
        dup = (np.empty(0, np.uint64), np.empty(0, np.int64),
               np.empty(0, np.int64))
    ref = ray.put(dup)
    cutter = _CutDocs(ref, text_col, id_col, w, winnow_k, keep, with_stats)
    return ds.map_batches(cutter, batch_format="pyarrow")


def _span_dedup_distributed(
    ds, dup_ds, *, text_col, id_col, w, k, keep, with_stats, num_buckets,
):
    """Above-limit regime: explode docs to THIN fingerprint rows,
    probe the dup Dataset per bucket (hash-only exchange), collect the
    surviving cut ranges per doc as a packed list (materialized: it is
    thin and consumed twice), and apply them in ONE payload join.
    Document text rides one all-to-all in that join; the untouched
    complement flows through a membership anti-join, which is map-only
    while the cut-doc id set fits its broadcast gate and becomes a
    second payload exchange above it."""
    import pyarrow.compute as pc

    from changesetmd_ray.joins.equi import hash_join
    from changesetmd_ray.stages.exchange import flat_np, pack_by_bucket
    from changesetmd_ray.text.hashing import check_pow2

    check_pow2(num_buckets)

    PACKED = [
        ("__id", pa.int64()), ("__seq", pa.int64()), ("__uh", pa.int64()),
        ("__cs", pa.int64()), ("__ce", pa.int64()),
        ("h", pa.int64()), ("min_id", pa.int64()), ("min_seq", pa.int64()),
    ]

    def conform(b: pa.Table) -> pa.Table:
        cols = {"__b": b["__b"]}
        for n, t in PACKED:
            cols[n] = (
                b[n] if n in b.schema.names
                else pa.nulls(len(b), pa.list_(t))
            )
        return pa.table(cols)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        id_r, sq_r, h_r, cs_r, ce_r = [], [], [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            fp, pos, cs, ce = _doc_windows(t or "", w, k)
            id_r.append(np.full(len(fp), ids[i], np.int64))
            sq_r.append(pos)
            h_r.append(fp.view(np.int64))
            cs_r.append(cs)
            ce_r.append(ce)
        cat = (lambda xs, d: np.concatenate(xs) if xs else np.empty(0, d))
        h = cat(h_r, np.int64)
        t = pa.table(
            {
                "__b": pa.array(
                    (h.view(np.uint64) & np.uint64(num_buckets - 1)
                     ).astype(np.int64)),
                "__id": pa.array(cat(id_r, np.int64)),
                "__seq": pa.array(cat(sq_r, np.int64)),
                "__uh": pa.array(h),
                "__cs": pa.array(cat(cs_r, np.int64)),
                "__ce": pa.array(cat(ce_r, np.int64)),
            }
        )
        return conform(pack_by_bucket(
            t, "__b", ["__id", "__seq", "__uh", "__cs", "__ce"]))

    def bucket_dup(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        t = batch.append_column(
            "__b", pa.array(
                (h.view(np.uint64) & np.uint64(num_buckets - 1)
                 ).astype(np.int64)),
        )
        return conform(pack_by_bucket(t, "__b", ["h", "min_id", "min_seq"]))

    def fnp(rows, c):
        return flat_np(rows, c) if len(rows) else np.empty(0, np.int64)

    def probe(group: pa.Table) -> pa.Table:
        dup_mask = pc.is_valid(group["h"])
        d_rows = group.filter(dup_mask)
        u_rows = group.filter(pc.invert(dup_mask))
        dh = fnp(d_rows, "h").view(np.uint64)
        di = fnp(d_rows, "min_id")
        dsq = fnp(d_rows, "min_seq")
        order = np.argsort(dh)
        dh, di, dsq = dh[order], di[order], dsq[order]
        uh = fnp(u_rows, "__uh").view(np.uint64)
        ids = fnp(u_rows, "__id")
        seqs = fnp(u_rows, "__seq")
        cs = fnp(u_rows, "__cs")
        ce = fnp(u_rows, "__ce")
        at = np.searchsorted(dh, uh)
        at_c = np.minimum(at, max(len(dh) - 1, 0))
        hit = (dh[at_c] == uh) if len(dh) else np.zeros(len(uh), bool)
        if keep == "first" and len(dh):
            winner = (di[at_c] == ids) & (dsq[at_c] == seqs)
            hit &= ~winner
        return pa.table(
            {
                "__id": pa.array(ids[hit]),
                "__cs": pa.array(cs[hit]),
                "__ce": pa.array(ce[hit]),
            }
        )

    marked = (
        ds.map_batches(explode, batch_format="pyarrow")
        .union(dup_ds.map_batches(bucket_dup, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(probe, batch_format="pyarrow")
    )

    # per-doc cut lists, packed: rows = docs WITH at least one cut
    def pack_doc(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__rid": pa.array([group["__id"][0].as_py()], pa.int64()),
                "cs": pa.array(
                    [group["__cs"].to_pylist()], pa.list_(pa.int64())),
                "ce": pa.array(
                    [group["__ce"].to_pylist()], pa.list_(pa.int64())),
            }
        )

    # thin (one row per cut doc) and consumed TWICE (payload join +
    # untouched-doc anti-join): snapshot so the explode/probe lineage
    # does not execute a second time
    cuts = marked.groupby("__id").map_groups(
        pack_doc, batch_format="pyarrow").materialize()

    all_cols = list(ds.schema().names)
    joined = hash_join(
        ds, cuts, left_on=id_col, right_on="__rid",
        left_cols=all_cols, right_cols=["cs", "ce"],
    )

    def apply_cuts(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        cs = batch["cs"].to_pylist()
        ce = batch["ce"].to_pylist()
        out, nc, nr = [], [], []
        for t, s, e in zip(texts, cs, ce):
            new, c, r = _cut_spans(
                t or "",
                np.asarray(s or [], np.int64), np.asarray(e or [], np.int64),
            )
            out.append(new)
            nc.append(c)
            nr.append(r)
        res = batch.set_column(
            batch.schema.get_field_index(text_col), text_col,
            pa.array(out, pa.string()),
        ).drop_columns(["cs", "ce", "__rid"])
        if with_stats:
            res = res.append_column(
                "n_cuts", pa.array(nc, pa.int64())).append_column(
                "chars_removed", pa.array(nr, pa.int64()))
        return res

    cut_docs = joined.map_batches(apply_cuts, batch_format="pyarrow")

    # docs with NO cuts never joined — union them back untouched
    from changesetmd_ray.joins.broadcast import anti_join

    untouched = anti_join(
        ds, cuts, big_on=id_col, small_on="__rid")
    if with_stats:
        def zero_stats(batch: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(len(batch), np.int64))
            return batch.append_column("n_cuts", z).append_column(
                "chars_removed", z)

        untouched = untouched.map_batches(zero_stats, batch_format="pyarrow")
    return cut_docs.union(untouched)
