"""Cross-document line/paragraph deduplication — the CCNet/Dolma
preprocessing step (Wenzek et al. 2019, arXiv:1911.00359 §3.1;
Dolma's paragraph dedup): hash every line (or paragraph) of every
document, count occurrences CORPUS-WIDE, and remove the units that
repeat — navigation chrome, cookie banners, boilerplate footers —
while leaving each document's unique prose intact.

The reference has no corpus-level text operator (it is a per-record
XML loader, changesetmd.py:208-271); this is a training-data-layer
addition alongside :mod:`changesetmd_ray.text.dedup` (whole-document
dedup) and :mod:`changesetmd_ray.text.repetition` (WITHIN-document
repetition): here the unit is a line and the scope is the corpus.

Policies (both deterministic and layout-invariant):

- ``keep="none"`` (default): every occurrence of a unit whose
  corpus-wide count ≥ ``min_count`` is dropped — the
  boilerplate-removal semantics (a paragraph seen on 40 k pages
  should survive on none of them).
- ``keep="first"``: the single globally-first occurrence (minimal
  ``(id, seq)``) survives — CCNet's hash-set streaming semantics made
  deterministic. Requires an integer ``id_col``.

Scale shape (the 100-TB contract):

- **Counting is one thin exchange.** Per-block partials (one row per
  distinct unit hash per block: ``(hash, count, min_id, min_seq)``)
  ride the list-packed bucket exchange; unit TEXT never shuffles and
  per-occurrence rows never exist off-worker.
- **Filtering is map-only below ``broadcast_limit``** duplicated
  hashes: the dup set ships once via ``ray.put`` (sorted uint64 array
  + winner arrays for ``keep="first"``) and every batch rebuilds its
  docs in place — no second shuffle.
- **Above the limit** the corpus explodes to thin unit rows that
  membership-join against the dup-hash Dataset and reassemble by
  document — two bounded bucketed shuffles, no driver collect
  (mirrors ``exact_dedup``'s regime split).

Normalization before hashing (``normalize=True``): strip, lowercase,
collapse internal whitespace — CCNet's robustness trick so trailing
spaces don't hide duplicates. Output text always preserves the
ORIGINAL units. Units whose normalized form is shorter than
``min_chars`` (default 1: empty lines) are exempt — never counted,
never dropped — so blank-line paragraph structure survives.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.stages.exchange import flat_np, pack_by_bucket
from changesetmd_ray.text.hashing import check_pow2

_WS = re.compile(r"\s+")


def _norm(unit: str, normalize: bool) -> str:
    u = unit.strip()
    if normalize:
        u = _WS.sub(" ", u.lower())
    return u


def _norm_hash_units(units: list[str], normalize: bool, min_chars: int):
    """One normalization pass per unit → (uint64 blake2b-8 hash per
    unit, exempt mask). A 64-bit DIGEST, not a crc chain: line dedup
    deletes content on hash equality, so it needs the same real
    collision resistance exact_dedup's content key has (crc32-based
    64-bit composites held only 32 bits between same-length lines)."""
    import hashlib

    n = len(units)
    h = np.empty(n, np.uint64)
    exempt = np.empty(n, bool)
    for i, u in enumerate(units):
        nu = _norm(u, normalize)
        exempt[i] = len(nu) < min_chars
        h[i] = int.from_bytes(
            hashlib.blake2b(nu.encode("utf-8"), digest_size=8).digest(),
            "little",
        )
    return h, exempt


def _split(text: str, sep: str) -> list[str]:
    return (text or "").split(sep)


def duplicated_hashes(
    ds,
    extract,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    num_buckets: int = 64,
):
    """Generic corpus-wide duplicated-hash counter: ``extract(text) ->
    (uint64 hashes, int64 seqs)`` defines the unit (lines here,
    winnowed window fingerprints in :mod:`spandup`). Returns a Dataset
    of ``(h, n, min_id, min_seq)`` — one row per hash whose total
    occurrence count ≥ ``min_count`` (int64 bit pattern; ``min_*``
    locate the globally first occurrence by ``(id, seq)``). Thin
    throughout: the exchange carries per-block COMBINED partial
    counts, never occurrences, and never text."""
    check_pow2(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        hs: list[np.ndarray] = []
        ids: list[np.ndarray] = []
        seqs: list[np.ndarray] = []
        id_np = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            h, sq = extract(t)
            hs.append(h)
            seqs.append(sq)
            ids.append(np.full(len(h), id_np[i], np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        di = np.concatenate(ids) if ids else np.empty(0, np.int64)
        sq = np.concatenate(seqs) if seqs else np.empty(0, np.int64)
        uh, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        # per-hash lexicographic min of (id, seq): order occurrences by
        # (hash, id, seq) and take each segment's first
        order = np.lexsort((sq, di, inv))
        first = np.concatenate([[0], np.cumsum(cnt[:-1])]) if len(uh) else (
            np.empty(0, np.int64))
        first = first.astype(np.int64)
        return pa.table(
            {
                "__b": pa.array(
                    (uh & np.uint64(num_buckets - 1)).astype(np.int64)),
                "h": pa.array(uh.view(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
                "min_id": pa.array(di[order][first]),
                "min_seq": pa.array(sq[order][first]),
            }
        )

    cols = ["h", "n", "min_id", "min_seq"]

    def combine(packed: pa.Table) -> pa.Table:
        h = flat_np(packed, "h").view(np.uint64)
        n = flat_np(packed, "n")
        mi = flat_np(packed, "min_id")
        ms = flat_np(packed, "min_seq")
        uh, inv = np.unique(h, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        order = np.lexsort((ms, mi, inv))
        cnt = np.bincount(inv)
        first = (np.concatenate([[0], np.cumsum(cnt[:-1])]) if len(uh)
                 else np.empty(0)).astype(np.int64)
        keep = tot >= min_count
        return pa.table(
            {
                "h": pa.array(uh.view(np.int64)[keep]),
                "n": pa.array(tot[keep]),
                "min_id": pa.array(mi[order][first][keep]),
                "min_seq": pa.array(ms[order][first][keep]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(lambda b: pack_by_bucket(b, "__b", cols),
                     batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pyarrow")
        .select_columns(cols)
    )


def _line_extract(sep: str, min_chars: int, normalize: bool):
    def extract(t: str):
        units = _split(t, sep)
        h, exempt = _norm_hash_units(units, normalize, min_chars)
        ok = ~exempt
        return h[ok], np.nonzero(ok)[0].astype(np.int64)

    return extract


def duplicated_units(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_count: int = 2,
    min_chars: int = 1,
    normalize: bool = True,
    num_buckets: int = 64,
):
    """Dataset of ``(h, n, min_id, min_seq)`` over LINE units — see
    :func:`duplicated_hashes` (``seq`` = unit index within the doc;
    sub-``min_chars`` units are exempt and never counted)."""
    return duplicated_hashes(
        ds, _line_extract(sep, min_chars, normalize),
        text_col=text_col, id_col=id_col, min_count=min_count,
        num_buckets=num_buckets,
    )


class _RebuildDocs:
    """Stateless task-map batch rebuilder: the broadcast dup-hash
    arrays resolve on first ``__call__`` in each worker (zero-copy,
    memoized per worker by plasma) and duplicated units are stripped
    from each doc."""

    def __init__(self, dup_ref, text_col, id_col, sep, min_chars,
                 normalize, keep, with_stats):
        self._ref = dup_ref
        self.h_sorted = None
        self.text_col = text_col
        self.id_col = id_col
        self.sep = sep
        self.min_chars = min_chars
        self.normalize = normalize
        self.keep = keep
        self.with_stats = with_stats

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.h_sorted is None:
            self.h_sorted, self.win_id, self.win_seq = ray.get(self._ref)
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out: list[str] = []
        n_units = np.empty(len(texts), np.int64)
        n_drop = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            units = _split(t, self.sep)
            h, exempt = _norm_hash_units(units, self.normalize,
                                         self.min_chars)
            pos = np.searchsorted(self.h_sorted, h)
            pos_c = np.minimum(pos, max(len(self.h_sorted) - 1, 0))
            dup = (
                (self.h_sorted[pos_c] == h)
                if len(self.h_sorted)
                else np.zeros(len(units), bool)
            )
            drop = dup & ~exempt
            if self.keep == "first" and drop.any():
                seq = np.arange(len(units), dtype=np.int64)
                winner = (self.win_id[pos_c] == ids[i]) & (
                    self.win_seq[pos_c] == seq)
                drop &= ~winner
            out.append(
                self.sep.join(u for u, d in zip(units, drop) if not d))
            n_units[i] = len(units)
            n_drop[i] = int(drop.sum())
        res = batch.set_column(
            batch.schema.get_field_index(self.text_col),
            self.text_col, pa.array(out, pa.string()),
        )
        if self.with_stats:
            res = res.append_column("n_units", pa.array(n_units)).append_column(
                "n_dropped", pa.array(n_drop))
        return res


def line_dedup(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_count: int = 2,
    min_chars: int = 1,
    normalize: bool = True,
    keep: str = "none",
    with_stats: bool = False,
    drop_empty: bool = False,
    broadcast_limit: int = 16_000_000,
    num_buckets: int = 64,
    concurrency=(1, 8),
):
    """Corpus → corpus with duplicated lines/paragraphs removed. See
    the module docstring for policies and the regime split. The input
    lineage executes twice in the broadcast regime (count + rebuild)
    and three times in the distributed one (count, explode,
    payload-join read) — snapshot
    upstream with ``materialize()`` if it is transform-heavy, as
    :func:`changesetmd_ray.pipelines.curation.curate` does before its
    multi-pass dedup block."""
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    dup_ds = duplicated_units(
        ds, text_col=text_col, id_col=id_col, sep=sep, min_count=min_count,
        min_chars=min_chars, normalize=normalize, num_buckets=num_buckets,
    ).materialize()  # thin: one row per DUPLICATED unit hash
    n_dup = dup_ds.count()
    if n_dup <= broadcast_limit:
        tabs = [
            t for t in ray.get(dup_ds.to_arrow_refs())
            if len(t) and "h" in t.schema.names
        ]
        if tabs:
            allt = pa.concat_tables(tabs)
            h = allt["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            order = np.argsort(h)
            h_sorted = h[order]
            if keep == "first":
                win_id = allt["min_id"].to_numpy(zero_copy_only=False)[order]
                win_seq = allt["min_seq"].to_numpy(
                    zero_copy_only=False)[order]
            else:  # keep='none' never reads winners — don't ship them
                win_id = win_seq = np.empty(0, np.int64)
        else:
            h_sorted = np.empty(0, np.uint64)
            win_id = win_seq = np.empty(0, np.int64)
        ref = ray.put((h_sorted, win_id, win_seq))
        # stateless TASK map, not an actor pool: the broadcast state is
        # three plasma-backed numpy arrays, so per-task ray.get is a
        # zero-copy view and tasks fuse with upstream stages (an actor
        # pool here pays startup + breaks fusion for no state benefit)
        rebuild = _RebuildDocs(
            ref, text_col, id_col, sep, min_chars, normalize, keep,
            with_stats,
        )
        out = ds.map_batches(rebuild, batch_format="pyarrow")
    else:
        out = _line_dedup_distributed(
            ds, dup_ds, text_col=text_col, id_col=id_col, sep=sep,
            min_chars=min_chars, normalize=normalize, keep=keep,
            with_stats=with_stats, num_buckets=num_buckets,
        )
    if drop_empty:
        def nonempty(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            stripped = pc.utf8_trim_whitespace(batch[text_col])
            return batch.filter(pc.greater(pc.utf8_length(stripped), 0))

        out = out.map_batches(nonempty, batch_format="pyarrow")
    return out


def _line_dedup_distributed(
    ds, dup_ds, *, text_col, id_col, sep, min_chars, normalize, keep,
    with_stats, num_buckets,
):
    """Above-broadcast-limit regime: explode docs to unit rows, probe
    the dup-hash Dataset per bucket (both sides aligned to ONE packed
    schema so the union is well-formed), and reassemble documents —
    unit text rides exactly one all-to-all into the probe and one into
    the reassembly groupby; the dup side is hash-only thin."""
    import pyarrow.compute as pc

    from changesetmd_ray.stages.exchange import flat

    check_pow2(num_buckets)

    # one packed schema for BOTH union sides; a side's absent columns
    # ride as null lists
    PACKED = [
        ("__id", pa.int64()), ("__seq", pa.int64()), ("__uh", pa.int64()),
        ("__ex", pa.bool_()), ("__unit", pa.string()),
        ("h", pa.int64()), ("min_id", pa.int64()), ("min_seq", pa.int64()),
    ]
    names = [n for n, _ in PACKED]
    types = dict(PACKED)

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
        u_all: list[str] = []
        id_r, sq_r, h_r, ex_r = [], [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            units = _split(t, sep)
            u_all.extend(units)
            id_r.append(np.full(len(units), ids[i], np.int64))
            sq_r.append(np.arange(len(units), dtype=np.int64))
            h, exempt = _norm_hash_units(units, normalize, min_chars)
            h_r.append(h.view(np.int64))
            ex_r.append(exempt)
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
                "__ex": pa.array(
                    np.concatenate(ex_r) if ex_r else np.empty(0, bool)),
                "__unit": pa.array(u_all, pa.string()),
            }
        )
        return conform(pack_by_bucket(
            t, "__b", ["__id", "__seq", "__uh", "__ex", "__unit"],
            types={"__unit": pa.string(), "__ex": pa.bool_()},
        ))

    def bucket_dup(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        t = batch.append_column(
            "__b", pa.array(
                (h.view(np.uint64) & np.uint64(num_buckets - 1)
                 ).astype(np.int64)),
        )
        return conform(pack_by_bucket(t, "__b", ["h", "min_id", "min_seq"]))

    units = ds.map_batches(explode, batch_format="pyarrow")
    dupb = dup_ds.map_batches(bucket_dup, batch_format="pyarrow")

    def fnp(rows: pa.Table, c: str, dt) -> np.ndarray:
        return flat_np(rows, c) if len(rows) else np.empty(0, dt)

    def probe(group: pa.Table) -> pa.Table:
        dup_mask = pc.is_valid(group["h"])
        d_rows = group.filter(dup_mask)
        u_rows = group.filter(pc.invert(dup_mask))
        uh = fnp(u_rows, "__uh", np.int64)
        dh = fnp(d_rows, "h", np.int64).view(np.uint64)
        di = fnp(d_rows, "min_id", np.int64)
        dsq = fnp(d_rows, "min_seq", np.int64)
        order = np.argsort(dh)
        dh, di, dsq = dh[order], di[order], dsq[order]
        ids = fnp(u_rows, "__id", np.int64)
        seqs = fnp(u_rows, "__seq", np.int64)
        ex = fnp(u_rows, "__ex", bool).astype(bool)
        un = flat(u_rows, "__unit") if len(u_rows) else pa.array([], pa.string())
        pos = np.searchsorted(dh, uh.view(np.uint64))
        pos_c = np.minimum(pos, max(len(dh) - 1, 0))
        hit = (dh[pos_c] == uh.view(np.uint64)) if len(dh) else (
            np.zeros(len(uh), bool))
        drop = hit & ~ex
        if keep == "first" and len(dh):
            winner = (di[pos_c] == ids) & (dsq[pos_c] == seqs)
            drop &= ~winner
        return pa.table(
            {
                "__id": pa.array(ids),
                "__seq": pa.array(seqs),
                "__drop": pa.array(drop),
                "__unit": un,
            }
        )

    marked = units.union(dupb).groupby("__b").map_groups(
        probe, batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        seqs = group["__seq"].to_numpy(zero_copy_only=False)
        order = np.argsort(seqs)
        units_l = group["__unit"].take(pa.array(order)).to_pylist()
        drop = group["__drop"].to_numpy(zero_copy_only=False)[order]
        text = sep.join(u for u, d in zip(units_l, drop) if not d)
        out = {
            id_col: pa.array([group["__id"][0].as_py()], pa.int64()),
            text_col: pa.array([text], pa.string()),
        }
        if with_stats:
            out["n_units"] = pa.array([len(units_l)], pa.int64())
            out["n_dropped"] = pa.array([int(drop.sum())], pa.int64())
        return pa.table(out)

    rebuilt = marked.groupby("__id").map_groups(
        reassemble, batch_format="pyarrow")
    other = [c for c in ds.schema().names if c != text_col]
    if other == [id_col]:
        return rebuilt
    from changesetmd_ray.joins.equi import hash_join

    # hash_join needs distinct key names across sides — alias the
    # rebuilt side's id for the join, drop it after
    rebuilt = rebuilt.map_batches(
        lambda b: b.rename_columns(
            ["__rid" if c == id_col else c for c in b.schema.names]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        ds.select_columns(other), rebuilt,
        left_on=id_col, right_on="__rid",
        left_cols=other,
        right_cols=[text_col] + (["n_units", "n_dropped"] if with_stats
                                 else []),
    )
    return joined.drop_columns(["__rid"])
