"""Byte-n-gram language-model perplexity scoring — the CCNet quality
signal (Wenzek et al. 2019, arXiv:1911.00359: score every document
with a small LM trained on a trusted corpus; low perplexity ≈ fluent)
built without ML libraries (north_rule addition).

Model: hashed byte-level n-gram counts with add-k smoothing —
``P(b | ctx) = (C[ngram] + k) / (C[ctx] + k·256)`` — over two
fixed-size count arrays (``n_buckets`` each), so model size is a KNOB,
not a function of corpus size. Per-document score is the mean negative
log2 probability (``log2_ppl``; perplexity = 2^score).

Ray shape:

- **Training** (:func:`train_byte_lm`): one distributed counting pass
  — per-batch partials hash every n-gram/context into its bucket and
  emit SPARSE (bucket, count) rows, a bucketed sum collapses them, and
  the driver gathers at most ``2 × n_buckets`` rows (bounded by the
  knob, never the corpus). Deterministic: counting is exact, no
  sampling, no init.
- **Scoring** (:func:`lm_score` / :func:`lm_filter`): the two count
  arrays broadcast once via ``ray.put``; per doc the byte stream is
  windowed with numpy stride tricks and hashed vectorized — no
  per-character Python.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.text.hashing import splitmix64

_POW = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for window mix


def _window_hashes(data: np.ndarray, n: int) -> np.ndarray:
    """uint64 hash per length-``n`` byte window (vectorized)."""
    if len(data) < n:
        return np.empty(0, dtype=np.uint64)
    w = np.lib.stride_tricks.sliding_window_view(data, n).astype(np.uint64)
    h = np.zeros(len(w), dtype=np.uint64)
    for j in range(n):
        h = h * _POW + w[:, j]
    return splitmix64(h)


@dataclass(frozen=True)
class ByteLmModel:
    """Hashed n-gram counts (``gram``) + (n-1)-gram context counts
    (``ctx``), both ``(n_buckets,)`` int64; ``n`` = gram length in
    BYTES; ``add_k`` = smoothing constant."""

    n: int
    gram: np.ndarray
    ctx: np.ndarray
    add_k: float = 0.1

    @property
    def n_buckets(self) -> int:
        return len(self.gram)


def _doc_grams(text: str, n: int, n_buckets: int):
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    g = _window_hashes(b, n) % np.uint64(n_buckets)
    c = _window_hashes(b[:-1], n - 1) % np.uint64(n_buckets) if len(b) >= n else g[:0]
    # context i aligns with gram i (bytes i..i+n-1 vs i..i+n-2)
    return g, c[: len(g)]


def train_byte_lm(
    ds,
    *,
    text_col: str = "text",
    n: int = 4,
    n_buckets: int = 1 << 20,
    add_k: float = 0.1,
    num_fold_buckets: int = 64,
) -> ByteLmModel:
    """Exact distributed n-gram counting → ByteLmModel. The driver
    collect is bounded by ``2 × n_buckets`` (bucket, count) rows."""
    if n < 2:
        raise ValueError(f"n must be ≥ 2, got {n}")
    from changesetmd_ray.stages.exchange import flat, pack_by_bucket

    def partial(batch: pa.Table) -> pa.Table:
        gs, cs = [], []
        for t in batch[text_col].to_pylist():
            g, c = _doc_grams(t, n, n_buckets)
            gs.append(g)
            cs.append(c)
        ug, ng = np.unique(
            np.concatenate(gs) if gs else np.empty(0, np.uint64),
            return_counts=True,
        )
        uc, nc = np.unique(
            np.concatenate(cs) if cs else np.empty(0, np.uint64),
            return_counts=True,
        )
        tbl = pa.table(
            {
                "bucket": pa.array(
                    np.concatenate([ug, uc]).astype(np.int64)),
                "kind": pa.array(np.concatenate(
                    [np.zeros(len(ug), np.int8), np.ones(len(uc), np.int8)])),
                "cnt": pa.array(
                    np.concatenate([ng, nc]).astype(np.int64)),
            }
        )
        fold = pa.array(
            (tbl["bucket"].to_numpy(zero_copy_only=False)
             % num_fold_buckets).astype(np.int64)
        )
        return pack_by_bucket(
            tbl.append_column("__fold", fold), "__fold",
            ["bucket", "kind", "cnt"],
            types={"bucket": pa.int64(), "kind": pa.int8(), "cnt": pa.int64()},
        )

    def combine(packed: pa.Table) -> pa.Table:
        g = pa.table({c: flat(packed, c) for c in ("bucket", "kind", "cnt")})
        out = g.group_by(["bucket", "kind"]).aggregate([("cnt", "sum")])
        return pa.table({"bucket": out["bucket"], "kind": out["kind"],
                         "cnt": out["cnt_sum"]})

    gram = np.zeros(n_buckets, dtype=np.int64)
    ctx = np.zeros(n_buckets, dtype=np.int64)
    rows = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__fold")
        .map_groups(combine, batch_format="pyarrow")
    )
    for b in rows.iter_batches(batch_format="pyarrow"):
        kk = b["kind"].to_numpy(zero_copy_only=False)
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        cc = b["cnt"].to_numpy(zero_copy_only=False)
        np.add.at(gram, bk[kk == 0], cc[kk == 0])
        np.add.at(ctx, bk[kk == 1], cc[kk == 1])
    return ByteLmModel(n=n, gram=gram, ctx=ctx, add_k=add_k)


def score_docs(texts: list, model: ByteLmModel) -> np.ndarray:
    """Mean negative log2 P per byte-n-gram; docs shorter than ``n``
    bytes score +inf (no evidence — callers filter them upstream)."""
    out = np.full(len(texts), np.inf)
    k = model.add_k
    for i, t in enumerate(texts):
        g, c = _doc_grams(t, model.n, model.n_buckets)
        if len(g) == 0:
            continue
        p = (model.gram[g] + k) / (model.ctx[c] + k * 256.0)
        out[i] = float(-np.log2(p).mean())
    return out


def lm_score(ds, model: ByteLmModel, *, text_col: str = "text",
             out_col: str = "log2_ppl", batch_size: int = 1024):
    """Append the LM score (lower = more fluent). Counts broadcast
    once; per-batch work is vectorized per document."""
    ref = ray.put(model)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        s = score_docs(batch[text_col].to_pylist(), m)
        return batch.append_column(out_col, pa.array(s, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def lm_filter(ds, model: ByteLmModel, max_log2_ppl: float, *,
              text_col: str = "text", batch_size: int = 1024):
    """Keep rows scoring ≤ ``max_log2_ppl`` — the CCNet head/middle
    cut (infinite-score rows, i.e. sub-n-byte docs, are dropped)."""
    ref = ray.put(model)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        s = score_docs(batch[text_col].to_pylist(), m)
        return batch.filter(pa.array(s <= max_log2_ppl))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def ppl_partition(ds, model: ByteLmModel, *, text_col: str = "text",
                  out_col: str = "ppl_bucket", keep: tuple | None = None,
                  fractions: tuple = (1.0 / 3.0, 2.0 / 3.0),
                  batch_size: int = 1024):
    """CCNet's head/middle/tail split (arXiv:1911.00359 §4.3): score
    every doc, find the corpus ``fractions`` quantiles of the score
    EXACTLY (stages/stats.py::exact_quantiles — combiner-first
    histogram refinement, no driver materialization of scores), then
    tag each doc ``head`` (most fluent, score ≤ q1) / ``middle`` /
    ``tail``. With ``keep`` (e.g. ``("head", "middle")`` — the usual
    training cut) the non-kept buckets are dropped and ``out_col``
    still records the bucket.

    Two passes over the corpus by construction (the thresholds are
    corpus statistics); both passes are map-only with the model
    broadcast once, so the wall cost is ~2× ``lm_score``. Docs scoring
    +inf (shorter than the model's n) land in ``tail``."""
    if not (len(fractions) == 2 and 0.0 < fractions[0] < fractions[1] < 1.0):
        raise ValueError(f"fractions must be ascending in (0,1): {fractions}")
    from changesetmd_ray.stages.stats import exact_quantiles

    scored = lm_score(ds, model, text_col=text_col, out_col="__log2_ppl",
                      batch_size=batch_size)
    qt = exact_quantiles(scored, col="__log2_ppl", qs=list(fractions))
    q1, q2 = (qt["value"][0].as_py(), qt["value"][1].as_py())
    if q1 is None:  # empty corpus
        q1 = q2 = float("inf")
    keep_set = set(keep) if keep is not None else None
    if keep_set is not None and not keep_set <= {"head", "middle", "tail"}:
        raise ValueError(f"keep must name head/middle/tail buckets, got {keep}")

    def tag(batch: pa.Table) -> pa.Table:
        s = batch["__log2_ppl"].to_numpy(zero_copy_only=False)
        bucket = np.where(s <= q1, "head", np.where(s <= q2, "middle", "tail"))
        out = batch.drop_columns(["__log2_ppl"]).append_column(
            out_col, pa.array(bucket.tolist(), pa.string()))
        if keep_set is None:
            return out
        import pyarrow.compute as pc

        return out.filter(pc.is_in(out[out_col],
                                   value_set=pa.array(sorted(keep_set))))

    return scored.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
