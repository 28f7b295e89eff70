"""Similarity search over an embedding column (north_rule addition).

- :func:`ann_cosine_topk` — EXACT brute-force cosine top-k: the query
  matrix is L2-normalized once on the driver and broadcast via
  ``ray.put``; each corpus batch does one numpy matmul and emits its
  per-query partial top-k; a final per-query ``groupby`` merges partials
  (same streaming shape as the geographic kNN,
  :mod:`changesetmd_ray.joins.knn`). Corpus size unbounded; shuffle is
  O(blocks · Q · k).
- :func:`ann_lsh_topk` — approximate scale path: random-hyperplane LSH.
  Corpus rows whose signature doesn't match any query's within
  ``max_mismatch`` bits are pruned *before* the matmul; the rest rerank
  exactly. Recall < 1 by construction — it's the candidate-pruning
  variant for when the corpus×query matmul is too expensive.
- :func:`ann_ivf_topk` — IVF scale path: spherical-k-means coarse
  quantizer (trained on a bounded sample, broadcast once); each corpus
  batch assigns to cells in one matmul and reranks only against the
  queries probing its cell. ``nprobe=None`` disables pruning and is
  bit-exact vs :func:`ann_cosine_topk`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.text.hashing import hamming64, segment_starts


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return flat.reshape(len(arr), dim)
    offs = np.asarray(arr.offsets)
    dim = int(offs[1] - offs[0]) if len(arr) else 0
    return flat.reshape(len(arr), dim)


class _PartialCosTopK:
    def __init__(self, q_ref, k: int, id_col: str, emb_col: str):
        qid, qmat = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.qid = qid
        self.qmat = qmat  # already L2-normalized, (Q × D)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch[self.id_col].to_numpy(zero_copy_only=False)
        emb = _norm_rows(_emb_matrix(batch, self.emb_col))
        if len(cid) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = self.qmat @ emb.T  # (Q × C)
        k = min(self.k, sims.shape[1])
        if k < sims.shape[1]:
            part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        else:
            part = np.broadcast_to(np.arange(sims.shape[1]), sims.shape).copy()
        rows = np.repeat(np.arange(sims.shape[0]), part.shape[1])
        cols = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(self.qid[rows], pa.int64()),
                "neighbor_id": pa.array(cid[cols], pa.int64()),
                "cosine": pa.array(sims[rows, cols], pa.float64()),
            }
        )


def _merge_topk_factory(k: int):
    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"].to_numpy(zero_copy_only=False)
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        sim = group["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array(qid[order], pa.int64()),
                "neighbor_id": pa.array(nid[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "cosine": pa.array(sim[order], pa.float64()),
            }
        )

    return merge


def ann_cosine_topk(
    corpus,
    queries: pa.Table,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_emb: str = "embedding",
    query_id: str = "vec_id",
    query_emb: str = "embedding",
    batch_size: int = 4096,
    concurrency=(1, 8),
):
    """Exact cosine top-k of each query among the corpus vectors.
    Ties broken by (cosine desc, neighbor id asc) — deterministic.
    Returns Dataset ``(query_id, neighbor_id, rank, cosine)``."""
    qid = queries[query_id].to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _norm_rows(_emb_matrix(queries, query_emb))
    q_ref = ray.put((qid, qmat))
    _ = concurrency  # task pool: per-task state is a zero-copy ray.get;
    # autoscaling actor pools ramp too slowly and their fresh processes
    # pay this host's first-touch page-fault cost inside the timed region

    def partial_fn(batch):
        return _PartialCosTopK(q_ref, k, corpus_id, corpus_emb)(batch)

    partials = corpus.select_columns([corpus_id, corpus_emb]).map_batches(
        partial_fn,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return partials.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pyarrow"
    )


def _kmeans_cosine(mat: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd's, fixed iterations) over
    L2-normalized vectors — the IVF coarse quantizer. Empty clusters
    keep their previous centroid."""
    rng = np.random.default_rng(seed)
    k = min(k, len(mat))
    cent = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_ivf_topk(
    corpus,
    queries: pa.Table,
    k: int,
    *,
    n_clusters: int = 16,
    nprobe: int | None = 4,
    train_size: int = 10_000,
    kmeans_iters: int = 10,
    seed: int = 7,
    corpus_id: str = "vec_id",
    corpus_emb: str = "embedding",
    query_id: str = "vec_id",
    query_emb: str = "embedding",
    batch_size: int = 4096,
    concurrency=(1, 8),
):
    """IVF (inverted-file) approximate cosine top-k — the classic
    cluster-pruned scale path next to :func:`ann_lsh_topk`'s bit-pruned
    one.

    Index: a spherical k-means coarse quantizer trained on a bounded
    ``train_size`` corpus sample (driver-side, deterministic); centroids
    + the per-query probe sets broadcast once via ``ray.put``. Search:
    the corpus STREAMS — each batch assigns its vectors to their nearest
    centroid (one matmul), then reranks each cluster segment only
    against the queries probing that cell, so per-vector compute drops
    by ~``nprobe / n_clusters`` vs brute force. No corpus shuffle; the
    final per-query merge is the same bounded groupby as
    :func:`ann_cosine_topk`.

    ``nprobe=None`` (or ≥ n_clusters) probes every cell — pruning
    disabled, output EXACTLY equals :func:`ann_cosine_topk` (this is
    the oracle-checkable configuration; approximate recall is
    unit-tested against the exact result). Same output schema.
    """
    qid = queries[query_id].to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _norm_rows(_emb_matrix(queries, query_emb))

    train = corpus.select_columns([corpus_emb]).limit(train_size).take_all()
    if not train:
        # empty corpus: same graceful empty result as ann_cosine_topk
        from ray.data import from_arrow as ray_from_arrow

        return ray_from_arrow(
            pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
        )
    tmat = _norm_rows(
        np.stack([np.asarray(r[corpus_emb], dtype=np.float64) for r in train])
    )
    cent = _kmeans_cosine(tmat, n_clusters, kmeans_iters, seed)
    kc = len(cent)
    np_eff = kc if nprobe is None else min(nprobe, kc)
    qc = qmat @ cent.T  # (Q × K)
    if np_eff < kc:
        probe_idx = np.argpartition(-qc, np_eff - 1, axis=1)[:, :np_eff]
    else:
        probe_idx = np.broadcast_to(np.arange(kc), (len(qid), kc))
    probes = np.zeros((kc, len(qid)), dtype=bool)  # (K × Q): cell → probing queries
    probes[probe_idx.ravel(), np.repeat(np.arange(len(qid)), probe_idx.shape[1])] = True
    ref = ray.put((qid, qmat, np.ascontiguousarray(cent), probes))

    class Probe:
        def __init__(self):
            self.qid, self.qmat, self.cent, self.probes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "neighbor_id": pa.array([], pa.int64()),
                              "cosine": pa.array([], pa.float64())})
            cid = batch[corpus_id].to_numpy(zero_copy_only=False)
            if len(cid) == 0:
                return empty
            emb = _norm_rows(_emb_matrix(batch, corpus_emb))
            assign = np.argmax(emb @ self.cent.T, axis=1)
            order = np.argsort(assign, kind="stable")
            a_s = assign[order]
            starts = segment_starts(a_s)
            out_q, out_n, out_s = [], [], []
            for g in range(len(starts) - 1):
                rows = order[starts[g] : starts[g + 1]]
                qs = np.nonzero(self.probes[a_s[starts[g]]])[0]
                if len(qs) == 0:
                    continue
                sims = self.qmat[qs] @ emb[rows].T  # (q × m)
                kk = min(k, sims.shape[1])
                if kk < sims.shape[1]:
                    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                else:
                    part = np.broadcast_to(np.arange(sims.shape[1]), sims.shape).copy()
                ri = np.repeat(np.arange(len(qs)), part.shape[1])
                ci = part.ravel()
                out_q.append(self.qid[qs[ri]])
                out_n.append(cid[rows[ci]])
                out_s.append(sims[ri, ci])
            if not out_q:
                return empty
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = corpus.select_columns([corpus_id, corpus_emb]).map_batches(
        lambda b: Probe()(b), batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pyarrow"
    )


def _rh_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0  # (N × B)
    out = np.zeros(len(mat), dtype=np.uint64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out


def ann_lsh_topk(
    corpus,
    queries: pa.Table,
    k: int,
    *,
    n_bits: int = 16,
    max_mismatch: int = 3,
    seed: int = 7,
    corpus_id: str = "vec_id",
    corpus_emb: str = "embedding",
    query_id: str = "vec_id",
    query_emb: str = "embedding",
    batch_size: int = 4096,
    concurrency=(1, 8),
):
    """Approximate cosine top-k: random-hyperplane signatures prune
    corpus rows > ``max_mismatch`` signature bits from every query, the
    survivors rerank exactly. Same output schema as
    :func:`ann_cosine_topk` (rank may differ where recall < 1)."""
    qid = queries[query_id].to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _norm_rows(_emb_matrix(queries, query_emb))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, qmat.shape[1]))
    qsig = _rh_signature(qmat, planes)
    q_ref = ray.put((qid, qmat, planes, qsig))

    class Probe:
        def __init__(self):
            self.qid, self.qmat, self.planes, self.qsig = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cid = batch[corpus_id].to_numpy(zero_copy_only=False)
            emb = _norm_rows(_emb_matrix(batch, corpus_emb))
            if len(cid) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            csig = _rh_signature(emb, self.planes)
            out_q, out_n, out_s = [], [], []
            for i in range(len(self.qid)):
                d = hamming64(np.full(len(csig), self.qsig[i], dtype=np.uint64), csig)
                cand = np.nonzero(d <= max_mismatch)[0]
                if len(cand) == 0:
                    continue
                sims = emb[cand] @ self.qmat[i]
                kk = min(k, len(cand))
                top = np.argpartition(-sims, kk - 1)[:kk] if kk < len(cand) else np.arange(len(cand))
                out_q.append(np.full(len(top), self.qid[i], dtype=np.int64))
                out_n.append(cid[cand[top]])
                out_s.append(sims[top])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = corpus.select_columns([corpus_id, corpus_emb]).map_batches(
        lambda b: Probe()(b), batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pyarrow"
    )


def embedding_neardup_pairs(
    ds,
    *,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int = 8,
    batch_size: int = 2048,
):
    """Embedding-cosine near-duplicate pairs: all ``(id_a, id_b)`` with
    ``id_a < id_b`` and cosine ≥ ``threshold`` — EXACT (recall 1.0).

    Block-pair covering, fully distributed (no driver materialization):
    each vector hashes to one of ``n_blocks`` id blocks and is fanned
    out to the ``n_blocks`` bucket keys ``(min(i,j), max(i,j))`` it
    participates in; each bucket cross-matmuls its two blocks (one
    triangular matmul for the diagonal buckets). A pair lands in exactly
    one bucket, so no global distinct is needed. Shuffle volume is
    ``n_blocks ×`` the corpus embeddings; per-bucket work is
    ``(N/n_blocks)²·D`` — pick ``n_blocks ~ √(cluster cores)`` to
    balance replication against bucket size. Exact all-pairs above a
    threshold is inherently O(N²·D) compute at any layout; for the
    approximate-but-cheap regime use :func:`ann_lsh_topk`'s pruning or
    MinHash over text (:mod:`changesetmd_ray.text.dedup`).
    """
    from changesetmd_ray.text.hashing import splitmix64

    def fanout(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = _norm_rows(_emb_matrix(batch, emb_col))
        n, dim = emb.shape
        blk = (splitmix64(ids.astype(np.uint64)) % np.uint64(n_blocks)).astype(np.int64)
        # bucket key for (block b, partner j): (min<<32)|max — n_blocks keys/row
        other = np.arange(n_blocks, dtype=np.int64)
        lo = np.minimum(blk[:, None], other[None, :])
        hi = np.maximum(blk[:, None], other[None, :])
        bucket = (lo * n_blocks + hi).reshape(-1)
        rep_ids = np.repeat(ids, n_blocks)
        rep_blk = np.repeat(blk, n_blocks)
        rep_emb = np.repeat(emb, n_blocks, axis=0)
        return pa.table(
            {
                "__bucket": pa.array(bucket),
                "__blk": pa.array(rep_blk),
                id_col: pa.array(rep_ids),
                "__emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(rep_emb.reshape(-1), pa.float64()), dim
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = group["__blk"].to_numpy(zero_copy_only=False)
        emb = _emb_matrix(group, "__emb")  # already normalized in fanout
        bucket = int(group["__bucket"][0].as_py())
        i, j = bucket // n_blocks, bucket % n_blocks
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        if i == j:
            # diagonal: all pairs within the block
            if len(ids) < 2:
                return empty
            cos = emb @ emb.T
            ai, bi = np.nonzero((cos >= threshold) & (ids[:, None] < ids[None, :]))
            return pa.table({"id_a": pa.array(ids[ai]), "id_b": pa.array(ids[bi])})
        ma, mb = blk == i, blk == j
        if not ma.any() or not mb.any():
            return empty
        ida, idb = ids[ma], ids[mb]
        cos = emb[ma] @ emb[mb].T
        ai, bi = np.nonzero(cos >= threshold)
        a, b = ida[ai], idb[bi]
        lo_id, hi_id = np.minimum(a, b), np.maximum(a, b)
        keep = lo_id < hi_id  # drop id self-collisions across blocks (none expected)
        return pa.table({"id_a": pa.array(lo_id[keep]), "id_b": pa.array(hi_id[keep])})

    return (
        ds.select_columns([id_col, emb_col])
        .map_batches(fanout, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
