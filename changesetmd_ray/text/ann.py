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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.text.hashing import hamming64


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
    partials = corpus.select_columns([corpus_id, corpus_emb]).map_batches(
        _PartialCosTopK,
        fn_constructor_kwargs={"q_ref": q_ref, "k": k, "id_col": corpus_id, "emb_col": corpus_emb},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
        Probe, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
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
