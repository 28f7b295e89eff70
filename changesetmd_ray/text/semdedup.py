"""SemDeDup — semantic deduplication via embedding clusters
(north_rule addition; Abbas et al. 2023, arXiv:2303.09540).

The sixth dedup mode next to exact / MinHash / SimHash / n-gram
Jaccard / exact-cosine (:mod:`changesetmd_ray.text.dedup`,
:func:`changesetmd_ray.text.ann.embedding_neardup_pairs`): instead of
an exact O(N²·D) all-pairs pass, vectors are first coarse-clustered
with the IVF quantizer's spherical k-means
(:func:`changesetmd_ray.text.ann._kmeans_cosine`, trained once on a
bounded sample and broadcast), and the pairwise cosine test runs only
WITHIN each cluster — the paper's trade: near-dup pairs split across
cluster boundaries are missed by construction, in exchange for
Σ mᵢ²·D ≪ N²·D compute.

Ray-native shape:

1. ``map_batches`` assign: one matmul per batch against the broadcast
   centroids → ``__cluster`` + cosine-to-centroid ``__csim``; rows
   pack per cluster on the list-packed exchange
   (:mod:`changesetmd_ray.stages.exchange`) so the all-to-all moves
   ≤ blocks × n_clusters packed rows (the embedding payload must ride
   — the within-cluster test needs the vectors).
2. ``groupby(__cluster).map_groups``: deterministic greedy sweep in
   priority order — an item is KEPT iff no higher-priority kept item
   is within ``threshold`` cosine; dropped items record the kept item
   that covered them (``dup_of``). ``keep="outlier"`` prioritizes LOW
   centroid similarity (the paper's best-performing choice — keeps
   semantic outliers, drops cluster-core redundancy); ``"central"``
   inverts it. Ties break on id, so output is layout-invariant.

Partitioning assumption (documented per SURVEY §2.10): per-cluster
work is O(mᵢ²·D) — size ``n_clusters ≈ N / target_cluster_rows`` so
the largest cluster's pairwise pass fits one task (the paper runs
50 k clusters over billions of embeddings for the same reason). The
sweep chunks its similarity matrix, so task memory is O(chunk × mᵢ),
not O(mᵢ²).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.stages.exchange import flat, flat_np, pack_by_bucket
from changesetmd_ray.text.ann import _emb_matrix, _kmeans_cosine, _norm_rows

_EMB_TYPE = pa.list_(pa.float64())


def _greedy_sweep(emb_p: np.ndarray, threshold: float, chunk: int = 1024):
    """Greedy keep/drop over priority-ordered normalized vectors:
    row i is kept iff no kept row j < i has cosine ≥ threshold; dropped
    rows record the first (highest-priority) kept row that covered
    them, as an index into the priority order (-1 = kept). O(m²·D)
    compute in O(chunk·m) memory. Deterministic."""
    m = len(emb_p)
    keep = np.ones(m, dtype=bool)
    dup_of = np.full(m, -1, dtype=np.int64)
    for c0 in range(0, m, chunk):
        sims = emb_p[c0 : c0 + chunk] @ emb_p.T  # (chunk × m)
        for i in range(c0, min(c0 + chunk, m)):
            if not keep[i]:
                continue
            row = sims[i - c0, i + 1 :]
            hits = np.nonzero(row >= threshold)[0] + i + 1
            hits = hits[keep[hits]]
            keep[hits] = False
            dup_of[hits] = i
    return keep, dup_of


def _empty_decisions(id_col: str) -> pa.Table:
    return pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "cent_sim": pa.array([], pa.float64()),
            "keep": pa.array([], pa.bool_()),
            "dup_of": pa.array([], pa.int64()),
        }
    )


def semdedup_decisions(
    ds,
    *,
    threshold: float,
    n_clusters: int = 64,
    train_size: int = 10_000,
    kmeans_iters: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    keep: str = "outlier",
    batch_size: int = 4096,
):
    """Per-row SemDeDup decisions → Dataset ``(id_col, cluster,
    cent_sim, keep, dup_of)`` — ``dup_of`` is the keeper's id for
    dropped rows, null for kept ones. See module docstring for the
    algorithm and its recall trade; ``keep`` ∈ {"outlier", "central"}
    picks which duplicate survives."""
    if keep not in ("outlier", "central"):
        raise ValueError(f"keep must be 'outlier' or 'central', got {keep!r}")
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    # hash-deterministic training sample: the train_size LOWEST
    # splitmix64(id) rows (ties broken by id). limit() would depend on
    # block layout once the corpus exceeds train_size; selecting by a
    # pure function of the id makes the sampled SET — and therefore
    # the centroids and every decision — layout-invariant at any
    # corpus size. Per-block partial top-k keeps the exchange thin
    # (≤ train_size rows per block); the driver collects exactly
    # train_size rows after the distributed sort+limit.
    from changesetmd_ray.text.hashing import splitmix64

    def block_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # sign-flip so int64 ascending == uint64 ascending: the global
        # Dataset.sort below compares the stored int64, and the
        # per-block cut must agree with it exactly
        h = (splitmix64(ids.view(np.uint64)) ^ np.uint64(1 << 63)).view(np.int64)
        order = np.lexsort((ids, h))[: min(train_size, len(ids))]
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(order)),
                emb_col: batch[emb_col].take(pa.array(order)),
                "__h": pa.array(h[order]),
            }
        )

    train = (
        ds.select_columns([id_col, emb_col])
        .map_batches(block_topk, batch_format="pyarrow")
        .sort(["__h", id_col])
        .limit(train_size)
        .take_all()
    )
    if not train:
        from ray.data import from_arrow as ray_from_arrow

        return ray_from_arrow(_empty_decisions(id_col))
    train.sort(key=lambda r: r[id_col])
    tmat = _norm_rows(
        np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in train])
    )
    cent_ref = ray.put(
        np.ascontiguousarray(_kmeans_cosine(tmat, n_clusters, kmeans_iters, seed))
    )

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)  # zero-copy plasma read per task
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = _norm_rows(_emb_matrix(batch, emb_col))
        qsim = emb @ cent.T if len(ids) else np.empty((0, len(cent)))
        cl = np.argmax(qsim, axis=1).astype(np.int64) if len(ids) else np.empty(0, np.int64)
        cs = qsim[np.arange(len(ids)), cl] if len(ids) else np.empty(0)
        dim = emb.shape[1] if len(ids) else 0
        offsets = pa.array((np.arange(len(ids) + 1) * dim).astype(np.int32))
        thin = pa.table(
            {
                "__cluster": pa.array(cl),
                id_col: pa.array(ids),
                "__csim": pa.array(cs, pa.float64()),
                "__emb": pa.ListArray.from_arrays(
                    offsets, pa.array(emb.reshape(-1), pa.float64())
                ),
            }
        )
        return pack_by_bucket(
            thin, "__cluster", [id_col, "__csim", "__emb"],
            types={id_col: pa.int64(), "__csim": pa.float64(), "__emb": _EMB_TYPE},
        )

    sign = -1.0 if keep == "central" else 1.0

    def cluster_fn(group: pa.Table) -> pa.Table:
        ids = flat_np(group, id_col).astype(np.int64)
        csim = flat_np(group, "__csim")
        emb = _emb_matrix(pa.table({"__emb": flat(group, "__emb")}), "__emb")
        cluster = int(group["__cluster"][0].as_py())
        # priority: outlier = low centroid sim first; ties on id asc
        order = np.lexsort((ids, sign * csim))
        kp_p, dup_idx_p = _greedy_sweep(emb[order], threshold)
        # priority-order results → input order; dup indices → keeper ids
        dup_id_p = np.full(len(ids), -1, dtype=np.int64)
        covered = dup_idx_p >= 0
        dup_id_p[covered] = ids[order][dup_idx_p[covered]]
        kp = np.empty(len(ids), dtype=bool)
        dup_id = np.empty(len(ids), dtype=np.int64)
        kp[order], dup_id[order] = kp_p, dup_id_p
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(np.full(len(ids), cluster, dtype=np.int64)),
                "cent_sim": pa.array(csim, pa.float64()),
                "keep": pa.array(kp),
                # mask=True → null for kept rows; int64 ids stay exact
                "dup_of": pa.array(dup_id, pa.int64(), mask=kp),
            }
        )

    return (
        ds.select_columns([id_col, emb_col])
        .map_batches(assign, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__cluster")
        .map_groups(cluster_fn, batch_format="pyarrow")
    )


def semdedup(
    ds,
    *,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    broadcast_limit: int = 16_000_000,
    **kw,
):
    """Filter form: rows of ``ds`` that SemDeDup keeps. Decisions run
    on a pruned (id, embedding) projection; survivors come back via
    the Dataset-level membership join (broadcast kept-ids below
    ``broadcast_limit``, bucketed shuffle above — ``joins/broadcast``),
    so the full-width payload never rides the cluster exchange."""
    from changesetmd_ray.joins.broadcast import semi_join

    dec = semdedup_decisions(
        ds, threshold=threshold, id_col=id_col, emb_col=emb_col, **kw
    )

    def kept_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["keep"]).select([id_col])

    kept = dec.map_batches(kept_only, batch_format="pyarrow")
    return semi_join(ds, kept, big_on=id_col, small_on=id_col,
                     broadcast_limit=broadcast_limit)
