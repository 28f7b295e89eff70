"""Sequence packing for training export (north_rule addition).

A trainer consumes fixed-length token sequences, not documents. Two
standard layouts, both deterministic and layout-invariant (same
id-hash shard + order rules as :mod:`changesetmd_ray.stages.export`,
so a re-run or re-partitioned input produces byte-identical plans):

- :func:`chunk_sequences` — GPT-style concat-and-chunk: documents are
  concatenated in seeded-permutation order within their shard and cut
  every ``max_tokens`` tokens; a document may span chunks. Fully
  vectorized (cumsum + integer division).
- :func:`pack_sequences` — whole-document first-fit-in-order packing
  (BERT/SFT style): walk the shard's permutation order, open a new
  sequence whenever the next document would overflow ``max_tokens``.
  Documents never split; over-long documents get a singleton sequence
  (the trainer truncates). The cut points are inherently sequential —
  computed with one ``searchsorted`` per sequence on the running
  cumsum (O(#sequences · log n) per shard, numpy throughout; measured
  ≈1 µs per cut, so even a 16 M-doc shard packs in seconds).

Both return one row per document — ``(doc_id, shard, seq, pos,
n_tokens)`` with ``seq`` the sequence ordinal within the shard and
``pos`` the document's token offset inside its sequence (chunk mode:
offset of the document's FIRST token in the concatenated stream, plus
``n_seqs_spanned``) — a driver-side-free Dataset the export sink can
join or group downstream. Packing is per-shard independent work: the
payload rides the same ONE list-packed all-to-all as
:func:`~changesetmd_ray.stages.export.shuffle_export`.

Reference analogue: none (the reference loads rows into Postgres);
this is part of the training-data layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.stages.exchange import flat_np, pack_by_bucket
from changesetmd_ray.stages.export import _id_hash64
from changesetmd_ray.text.hashing import check_pow2, splitmix64

_KEY = "__pack_k"
_SHARD = "__pack_shard"


def _keyed(ds, id_col: str, len_col: str, seed: int, num_shards: int):
    """Tag each row with its shard + permutation key and list-pack per
    shard (the one all-to-all)."""
    check_pow2(num_shards, "num_shards")
    shift = np.uint64(64 - int(num_shards).bit_length() + 1)
    seed_mix = splitmix64(np.array([np.uint64(seed)], np.uint64))[0]

    def key_batch(batch: pa.Table) -> pa.Table:
        if batch[len_col].null_count:
            raise ValueError(f"{len_col}: null token lengths")
        lens = batch[len_col].to_numpy(zero_copy_only=False)
        if len(lens) and (not np.issubdtype(lens.dtype, np.number) or (lens <= 0).any()):
            raise ValueError(f"{len_col}: token lengths must be positive integers")
        if len(lens) and np.issubdtype(lens.dtype, np.floating) and (
            not np.all(np.mod(lens, 1) == 0)
        ):
            # NaN and fractions both fail here; astype(int64) below
            # would otherwise turn them into garbage plans silently
            raise ValueError(f"{len_col}: token lengths must be integral")
        k = splitmix64(_id_hash64(batch, id_col) ^ seed_mix)
        shards = (
            np.zeros(len(k), np.int64)
            if num_shards == 1
            else (k >> shift).astype(np.int64)
        )
        keyed = pa.table(
            {
                id_col: batch[id_col],
                len_col: pa.array(lens.astype(np.int64), pa.int64()),
                _KEY: pa.array(k.view(np.int64), pa.int64()),
                _SHARD: pa.array(shards, pa.int64()),
            }
        )
        return pack_by_bucket(keyed, _SHARD, [id_col, len_col, _KEY])

    return ds.map_batches(key_batch, batch_format="pyarrow")


def _shard_order(group: pa.Table, id_col: str, len_col: str):
    k = flat_np(group, _KEY).view(np.uint64)
    order = np.argsort(k, kind="stable")
    ids = flat_np(group, id_col)[order]
    lens = flat_np(group, len_col)[order].astype(np.int64)
    shard = int(group[_SHARD][0].as_py())
    return shard, ids, lens


def chunk_sequences(ds, *, id_col: str, len_col: str, max_tokens: int,
                    seed: int = 0, num_shards: int = 64):
    """Concat-and-chunk plan: per shard, documents concatenate in
    permutation order and the stream cuts every ``max_tokens`` tokens.

    Output rows (one per document): ``doc_id, shard, seq, pos,
    n_tokens, n_seqs_spanned`` — ``seq`` is the chunk holding the
    document's first token, ``pos`` the offset within that chunk,
    ``n_seqs_spanned`` how many chunks the document touches."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")

    def plan(group: pa.Table) -> pa.Table:
        shard, ids, lens = _shard_order(group, id_col, len_col)
        start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        end = start + lens - 1  # inclusive last-token position
        seq = start // max_tokens
        pos = start - seq * max_tokens
        spanned = end // max_tokens - seq + 1
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shard": pa.array(np.full(n, shard, np.int64)),
                "seq": pa.array(seq.astype(np.int64)),
                "pos": pa.array(pos.astype(np.int64)),
                "n_tokens": pa.array(lens),
                "n_seqs_spanned": pa.array(spanned.astype(np.int64)),
            }
        )

    return (
        _keyed(ds, id_col, len_col, seed, num_shards)
        .groupby(_SHARD)
        .map_groups(plan, batch_format="pyarrow")
    )


def pack_sequences(ds, *, id_col: str, len_col: str, max_tokens: int,
                   seed: int = 0, num_shards: int = 64):
    """Whole-document first-fit-in-order packing plan: per shard, walk
    the permutation order and start a new sequence whenever the next
    document would push the running total past ``max_tokens``.

    Output rows (one per document): ``doc_id, shard, seq, pos,
    n_tokens`` — every sequence's token sum is ≤ ``max_tokens`` except
    singleton sequences holding one over-long document."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")

    def plan(group: pa.Table) -> pa.Table:
        shard, ids, lens = _shard_order(group, id_col, len_col)
        n = len(ids)
        # greedy cut points: each sequence extends to the last doc whose
        # cumulative size fits the budget — one searchsorted per
        # sequence on the running cumsum (inherently sequential; numpy
        # per step, never per doc)
        csum = np.cumsum(lens)
        seq = np.empty(n, np.int64)
        pos = np.empty(n, np.int64)
        i = 0
        s = 0
        while i < n:
            base = csum[i - 1] if i else 0
            j = int(np.searchsorted(csum, base + max_tokens, side="right"))
            if j == i:  # over-long document: singleton sequence
                j = i + 1
            seq[i:j] = s
            pos[i:j] = csum[i:j] - lens[i:j] - base
            s += 1
            i = j
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shard": pa.array(np.full(n, shard, np.int64)),
                "seq": pa.array(seq),
                "pos": pa.array(pos),
                "n_tokens": pa.array(lens),
            }
        )

    return (
        _keyed(ds, id_col, len_col, seed, num_shards)
        .groupby(_SHARD)
        .map_groups(plan, batch_format="pyarrow")
    )
