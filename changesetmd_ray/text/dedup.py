"""Deduplication operators over a document Dataset.

- :func:`exact_dedup` — hash-partitioned exact dedup, keep-first /
  keep-latest. The distributed form of the reference's PK + upsert
  invariant (reference ``queries.py:41``, ``changesetmd.py:164-182``):
  hash-group by a 64-bit content/key hash, keep one row per group with a
  deterministic winner rule, guard against hash collisions by comparing
  the actual key within the group.
- :func:`minhash_lsh_candidates` — shingle → MinHash → banded LSH,
  TWO-PHASE: packed 16-byte (band, id) pairs shuffle and pair up, then
  candidate-only signatures (and shingle sets under ``carry_text``)
  broadcast once for a streaming vectorized verify — the signatures
  never ride the all-to-all.
- :func:`simhash_candidates` — 64-bit SimHash; near-dup = Hamming ≤ t
  found by the band-partition trick (split 64 bits into t+1 bands; any
  pair within distance t agrees exactly on ≥1 band — pigeonhole).
- :func:`duplicate_clusters` — connected components over a (small)
  verified pair list, driver-side union-find → (doc_id, rep_id) map;
  :func:`duplicate_clusters_dataset` is the distributed form (min-label
  propagation, one bucketed groupby per diameter hop) for pair lists
  too large for one process.

Scale notes: the corpus always streams; shuffles move packed (key,
id) or (band, id) rows — never raw text, never signatures.
Candidate-pair outputs are assumed ≪ corpus (the usual regime);
`duplicate_clusters` documents that assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from changesetmd_ray.text.hashing import (
    any_eq_pairs,
    band_keys_matrix,
    char_ngram_hashes,
    check_pow2,
    eq_count_pairs,
    hamming64,
    hash_bytes128,
    jaccard,
    minhash_params,
    minhash_signature,
    segment_starts,
    shingle_hashes,
    simhash64,
    splitmix64,
    token_hashes,
    tokenize,
)




def _dedup_rows_shuffle(ds, *, key_col: str, id_col: str, keep: str, ts_col: str | None):
    """Full-row keep-one groupby — the duplicate-id-safe path: every row
    of a key group co-locates, the winner row is picked in place, so
    replayed copies collapse correctly. Rows (payload included) ride the
    shuffle; prefer the loser-filter path for unique-id corpora."""

    def add_hash(batch: pa.Table) -> pa.Table:
        field = batch.schema.field(key_col).type
        if pa.types.is_integer(field):
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = splitmix64(k).astype(np.int64)
        else:
            vals = batch[key_col].to_pylist()
            h = np.fromiter(
                (
                    hash_bytes128(
                        v.encode("utf-8") if isinstance(v, str) else (v if v is not None else b"")
                    )[0]
                    for v in vals
                ),
                np.int64,
                len(vals),
            )
        return batch.append_column("__h", pa.array(h, pa.int64()))

    def keep_one(group: pa.Table) -> pa.Table:
        # collision guard: within a hash group, split by the actual key
        keys = group[key_col].to_pylist()
        ids = group[id_col].to_numpy(zero_copy_only=False)
        if keep == "latest":
            ts_arr = group[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
            ts_i = ts_arr.astype(np.int64)
            order = np.where(np.isnat(ts_arr), np.iinfo(np.int64).max, -ts_i)
        else:
            order = ids
        winners = []
        seen: dict = {}
        for i, kk in enumerate(keys):
            seen.setdefault(kk, []).append(i)
        for idxs in seen.values():
            idxs = np.asarray(idxs)
            winners.append(int(idxs[np.lexsort((ids[idxs], order[idxs]))[0]]))
        return group.take(pa.array(sorted(winners))).drop_columns(["__h"])

    return ds.map_batches(add_hash, batch_format="pyarrow").groupby("__h").map_groups(
        keep_one, batch_format="pyarrow"
    )


def exact_dedup(ds, *, key_col: str = "text", id_col: str = "doc_id", keep: str = "first",
                ts_col: str | None = None, loser_broadcast_limit: int = 16_000_000,
                num_buckets: int = 256, unique_ids: bool = True):
    """One row per distinct ``key_col`` value. ``keep='first'`` keeps the
    smallest ``id_col``; ``keep='latest'`` keeps max ``ts_col`` (ties →
    smallest id) — the reference's last-writer-wins upsert (A5/S8).
    Returns the surviving rows with their original schema.

    Scale shape — the all-to-all never carries the payload:

    1. key-extract: each row → ``(h1, h2, id[, order])`` where (h1, h2)
       is a 128-bit blake2b of the key (collision-guard strength; for
       integer keys h1 = splitmix64(key), a bijection, so zero
       collisions and h2 is unused),
    2. a narrow ``groupby(h1)`` elects the per-key winner and emits the
       LOSER ids (sub-grouped by h2 inside the group),
    3. the source then streams through a filter: loser ids broadcast
       once via ``ray.put`` when ≤ ``loser_broadcast_limit`` (the corpus
       never shuffles at all — web-dedup loser sets are duplicates only,
       ≪ corpus); above the limit, a bucketed distributed anti-join by
       id (one corpus shuffle, same cost as the naive design's floor).

    ``id_col`` must be unique per row (it identifies losers). For
    replayed/duplicated inputs where the same id appears more than once
    (the reference's replicate-replay idempotency, S9), pass
    ``unique_ids=False`` — that path shuffles full rows through the key
    groupby (correct under any duplication) and suits narrow tables.
    """
    if keep not in ("first", "latest"):
        raise ValueError(keep)
    if keep == "latest" and ts_col is None:
        raise ValueError("keep='latest' needs ts_col")
    check_pow2(num_buckets)
    if not unique_ids:
        return _dedup_rows_shuffle(ds, key_col=key_col, id_col=id_col, keep=keep, ts_col=ts_col)
    int_key = pa.types.is_integer(ds.schema().base_schema.field(key_col).type)

    narrow_cols = [key_col, id_col] + ([ts_col] if keep == "latest" else [])
    narrow_cols = list(dict.fromkeys(narrow_cols))  # key_col may equal id_col

    need_h2 = not int_key
    need_ord = keep == "latest"

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if int_key:
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h1 = splitmix64(k).astype(np.int64)
            h2 = np.zeros(len(ids), dtype=np.int64)
        else:
            vals = batch[key_col].to_pylist()
            h1 = np.empty(len(vals), dtype=np.int64)
            h2 = np.empty(len(vals), dtype=np.int64)
            for i, v in enumerate(vals):
                b = v.encode("utf-8") if isinstance(v, str) else (v if v is not None else b"")
                h1[i], h2[i] = hash_bytes128(b)
        if keep == "latest":
            ts_arr = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
            ts_i = ts_arr.astype(np.int64)
            # NaT's int64 sentinel is INT64_MIN, whose negation wraps to
            # itself — null timestamps must LOSE, not win
            order = np.where(np.isnat(ts_arr), np.iinfo(np.int64).max, -ts_i)
        else:
            order = np.zeros(len(ids), dtype=np.int64)
        # LIST-PACK the shuffle: Ray's sort-based groupby cost tracks
        # ROW COUNT far more than bytes — shuffling one (h, h2, id, ord)
        # row per input row made the loser election minutes at 50M rows.
        # A key's rows still co-locate (same h → same bucket). int keys:
        # h1 is a bijection, h2 is all-zero; keep='first': order is
        # all-zero — omitting them halves the shuffled bytes.
        bucket = (h1.view(np.uint64) & np.uint64(num_buckets - 1)).astype(np.int64)
        cols = {"hs": h1, "ids": ids}
        if need_h2:
            cols["h2s"] = h2
        if need_ord:
            cols["ords"] = order
        return _pack_by_bucket(bucket, cols)

    def losers_of(group: pa.Table) -> pa.Table:
        h1 = np.asarray(group["hs"].combine_chunks().flatten())
        ids = np.asarray(group["ids"].combine_chunks().flatten())
        h2 = np.asarray(group["h2s"].combine_chunks().flatten()) if need_h2 else None
        order = np.asarray(group["ords"].combine_chunks().flatten()) if need_ord else None
        # sort by (h1[, h2][, order], id): the first row of each
        # (h1[, h2]) run wins, the rest are losers — all-zero keys are
        # omitted from the sort entirely (the fast int-key path)
        keys = [ids]
        if need_ord:
            keys.append(order)
        if need_h2:
            keys.append(h2)
        keys.append(h1)
        perm = np.lexsort(tuple(keys))
        h1s, ids_s = h1[perm], ids[perm]
        first = np.concatenate([[True], h1s[1:] != h1s[:-1]])
        if need_h2:
            h2s = h2[perm]
            first[1:] |= h2s[1:] != h2s[:-1]
        # duplicate-id guard within a key run (see exact_dedup
        # docstring); Python touches only multi-row runs (= dup groups)
        key_run = np.flatnonzero(first)
        run_len = np.diff(np.append(key_run, len(ids_s)))
        multi = run_len > 1
        for s, ln in zip(key_run[multi], run_len[multi]):
            if len(np.unique(ids_s[s : s + ln])) != ln:
                raise ValueError(
                    "exact_dedup: duplicate id_col values in a key group — "
                    "the id-based loser filter would drop every copy "
                    "INCLUDING the winner (silent data loss). For replayed/"
                    "duplicated inputs pass unique_ids=False."
                )
        return pa.table({"__loser": pa.array(ids_s[~first])})

    losers = (
        ds.select_columns(narrow_cols)
        # whole-block batches: the pack emits ≤ num_buckets list-rows
        # PER CALL — row-sized batches would emit one packed row per
        # few input rows and defeat the row-count reduction
        .map_batches(extract, batch_format="pyarrow", batch_size=None)
        .groupby("__b")
        .map_groups(losers_of, batch_format="pyarrow")
        .materialize()  # narrow (ids only), bounded by the duplicate count
    )
    n_losers = losers.count()

    if n_losers <= loser_broadcast_limit:
        if n_losers == 0:
            return ds
        arr = np.sort(losers.to_pandas()["__loser"].to_numpy().astype(np.int64))
        ref = ray.put(arr)

        def drop(batch: pa.Table) -> pa.Table:
            la = ray.get(ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(la, ids)
            pos[pos == len(la)] = 0
            is_loser = la[pos] == ids
            return batch.filter(pa.array(~is_loser))

        return ds.map_batches(drop, batch_format="pyarrow", batch_size=None)

    # fallback: distributed anti-join by id (bucket co-partition)
    schema = ds.schema().base_schema
    out_cols = list(schema.names)

    def tag_src(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(ids) & np.uint64(num_buckets - 1)).astype(np.int64)
        return (
            batch.append_column("__bucket", pa.array(b))
            .append_column("__loser", pa.nulls(len(batch), pa.int64()))
        )

    def tag_losers(batch: pa.Table) -> pa.Table:
        lid = batch["__loser"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (splitmix64(lid) & np.uint64(num_buckets - 1)).astype(np.int64)
        t = pa.table(
            {c: pa.nulls(len(batch), schema.field(c).type) for c in out_cols}
        )
        return t.append_column("__bucket", pa.array(b)).append_column(
            "__loser", batch["__loser"]
        )

    from changesetmd_ray.stages.exchange import flat, pack_by_bucket

    order_cols = [*out_cols, "__bucket", "__loser"]
    pk_cols = [*out_cols, "__loser"]

    def pack(b: pa.Table) -> pa.Table:
        # list-packed exchange (stages/exchange.py): this is the
        # above-broadcast-limit path, so the payload rows themselves
        # ride the all-to-all — pack them per bucket
        return pack_by_bucket(b.select(order_cols), "__bucket", pk_cols)

    union = (
        ds.map_batches(tag_src, batch_format="pyarrow")
        .map_batches(pack, batch_format="pyarrow")
        .union(
            losers.map_batches(tag_losers, batch_format="pyarrow").map_batches(
                pack, batch_format="pyarrow"
            )
        )
    )

    def anti(packed: pa.Table) -> pa.Table:
        group = pa.table({c: flat(packed, c) for c in pk_cols})
        lmask = np.asarray(group["__loser"].is_valid())
        src = group.filter(pa.array(~lmask)).select(out_cols)
        lids = np.unique(
            group.filter(pa.array(lmask))["__loser"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if len(lids) == 0 or len(src) == 0:
            return src
        ids = src[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(lids, ids)
        pos[pos == len(lids)] = 0
        return src.filter(pa.array(lids[pos] != ids))

    return union.groupby("__bucket").map_groups(anti, batch_format="pyarrow")


def _pack_by_bucket(bucket: np.ndarray, cols: dict, bucket_col: str = "__b") -> pa.Table:
    """One packed list-row per distinct bucket value in this block —
    the int64-numpy fast path of the list-packing idea (Ray's sort
    shuffle is row-count-bound; see stages/reduce.py for the original
    measurement). The general Arrow-table variant lives in
    :mod:`changesetmd_ray.stages.exchange` (``pack_by_bucket``) — keep
    offset/empty-schema fixes in sync between the two. Empty-safe.
    All packed columns must be int64 numpy arrays."""
    if len(bucket) == 0:
        return pa.table(
            {bucket_col: pa.array([], pa.int64()),
             **{n: pa.array([], pa.list_(pa.int64())) for n in cols}}
        )
    if len(bucket) >= 2**31:  # int32 list offsets below would wrap silently
        raise ValueError(
            f"_pack_by_bucket: block of {len(bucket)} rows overflows int32 "
            "list offsets — repartition to smaller blocks before packing"
        )
    order = np.argsort(bucket, kind="stable")
    b_s = bucket[order]
    offs = segment_starts(b_s).astype(np.int32)

    def packed(col):
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(col[order]))

    return pa.table(
        {bucket_col: pa.array(b_s[offs[:-1]]),
         **{n: packed(c) for n, c in cols.items()}}
    )


def _pair_index_blocks(n: int, max_pairs: int = 1 << 21):
    """Yield ``(px, py)`` int64 index arrays covering every ``i < j``
    pair of ``range(n)`` in blocks of ≤ ``max_pairs`` pairs — bounds the
    working-set of vectorized pair kernels on hot buckets (a group of
    100 k near-identical docs is 5 × 10⁹ pairs; never materialize that
    in one shot)."""
    rows_per_block = max(1, max_pairs // max(n - 1, 1))
    for s in range(0, n - 1, rows_per_block):
        e = min(s + rows_per_block, n - 1)
        rows = np.arange(s, e, dtype=np.int64)
        counts = n - rows - 1
        total = int(counts.sum())
        px = np.repeat(rows, counts)
        starts = np.concatenate([[0], np.cumsum(counts[:-1])])
        py = np.arange(total, dtype=np.int64) - np.repeat(starts, counts) + px + 1
        yield px, py


def _pair_distinct_ds(pairs, num_buckets: int = 256):
    """Exact distinct over an (id_a, id_b) pair Dataset: bucket by pair
    hash, unique within each bucket — one bounded shuffle of candidate
    pairs (a pair colliding in several LSH bands appears once per
    band). Rows are LIST-PACKED per block (and locally pre-deduped)
    before the shuffle: Ray's sort shuffle is row-count-bound, and a
    hot near-dup cluster emits each pair once per band."""

    def pack(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return _pack_by_bucket(np.empty(0, dtype=np.int64), {"pa_": a, "pb_": b}, "__pb")
        # local pre-dedup: same-band duplicates within this block vanish
        # before any bytes move
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            a, b = a[first], b[first]
        h = (
            splitmix64(splitmix64(a.view(np.uint64)) ^ b.view(np.uint64))
            & np.uint64(num_buckets - 1)
        ).astype(np.int64)
        return _pack_by_bucket(h, {"pa_": a, "pb_": b}, "__pb")

    def uniq(group: pa.Table) -> pa.Table:
        a = np.asarray(group["pa_"].combine_chunks().flatten())
        b = np.asarray(group["pb_"].combine_chunks().flatten())
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
            a, b = a[first], b[first]
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    return (
        pairs.map_batches(pack, batch_format="pyarrow", batch_size=None)
        .groupby("__pb")
        .map_groups(uniq, batch_format="pyarrow")
    )


def minhash_lsh_candidates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_w: int = 3,
    char_ngrams: int | None = None,
    threshold: float | None = 0.8,
    carry_text: bool = False,
    concurrency=(1, 8),
    batch_size: int = 1024,
    num_fold_buckets: int = 256,
    candidate_broadcast_limit: int = 4_000_000,
    hot_band_limit: int = 4096,
):
    """Near-duplicate candidate pairs via MinHash + banded LSH — the
    TWO-PHASE shape.

    Returns a Dataset ``(id_a, id_b, est_jaccard[, jaccard])`` with
    ``id_a < id_b``, each pair once. With ``threshold`` set, pairs
    below it (signature estimate; exact Jaccard when ``carry_text``)
    are dropped.

    Scale shape — the signatures never ride the all-to-all:

    1. **Band phase**: each doc contributes ``n_bands`` 16-byte
       ``(band_key, id)`` pairs, LIST-PACKED by fold bucket per block
       (Ray's sort shuffle is row-count-bound, and shipping the
       n_perm-wide signature once per band — the one-phase design —
       multiplied shuffle bytes 64×). Inside a bucket, pairs are
       enumerated per identical band key with blocked vectorized
       index arithmetic; a bucketed distinct collapses multi-band
       collisions.
    2. **Verify phase**: signatures (and shingle sets when
       ``carry_text``) are recomputed for CANDIDATE docs only —
       candidates ≪ corpus in the LSH regime, the same bounded-pair
       assumption :func:`duplicate_clusters` documents — broadcast
       once via ``ray.put``, and the pair Dataset streams through a
       vectorized est/Jaccard check. When the candidate set exceeds
       ``candidate_broadcast_limit`` ids (a dup-heavy crawl where
       candidates are NOT ≪ corpus), verification switches to the
       FULLY DISTRIBUTED path — candidate ids distinct-ed without a
       driver collect, candidate texts fetched through one bounded
       ``hash_join`` shuffle, and signatures attached to the pair
       Dataset by two more id-bucketed joins — nothing candidate-sized
       ever reaches the driver or a single ``ray.put`` object.

    ``hot_band_limit`` guards the adversarial all-near-identical
    regime: a band segment pairing ≥ that many docs (every doc
    colliding with every other, in every band) emits a STAR around its
    smallest id instead of the full m²/2 enumeration. Downstream
    clustering is unchanged (the star spans the component — every
    member still verifies against the representative); the pairwise
    list within a mega-segment is intentionally reduced, which is the
    documented trade (such corpora are exact-dedup's job first).
    Standard corpora never form segments that large.

    Measured trade-off (100 k docs / 2 % near-dups, 32 CPUs): 25.8 s →
    5.1 s vs the one-phase design that shipped signatures per band.
    The adversarial inverse regime — EVERY doc near-identical, so each
    pair collides in all bands and is emitted once per band before the
    distinct — runs ~2-3× slower than one-phase (30 s vs 10 s at 5 k
    docs / 12.5 M pairs, 8 CPUs); such corpora are exact-dedup's job
    first.
    """
    check_pow2(num_fold_buckets, "num_fold_buckets")
    _ = concurrency  # kept for API compat; tasks autoscale with the executor
    a_par, b_par = minhash_params(n_perm)

    def doc_hashes(text: str) -> np.ndarray:
        if char_ngrams:
            return char_ngram_hashes(text or "", char_ngrams)
        return shingle_hashes(token_hashes(tokenize(text or "")), shingle_w)

    def sig_matrix(texts: list) -> np.ndarray:
        sigs = np.empty((len(texts), n_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(doc_hashes(t), a_par, b_par)
        return sigs

    # ------------------------------------------------ phase 1: bands
    def band_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return _pack_by_bucket(
                np.empty(0, dtype=np.int64),
                {"bands": np.empty(0, dtype=np.int64), "ids": np.empty(0, dtype=np.int64)},
                "__bucket",
            )
        bk = band_keys_matrix(sig_matrix(texts), n_bands)  # (n, n_bands) uint64
        band = bk.view(np.int64).reshape(-1)  # doc-major
        rep_id = np.repeat(ids, n_bands)
        bucket = (band.view(np.uint64) & np.uint64(num_fold_buckets - 1)).astype(np.int64)
        return _pack_by_bucket(bucket, {"bands": band, "ids": rep_id}, "__bucket")

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        band_rows, batch_format="pyarrow", batch_size=batch_size
    )

    def cand_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        bands = np.asarray(group["bands"].combine_chunks().flatten())
        ids = np.asarray(group["ids"].combine_chunks().flatten())
        if len(bands) < 2:
            return empty
        order = np.lexsort((ids, bands))
        b_s, i_s = bands[order], ids[order]
        starts = segment_starts(b_s)
        counts = np.diff(starts)
        out_a, out_b = [], []
        # the vast majority of colliding band keys pair exactly two
        # docs: handle those in one vectorized shot, loop only over the
        # rare larger segments
        g2 = np.flatnonzero(counts == 2)
        if len(g2):
            aa, bb = i_s[starts[g2]], i_s[starts[g2] + 1]
            keep = aa != bb  # sorted by id → aa ≤ bb
            out_a.append(aa[keep])
            out_b.append(bb[keep])
        for j in np.flatnonzero(counts >= 3):
            seg = i_s[starts[j] : starts[j + 1]]
            if len(seg) >= hot_band_limit:
                # mega-segment star guard (see docstring): pair every
                # member with the segment's min id only — m−1 rows
                # instead of m²/2 per band, component connectivity kept
                u = np.unique(seg)
                if len(u) >= 2:
                    out_a.append(np.full(len(u) - 1, u[0], dtype=np.int64))
                    out_b.append(u[1:])
                continue
            for px, py in _pair_index_blocks(len(seg)):
                aa, bb = seg[px], seg[py]
                keep = aa != bb
                out_a.append(aa[keep])
                out_b.append(bb[keep])
        if not out_a:
            return empty
        return pa.table(
            {"id_a": pa.array(np.concatenate(out_a), pa.int64()),
             "id_b": pa.array(np.concatenate(out_b), pa.int64())}
        )

    cand = _pair_distinct_ds(
        exploded.groupby("__bucket").map_groups(cand_pairs, batch_format="pyarrow")
    ).materialize()

    out_schema = {"id_a": pa.int64(), "id_b": pa.int64(), "est_jaccard": pa.float64()}
    if carry_text:
        out_schema["jaccard"] = pa.float64()
    empty_out = pa.table({c: pa.array([], t) for c, t in out_schema.items()})
    n_pairs = cand.count()
    if n_pairs == 0:
        import ray.data as _rd

        return _rd.from_arrow(empty_out)
    if 2 * n_pairs > candidate_broadcast_limit:
        # candidate ids can exceed the broadcast budget (dup-heavy
        # corpus): verify with zero driver materialization instead
        return _minhash_verify_distributed(
            cand, ds, id_col=id_col, text_col=text_col,
            doc_hashes=doc_hashes, a_par=a_par, b_par=b_par, n_perm=n_perm,
            threshold=threshold, carry_text=carry_text,
            num_fold_buckets=num_fold_buckets, batch_size=batch_size,
        )

    # candidate doc ids (bounded by the pair count — the documented
    # LSH regime; duplicate_clusters makes the same assumption)
    parts = cand.map_batches(
        lambda b: pa.table({"i": pa.array(np.unique(np.concatenate([
            b["id_a"].to_numpy(zero_copy_only=False),
            b["id_b"].to_numpy(zero_copy_only=False)])))}),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    cand_ids = np.unique(np.asarray([r["i"] for r in parts], dtype=np.int64))
    idref = ray.put(cand_ids)

    # -------------------- phase 2a: candidate signatures (one pass)
    def cand_sigs(batch: pa.Table) -> pa.Table:
        la = ray.get(idref) if isinstance(idref, ray.ObjectRef) else idref
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(la, ids)
        pos[pos == len(la)] = 0
        m = la[pos] == ids if len(la) else np.zeros(len(ids), dtype=bool)
        # filter FIRST: only candidate rows pay the Python-str conversion
        sub = batch.filter(pa.array(m))
        texts = sub[text_col].to_pylist()
        # hash each text ONCE; signatures derive from the same hash sets
        hs = [doc_hashes(t) for t in texts]
        sigs = np.empty((len(hs), n_perm), dtype=np.uint64)
        for i, h in enumerate(hs):
            sigs[i] = minhash_signature(h, a_par, b_par)
        cols = {"cid": pa.array(ids[m], pa.int64())}
        cols["sig"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64) if sigs.size else
                     np.empty(0, dtype=np.int64)), n_perm
        )
        if carry_text:
            offs = np.concatenate([[0], np.cumsum([len(h) for h in hs])]).astype(np.int64)
            flat = np.concatenate([h.view(np.int64) for h in hs]) if hs else np.empty(0, dtype=np.int64)
            cols["hashes"] = pa.ListArray.from_arrays(
                pa.array(offs, pa.int64()).cast(pa.int32()), pa.array(flat)
            )
        return pa.table(cols)

    rows = ds.select_columns([id_col, text_col]).map_batches(
        cand_sigs, batch_format="pyarrow", batch_size=batch_size
    ).take_all()
    sid = np.asarray([r["cid"] for r in rows], dtype=np.int64)
    order_s = np.argsort(sid, kind="stable")
    sid = sid[order_s]
    smat = (
        np.asarray([r["sig"] for r in rows], dtype=np.int64)[order_s].view(np.uint64)
        if len(rows) else np.empty((0, n_perm), dtype=np.uint64)
    )
    smatT = np.ascontiguousarray(smat.T)
    shashes = None
    if carry_text:
        shashes = [np.asarray(rows[i]["hashes"], dtype=np.int64).view(np.uint64)
                   for i in order_s]
    vref = ray.put((sid, smatT, shashes))

    # -------------------- phase 2b: streaming vectorized verification
    def verify(batch: pa.Table) -> pa.Table:
        sid_, smatT_, shs = ray.get(vref) if isinstance(vref, ray.ObjectRef) else vref
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # guarded lookups: a candidate id can be absent from phase 2a
        # only if ds's lineage is unstable across executions (the two
        # phases each run it once — e.g. a limit()/sample() upstream
        # without materialize()). That is a data-integrity failure, not
        # a droppable row: raise instead of silently losing pairs.
        hi = max(len(sid_) - 1, 0)
        pa_i = np.minimum(np.searchsorted(sid_, a), hi)
        pb_i = np.minimum(np.searchsorted(sid_, b), hi)
        found = (
            (sid_[pa_i] == a) & (sid_[pb_i] == b)
            if len(sid_) else np.zeros(len(a), dtype=bool)
        )
        n_dropped = int(len(a) - found.sum())
        if n_dropped:
            raise ValueError(
                f"{n_dropped} candidate pair(s) reference doc ids absent from "
                "the signature pass — the input Dataset's lineage is not "
                "stable across executions (materialize() it upstream of "
                "minhash_lsh_candidates)"
            )
        a, b, pa_i, pb_i = a[found], b[found], pa_i[found], pb_i[found]
        est = eq_count_pairs(smatT_, pa_i, pb_i) / np.float64(n_perm)
        keep = np.ones(len(a), dtype=bool)
        jj = None
        if carry_text:
            jj = np.fromiter(
                (jaccard(shs[int(x)], shs[int(y)]) for x, y in zip(pa_i, pb_i)),
                np.float64, len(a),
            )
            if threshold is not None:
                keep = jj >= threshold
        elif threshold is not None:
            keep = est >= threshold
        out = {"id_a": pa.array(a[keep], pa.int64()),
               "id_b": pa.array(b[keep], pa.int64()),
               "est_jaccard": pa.array(est[keep], pa.float64())}
        if carry_text:
            out["jaccard"] = pa.array(jj[keep], pa.float64())
        return pa.table(out)

    return cand.map_batches(verify, batch_format="pyarrow", batch_size=None)


def _minhash_verify_distributed(
    cand, ds, *, id_col, text_col, doc_hashes, a_par, b_par, n_perm,
    threshold, carry_text, num_fold_buckets, batch_size,
):
    """MinHash phase 2 with ZERO driver materialization — the path for
    candidate sets that exceed the broadcast budget (dup-heavy corpora
    where candidates are NOT ≪ corpus).

    1. distinct candidate ids: bucketed pack + per-bucket unique (a
       Dataset, never collected);
    2. candidate texts: ONE ``hash_join`` of those ids against the
       corpus — only candidate rows' text rides the shuffle;
    3. signatures per candidate (map, then ``materialize()`` into the
       object store — distributed and spillable, unlike a driver
       ``ray.put``), attached to the pair Dataset by two id-bucketed
       ``hash_join``s (id_a then id_b);
    4. the same vectorized est/Jaccard check, now per joined batch.

    Inner-join semantics drop pairs whose ids miss the signature pass;
    as in the broadcast path that only happens on unstable input
    lineage, and the broadcast path's raise is the documented guard —
    here the cost of a distributed count would double-execute the
    pipeline, so the contract is: materialize() unstable inputs."""
    from changesetmd_ray.joins.equi import hash_join

    mask = np.uint64(num_fold_buckets - 1)

    def explode_ids(batch: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            batch["id_a"].to_numpy(zero_copy_only=False),
            batch["id_b"].to_numpy(zero_copy_only=False),
        ]).astype(np.int64)) if len(batch) else np.empty(0, dtype=np.int64)
        b = (splitmix64(ids.view(np.uint64)) & mask).astype(np.int64)
        return _pack_by_bucket(b, {"cid": ids})

    def uniq_ids(group: pa.Table) -> pa.Table:
        vals = np.unique(np.asarray(group["cid"].combine_chunks().flatten()))
        return pa.table({"cid": pa.array(vals, pa.int64())})

    ids_ds = (
        cand.map_batches(explode_ids, batch_format="pyarrow", batch_size=None)
        .groupby("__b")
        .map_groups(uniq_ids, batch_format="pyarrow")
    )
    docs = hash_join(
        ids_ds, ds.select_columns([id_col, text_col]),
        left_on="cid", right_on=id_col,
        left_cols=["cid"], right_cols=[text_col],
    )

    def sig_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hs = [doc_hashes(t) for t in texts]
        sigs = np.empty((len(hs), n_perm), dtype=np.uint64)
        for i, h in enumerate(hs):
            sigs[i] = minhash_signature(h, a_par, b_par)
        cols = {"cid": batch["cid"]}
        cols["sig"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64) if sigs.size else
                     np.empty(0, dtype=np.int64)), n_perm
        )
        if carry_text:
            offs = np.concatenate([[0], np.cumsum([len(h) for h in hs])]).astype(np.int64)
            flat = (np.concatenate([h.view(np.int64) for h in hs]) if hs
                    else np.empty(0, dtype=np.int64))
            cols["hashes"] = pa.ListArray.from_arrays(
                pa.array(offs, pa.int64()).cast(pa.int32()), pa.array(flat)
            )
        return pa.table(cols)

    sig_cols = ["sig", *(["hashes"] if carry_text else [])]
    sigs_ds = docs.map_batches(
        sig_rows, batch_format="pyarrow", batch_size=batch_size
    ).materialize()  # computed once, read by both joins

    def rename(suffix):
        names = {"cid": f"c{suffix}",
                 **{c: f"{c}_{suffix}" for c in sig_cols}}

        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([names[c] for c in batch.column_names])

        return fn

    j1 = hash_join(
        cand, sigs_ds.map_batches(rename("a"), batch_format="pyarrow"),
        left_on="id_a", right_on="ca",
        left_cols=["id_a", "id_b"],
        right_cols=[f"{c}_a" for c in sig_cols],
    )
    j2 = hash_join(
        j1, sigs_ds.map_batches(rename("b"), batch_format="pyarrow"),
        left_on="id_b", right_on="cb",
        left_cols=["id_a", "id_b", *(f"{c}_a" for c in sig_cols)],
        right_cols=[f"{c}_b" for c in sig_cols],
    )

    def verify_joined(batch: pa.Table) -> pa.Table:
        n = len(batch)
        out_cols = {"id_a": batch["id_a"], "id_b": batch["id_b"]}
        if n == 0:
            out = {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                   "est_jaccard": pa.array([], pa.float64())}
            if carry_text:
                out["jaccard"] = pa.array([], pa.float64())
            return pa.table(out)
        sa = np.asarray(batch["sig_a"].combine_chunks().flatten()).reshape(n, n_perm)
        sb = np.asarray(batch["sig_b"].combine_chunks().flatten()).reshape(n, n_perm)
        est = (sa == sb).mean(axis=1)
        keep = np.ones(n, dtype=bool)
        jj = None
        if carry_text:
            ha = batch["hashes_a"].combine_chunks()
            hb = batch["hashes_b"].combine_chunks()
            jj = np.fromiter(
                (jaccard(np.asarray(ha[i].values, dtype=np.int64).view(np.uint64),
                         np.asarray(hb[i].values, dtype=np.int64).view(np.uint64))
                 for i in range(n)),
                np.float64, n,
            )
            if threshold is not None:
                keep = jj >= threshold
        elif threshold is not None:
            keep = est >= threshold
        m = pa.array(keep)
        out = {"id_a": out_cols["id_a"].combine_chunks().filter(m),
               "id_b": out_cols["id_b"].combine_chunks().filter(m),
               "est_jaccard": pa.array(est[keep], pa.float64())}
        if carry_text:
            out["jaccard"] = pa.array(jj[keep], pa.float64())
        return pa.table(out)

    return j2.map_batches(verify_joined, batch_format="pyarrow")


def _simhash_chunk_params(n_bands: int) -> tuple[np.ndarray, np.ndarray]:
    """(shift, mask) uint64 arrays for the n_bands chunk split of 64
    bits (last band takes the remainder; width-64 mask guarded)."""
    width = 64 // n_bands
    lo = np.arange(n_bands, dtype=np.uint64) * np.uint64(width)
    ws = np.full(n_bands, width, dtype=np.uint64)
    ws[-1] = np.uint64(64 - (n_bands - 1) * width)
    masks = np.full(n_bands, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    small = ws < 64
    masks[small] = (np.uint64(1) << ws[small]) - np.uint64(1)
    return lo, masks


def _explode_hamming_fp(ids: np.ndarray, fps: np.ndarray, *, n_bands: int,
                        num_fold_buckets: int, id_col: str) -> pa.Table:
    """Explode 64-bit fingerprints into the (band, __bucket, id, fp)
    layout the Hamming bucket-pair reducer consumes: split 64 bits into
    n_bands chunks; band key = splitmix64(band_idx ∥ chunk)."""
    lo, masks = _simhash_chunk_params(n_bands)
    chunks = (fps[:, None] >> lo[None, :]) & masks[None, :]  # (n, n_bands)
    keys = splitmix64(
        chunks ^ (np.arange(n_bands, dtype=np.uint64)[None, :] << np.uint64(58))
    )
    band = keys.T.reshape(-1)  # band-major to match the tile layout
    fold = (band & np.uint64(num_fold_buckets - 1)).astype(np.int64)
    return pa.table(
        {
            "band": pa.array(band.astype(np.int64)),
            "__bucket": pa.array(fold),
            id_col: pa.array(np.tile(ids, n_bands)),
            "fp": pa.array(np.tile(fps.astype(np.int64), n_bands)),
        }
    )


class _SimHashStage:
    def __init__(self, max_hamming: int, text_col: str, id_col: str,
                 num_fold_buckets: int = 256, token_hasher=None):
        self.n_bands = max_hamming + 1
        self.text_col = text_col
        self.id_col = id_col
        self.num_fold_buckets = num_fold_buckets
        self.token_hasher = token_hasher or token_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        th = self.token_hasher
        fps = np.fromiter(
            (simhash64(th(tokenize(t or ""))) for t in texts), np.uint64, len(texts)
        )
        return _explode_hamming_fp(
            ids, fps, n_bands=self.n_bands,
            num_fold_buckets=self.num_fold_buckets, id_col=self.id_col,
        )


def simhash_candidates(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency=(1, 8),
    num_fold_buckets: int = 256,
    token_hasher=None,
    hot_group_limit: int | None = None,
):
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``.

    ``hot_group_limit`` defaults OFF here (full enumeration — the
    value-exact SQL-oracle contract below depends on it); set it (e.g.
    4096, the :func:`hamming_candidates` default) to enable the
    connectivity-preserving mega-cluster reduction on spam-shaped
    corpora where thousands of documents share a fingerprint chunk.
    Pigeonhole banding guarantees recall 1.0 w.r.t. the fingerprints;
    exact Hamming check inside each bucket; emit-once via the
    lowest-matching-band rule. Returns ``(id_a, id_b, hamming)``.

    ``token_hasher`` overrides the per-token hash (default
    crc32→splitmix); pass :func:`~changesetmd_ray.text.hashing.md5_token_hashes`
    for the SQL-reproducible fingerprint configuration — the output is
    then EXACTLY the Hamming-≤-t pair set over md5-derived fingerprints,
    which a pure-SQL oracle recomputes bit-for-bit (no recall caveat:
    pigeonhole banding is a guarantee, not a probability).

    Same fold-bucket + vectorized pair shape as
    :func:`minhash_lsh_candidates`: bands fold into
    ``num_fold_buckets`` coarse groups; inside a group, rows regroup by
    exact chunk value with ``np.unique`` and pairs are enumerated with
    blocked index arithmetic (popcount Hamming, argmax emit-once)."""
    check_pow2(num_fold_buckets, "num_fold_buckets")

    _ = concurrency  # task pool: stage state rebuilds in microseconds,
    # and fresh actor processes pay cold-start + first-touch paging

    def simhash_fn(batch):
        return _SimHashStage(
            max_hamming=max_hamming, text_col=text_col, id_col=id_col,
            num_fold_buckets=num_fold_buckets, token_hasher=token_hasher,
        )(batch)

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        simhash_fn, batch_format="pyarrow"
    )
    return exploded.groupby("__bucket").map_groups(
        _make_hamming_bucket_pairs(id_col, max_hamming, hot_group_limit),
        batch_format="pyarrow",
    )


def _make_hamming_bucket_pairs(id_col: str, max_hamming: int,
                               hot_group_limit: int | None = None):
    """Per-bucket reducer over the :func:`_explode_hamming_fp` layout:
    regroup by (routing band, chunk value) with ``np.unique``, enumerate
    pairs with blocked index arithmetic, exact popcount-Hamming check,
    emit-once via the lowest-matching-band rule.

    ``hot_group_limit`` guards the adversarial mega-cluster regime (the
    minhash ``hot_band_limit`` analogue): a (band, chunk) group pairing
    ≥ that many rows switches to a CONNECTIVITY-PRESERVING reduction —
    rows with IDENTICAL fingerprints collapse to a star around their
    min id (distance 0 is transitive, so the star spans the class
    exactly), and cross pairs are enumerated between class
    REPRESENTATIVES only. Connected components over the emitted pairs
    (the dedup consumer) are IDENTICAL to the full enumeration's: every
    member reaches its representative through a 0-distance edge, and
    ``hamming(u, v)`` depends only on the two fingerprints, so a
    rep-rep edge exists iff every member-member edge between the two
    classes does. Only the pairwise LIST is reduced (m−1 + distinct²/2
    rows instead of m²/2), which is the documented trade. ``None`` =
    always enumerate in full (the value-exact SQL-oracle contract)."""
    n_bands = max_hamming + 1
    lo, masks = _simhash_chunk_params(n_bands)
    bidx = np.arange(n_bands, dtype=np.uint64)[None, :] << np.uint64(58)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
        m = len(group)
        if m < 2:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        fps = group["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        band_own = group["band"].to_numpy(zero_copy_only=False).view(np.uint64)
        chunks = (fps[:, None] >> lo[None, :]) & masks[None, :]  # (m, n_bands)
        chunksT = np.ascontiguousarray(chunks.T)  # transposed ONCE per bucket
        ckeys = splitmix64(chunks ^ bidx)
        mi = np.argmax(ckeys == band_own[:, None], axis=1)
        cval = np.take_along_axis(chunks, mi[:, None], axis=1)[:, 0]
        gkey = np.stack([mi.astype(np.uint64), cval], axis=1)
        _, labels, counts = np.unique(gkey, axis=0, return_inverse=True, return_counts=True)
        order = np.argsort(labels, kind="stable")
        out_a, out_b, out_h = [], [], []

        def emit_pairs(cand: np.ndarray, bi: int) -> None:
            """Full blocked enumeration over the candidate row indices
            with the hamming filter and the emit-once band rule."""
            for px, py in _pair_index_blocks(len(cand)):
                gx, gy = cand[px], cand[py]
                keep = ids[gx] != ids[gy]
                gx, gy = gx[keep], gy[keep]
                if len(gx) == 0:
                    continue
                d = hamming64(fps[gx], fps[gy])
                keep = d <= max_hamming
                gx, gy, d = gx[keep], gy[keep], d[keep]
                if len(gx) == 0:
                    continue
                # emit-once: the pair agrees at chunk bi by group
                # construction; emit here iff NO earlier chunk agrees
                if bi > 0:
                    early = any_eq_pairs(chunksT, gx, gy, bi)
                    gx, gy, d = gx[~early], gy[~early], d[~early]
                    if len(gx) == 0:
                        continue
                out_a.append(np.minimum(ids[gx], ids[gy]))
                out_b.append(np.maximum(ids[gx], ids[gy]))
                out_h.append(d)

        pos = 0
        for g in counts:
            idx = order[pos : pos + g]
            pos += g
            if g < 2:
                continue
            bi = int(mi[idx[0]])  # the whole group shares its routing band
            if hot_group_limit is not None and g >= hot_group_limit:
                # mega-group reduction: collapse identical fingerprints
                # to (hub, member) stars, cross-enumerate reps only
                _, inv = np.unique(fps[idx], return_inverse=True)
                o2 = np.lexsort((ids[idx], inv))
                inv_s, idx_s = inv[o2], idx[o2]
                starts = np.concatenate(
                    [[0], 1 + np.nonzero(np.diff(inv_s))[0]]).astype(np.int64)
                if bi == 0:
                    # identical fps agree on EVERY chunk, so their
                    # 0-distance star emits exactly once: in band 0
                    sel = np.ones(len(idx_s), bool)
                    sel[starts] = False
                    if sel.any():
                        hub = np.repeat(
                            ids[idx_s[starts]],
                            np.diff(np.concatenate([starts, [len(idx_s)]])))
                        out_a.append(np.minimum(hub[sel], ids[idx_s[sel]]))
                        out_b.append(np.maximum(hub[sel], ids[idx_s[sel]]))
                        out_h.append(np.zeros(int(sel.sum()), np.int64))
                emit_pairs(idx_s[starts], bi)
            else:
                emit_pairs(idx, bi)
        if not out_a:
            return empty
        return pa.table(
            {"id_a": pa.array(np.concatenate(out_a), pa.int64()),
             "id_b": pa.array(np.concatenate(out_b), pa.int64()),
             "hamming": pa.array(np.concatenate(out_h), pa.int64())}
        )

    return bucket_pairs


def hamming_candidates(
    ds,
    *,
    fp_col: str = "fp",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_fold_buckets: int = 256,
    hot_group_limit: int | None = 4096,
):
    """Near-dup pairs ``(id_a, id_b, hamming)`` over a PRECOMPUTED
    64-bit fingerprint column (int64-viewed uint64) — the generic
    Hamming-≤-t engine under :func:`simhash_candidates`, reused by
    image perceptual-hash dedup (stages/media_fp.py) and any other
    64-bit sketch.

    Pigeonhole banding over ``max_hamming + 1`` chunks guarantees
    recall 1.0: two fingerprints within Hamming t agree exactly on at
    least one chunk. Only the thin (band, id, fp) projection crosses
    the shuffle — payloads never move.

    ``hot_group_limit`` (default on, the minhash ``hot_band_limit``
    analogue) switches (band, chunk) groups pairing ≥ that many rows to
    the connectivity-preserving mega-cluster reduction — identical-
    fingerprint stars + representative cross pairs; connected
    components are identical to the full enumeration's (see
    :func:`_make_hamming_bucket_pairs`). Pass ``None`` for the
    value-exact full pair list at any scale."""
    check_pow2(num_fold_buckets, "num_fold_buckets")
    n_bands = max_hamming + 1

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        fps = batch[fp_col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return _explode_hamming_fp(
            ids, fps, n_bands=n_bands,
            num_fold_buckets=num_fold_buckets, id_col=id_col,
        )

    exploded = ds.select_columns([id_col, fp_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    return exploded.groupby("__bucket").map_groups(
        _make_hamming_bucket_pairs(id_col, max_hamming, hot_group_limit),
        batch_format="pyarrow",
    )


def duplicate_clusters_dataset(
    pairs,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_buckets: int = 64,
    max_rounds: int = 64,
):
    """Distributed connected components over a near-dup pair DATASET —
    the large-pair-list path. :func:`duplicate_clusters` union-finds on
    the driver, which assumes the pair list fits one process; a
    dup-heavy crawl's does not.

    Iterative min-label propagation, co-partitioned by vertex hash: the
    working set holds (vertex, other, kind) rows — static adjacency
    (kind 1), propagated label candidates (kind 0) and each vertex's
    current label (kind 2, which doubles as its self-candidate next
    round). One ``groupby(bucket)`` per round takes every vertex's min
    candidate and sends it to its neighbors; the global label sum is
    strictly monotone, so convergence = two equal consecutive sums.
    Rounds ≈ component diameter (near-dup clusters from the bucket
    emitters are stars/cliques → 2-3 rounds); per-round volume is
    O(E + V) rows, never the corpus. Returns a Dataset ``(doc_id,
    rep_id)``, rep = component min — identical to the driver version.
    """
    check_pow2(num_buckets)

    def init_rows(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([a, b])
        other = np.concatenate([b, a])
        return pa.table(
            {"v": pa.array(v), "other": pa.array(other),
             "kind": pa.array(np.ones(len(v), dtype=np.int8))}
        )

    def tag(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (splitmix64(v) & np.uint64(num_buckets - 1)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(bk))

    def step(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        other = group["other"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v_s, o_s, k_s = v[order], other[order], kind[order]
        starts = segment_starts(v_s)
        # per-vertex min over self + every candidate (all kinds carry
        # candidate labels: adjacency = neighbor ids = initial labels)
        # — fully segment-vectorized, no per-vertex Python
        lab_seg = np.minimum.reduceat(np.minimum(v_s, o_s), starts[:-1])
        counts = np.diff(starts)
        lab_row = np.repeat(lab_seg, counts)
        is_adj = k_s == 1
        adj_v, adj_nbr, adj_lab = v_s[is_adj], o_s[is_adj], lab_row[is_adj]
        return pa.table(
            {
                # adjacency passes through; each vertex sends its label
                # to every neighbor; keeps its label row (the
                # self-candidate next round)
                "v": pa.array(np.concatenate([adj_v, adj_nbr, v_s[starts[:-1]]])),
                "other": pa.array(np.concatenate([adj_nbr, adj_lab, lab_seg])),
                "kind": pa.array(np.concatenate([
                    np.ones(len(adj_v), dtype=np.int8),
                    np.zeros(len(adj_nbr), dtype=np.int8),
                    np.full(len(lab_seg), 2, dtype=np.int8),
                ])),
            }
        )

    def label_sum(state) -> int:
        def partial(batch: pa.Table) -> pa.Table:
            k = batch["kind"].to_numpy(zero_copy_only=False)
            o = batch["other"].to_numpy(zero_copy_only=False)
            return pa.table({"s": pa.array([int(o[k == 2].sum())], pa.int64())})

        return sum(r["s"] for r in state.map_batches(
            partial, batch_format="pyarrow").take_all())

    state = pairs.map_batches(init_rows, batch_format="pyarrow").materialize()
    prev = None
    for _ in range(max_rounds):
        state = (
            state.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(step, batch_format="pyarrow")
            .materialize()
        )
        s = label_sum(state)
        if s == prev:
            break
        prev = s
    else:
        raise RuntimeError(
            f"duplicate_clusters_dataset: no convergence in {max_rounds} rounds "
            "(component diameter exceeds max_rounds — raise it)"
        )

    def emit(batch: pa.Table) -> pa.Table:
        k = batch["kind"].to_numpy(zero_copy_only=False)
        keep = k == 2
        return pa.table(
            {"doc_id": batch["v"].filter(pa.array(keep)),
             "rep_id": batch["other"].filter(pa.array(keep))}
        )

    return state.map_batches(emit, batch_format="pyarrow")


def duplicate_clusters(pairs: pa.Table, *, id_a: str = "id_a", id_b: str = "id_b") -> pa.Table:
    """Union-find over a verified near-dup pair list → ``(doc_id,
    rep_id)`` with rep = min id of the component. Driver-side: assumes
    the pair list is small relative to the corpus (the standard LSH
    regime); for pathological pair counts run iterative label
    propagation over Ray instead."""
    a = pairs[id_a].to_numpy(zero_copy_only=False)
    b = pairs[id_b].to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    ids = sorted(parent)
    reps = [find(i) for i in ids]
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "rep_id": pa.array(reps, pa.int64())})


def content_keys(ds, *, key_col: str = "text", out_col: str = "key_hash"):
    """Thin (``out_col``: int64) Dataset of 64-bit blake2b content
    digests — a snapshot's PERSISTABLE key set (write it as parquet at
    crawl N, :func:`exact_dedup_against` the next crawl with it). Same
    digest convention as the line/span dedup units (``hash_bytes64``);
    the 64-bit false-collision bound is n_new·n_prior/2⁶⁴ — a handful
    of rows even at 10⁹×10⁹ keys, the documented trade for a key set
    4× thinner than the 128-bit exact_dedup key."""
    from changesetmd_ray.text.hashing import hash_bytes64

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_pylist()
        h = np.fromiter(
            (hash_bytes64(
                v.encode("utf-8") if isinstance(v, str) else (v or b""))
             for v in vals),
            np.uint64, len(vals))
        return pa.table({out_col: pa.array(h.astype(np.int64), pa.int64())})

    return ds.select_columns([key_col]).map_batches(fn, batch_format="pyarrow")


def exact_dedup_against(ds, prior_keys, *, key_col: str = "text",
                        prior_col: str = "key_hash",
                        broadcast_limit: int = 16_000_000,
                        num_buckets: int = 128):
    """Cross-snapshot dedup (the monthly-recrawl operation): drop rows
    whose content key already exists in a PRIOR snapshot's key set
    (:func:`content_keys` output, typically re-read from parquet).

    Scale shape: the new corpus maps to a thin digest column in-flight
    (payload never shuffles); the prior key set goes through the
    size-gated membership join — ``ray.put`` broadcast below
    ``broadcast_limit`` distinct keys, bucketed shuffle anti-join
    above. Within-snapshot duplicates are :func:`exact_dedup`'s job —
    compose both for full dedup."""
    from changesetmd_ray.joins.broadcast import anti_join
    from changesetmd_ray.text.hashing import hash_bytes64

    def attach(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_pylist()
        h = np.fromiter(
            (hash_bytes64(
                v.encode("utf-8") if isinstance(v, str) else (v or b""))
             for v in vals),
            np.uint64, len(vals))
        return batch.append_column("__kh", pa.array(h.astype(np.int64), pa.int64()))

    tagged = ds.map_batches(attach, batch_format="pyarrow")
    out = anti_join(tagged, prior_keys, big_on="__kh", small_on=prior_col,
                    broadcast_limit=broadcast_limit, num_buckets=num_buckets)
    return out.drop_columns(["__kh"])
