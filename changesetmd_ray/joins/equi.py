"""J1 — distributed hash equi-join with optional skew salting
(SURVEY.md §2.4 J1, §4.3.2).

The reference's parent↔child link (``osm_changeset`` ⋈
``osm_changeset_comment`` on the changeset id, reference
``queries.py:21-27``, ``README.md:208-214``) executed by Postgres as a
hash join. Ray-native shape for two LARGE sides (when neither fits a
broadcast — otherwise use the ``ray.put`` + ``searchsorted`` lookup
pattern, e.g. ``q_orders_per_segment``):

1. both sides are column-pruned, tagged with ``__side``, a 64-bit join
   key ``__jk`` and ``__bucket = __jk & (B-1)``,
2. one union + one ``groupby(__bucket)`` shuffle co-partitions matching
   keys (B is a knob ≈ 4× cluster cores — the per-group Python dispatch
   stays O(B) while keys spread evenly),
3. inside each bucket the match is fully vectorized: sort the right
   side's join keys once, ``searchsorted`` every left key against it,
   expand the hit ranges with ``repeat``/cumsum arithmetic, and gather
   payload columns with Arrow ``take`` (works for any column type, zero
   row loops), then drop the (negligible) 64-bit-hash collision pairs
   with an exact key recheck.

**Skew salting** (``pair_budget``): a catastrophically hot key would
otherwise put its entire L×R output into ONE group/block. With a budget
set, a heavy-hitter pre-pass (per-block top keys, combined
distributed) finds keys whose pairwise work exceeds it; each such key
hash-splits its LARGER side into ``k`` salt shards (round-robin within
a block) and replicates the smaller side ``k`` ways — the salt feeds
``__jk``, so the shards land in different buckets and no group's output
exceeds ≈ budget rows. Shards partition the split side disjointly, so
the output needs no dedup. The pre-pass tracks only each block's top
keys: a key hot enough to matter appears many times per block, so
undercounting spread-thin moderate keys is safe (they fit the budget
anyway).

Inner join semantics; null keys never match (SQL parity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from changesetmd_ray.stages.exchange import flat, pack_by_bucket
from changesetmd_ray.text.hashing import check_pow2, splitmix64


def _clean_keys(batch: pa.Table, key: str, cols: list[str]) -> tuple[pa.Table, np.ndarray]:
    batch = batch.select(cols)
    valid = ~np.asarray(pc.is_null(batch[key]).combine_chunks())
    batch = batch.filter(pa.array(valid))
    return batch, batch[key].to_numpy(zero_copy_only=False).astype(np.int64)


def _hot_key_counts(ds, key: str, hot_track: int) -> dict[int, int]:
    """Approximate per-key counts for heavy-hitter detection: each block
    reports its ``hot_track`` most frequent keys (count ≥ 2); partials
    combine distributed before a bounded driver collect.

    Detection regime (documented limitation): the per-block ``≥ 2`` cut
    means a key that is globally hot but appears ≤ once per block on
    BOTH sides evades salting entirely — output stays correct, only the
    skew protection doesn't engage. That key's per-bucket row count is
    at most the block count, so the worst case is bounded by
    blocks_left × blocks_right pairs in one bucket; keys that are ≥ 2×
    denser than the block grain (every genuinely pathological hot key —
    a key worth salting appears thousands of times per block at scale)
    are always seen. Closing the gap costs shuffling every distinct
    key once — not worth it BY DEFAULT for a pre-pass whose failure
    mode is performance, not correctness; callers that need the
    guarantee pass ``hot_exact=True`` (see :func:`_exact_hot_counts`)."""
    from changesetmd_ray.stages.reduce import _combine_table

    def partial(batch: pa.Table) -> pa.Table:
        _, k = _clean_keys(batch, key, [key])
        u, c = np.unique(k, return_counts=True)
        keep = c >= 2
        u, c = u[keep], c[keep]
        if len(u) > hot_track:
            top = np.argpartition(-c, hot_track - 1)[:hot_track]
            u, c = u[top], c[top]
        return pa.table({"key": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())})

    combined = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(16)
        .map_batches(lambda b: _combine_table(b, "key", "n"),
                     batch_format="pyarrow", batch_size=None)
    )
    out: dict[int, int] = {}
    for row in combined.take_all():
        out[row["key"]] = out.get(row["key"], 0) + row["n"]
    return out


def _exact_hot_counts(left, right, left_on: str, right_on: str,
                      pair_budget: int) -> tuple[dict[int, int], dict[int, int]]:
    """EXACT global per-key counts restricted to budget violators —
    the ``hot_exact=True`` path that closes the sampler's documented
    spread-thin gap (a key ≤ once per block on both sides).

    Shape: each side runs a keys-only per-block count partial through
    the list-packed bucketed sum (one keys-only all-to-all per side —
    the cost the sampler avoids), then the two count tables — one row
    per distinct key, unique keys by construction so the inner join
    below cannot itself skew — hash-join distributed, and only keys
    with ``n_l × n_r > pair_budget`` reach the driver. That collect is
    self-bounding: each violator accounts for > pair_budget pairs of
    join output, so #violators ≤ total_join_pairs / pair_budget."""
    from changesetmd_ray.stages.reduce import bucket_sum

    def counts(ds, key: str, out_key: str, out_n: str):
        def partial(batch: pa.Table) -> pa.Table:
            _, k = _clean_keys(batch, key, [key])
            u, c = np.unique(k, return_counts=True)
            return pa.table({out_key: pa.array(u, pa.int64()),
                             out_n: pa.array(c, pa.int64())})

        return bucket_sum(
            ds.select_columns([key]).map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ),
            key_col=out_key, val_col=out_n,
        )

    joined = hash_join(
        counts(left, left_on, "__hk_l", "__n_l"),
        counts(right, right_on, "__hk_r", "__n_r"),
        left_on="__hk_l", right_on="__hk_r",
        left_cols=["__hk_l", "__n_l"], right_cols=["__hk_r", "__n_r"],
        num_buckets=64,
    )

    def violators(batch: pa.Table) -> pa.Table:
        nl = batch["__n_l"].to_numpy(zero_copy_only=False).astype(np.float64)
        nr = batch["__n_r"].to_numpy(zero_copy_only=False).astype(np.float64)
        # float compare: exact counts can overflow an int64 product
        return batch.filter(pa.array(nl * nr > float(pair_budget)))

    cl: dict[int, int] = {}
    cr: dict[int, int] = {}
    for row in joined.map_batches(
        violators, batch_format="pyarrow", batch_size=None
    ).take_all():
        cl[row["__hk_l"]] = row["__n_l"]
        cr[row["__hk_l"]] = row["__n_r"]
    return cl, cr


def _salt_plan(cl: dict[int, int], cr: dict[int, int], pair_budget: int,
               salt_max: int) -> dict:
    keys, ks, splits = [], [], []
    # union of both sides' heavy hitters; a missing count means the
    # tracker saw no repeats there — treat as 1, NOT 0: the motivating
    # parent-child case has unique parent keys, and a key with one
    # parent row and 10M child rows must still salt
    for k in set(cl) | set(cr):
        nl, nr = cl.get(k, 1), cr.get(k, 1)
        if nl * nr > pair_budget:
            keys.append(k)
            ks.append(int(min(salt_max, max(2, -(-(nl * nr) // pair_budget)))))
            splits.append(0 if nl >= nr else 1)
    order = np.argsort(np.asarray(keys, dtype=np.int64)) if keys else []
    return {
        "keys": np.asarray(keys, dtype=np.int64)[order] if keys else np.empty(0, np.int64),
        "k": np.asarray(ks, dtype=np.int64)[order] if keys else np.empty(0, np.int64),
        "split": np.asarray(splits, dtype=np.int64)[order] if keys else np.empty(0, np.int64),
    }


def _jk(keys: np.ndarray, salt: np.ndarray) -> np.ndarray:
    return splitmix64(splitmix64(keys.astype(np.uint64)) ^ salt.astype(np.uint64)).astype(
        np.int64
    )


def _tag(ds, key: str, cols: list[str], side: int, num_buckets: int, plan_ref):
    """Project + tag one side with ``__side``, ``__jk`` and
    ``__bucket``; hot keys salt-split or replicate per the plan."""

    def fn(batch: pa.Table) -> pa.Table:
        batch, k = _clean_keys(batch, key, cols)
        salt = np.zeros(len(k), dtype=np.int64)
        if plan_ref is not None:
            plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
            hk = plan["keys"]
            if len(hk):
                pos = np.clip(np.searchsorted(hk, k), 0, len(hk) - 1)
                is_hot = hk[pos] == k
                if is_hot.any():
                    kk = np.ones(len(k), dtype=np.int64)
                    kk[is_hot] = plan["k"][pos[is_hot]]
                    split_here = is_hot & (plan["split"][pos] == side)
                    # split side: PER-KEY round-robin shard within the
                    # block (a combined counter would let interleaved
                    # hot keys collapse onto one shard each)
                    idx_split = np.flatnonzero(split_here)
                    if len(idx_split):
                        from changesetmd_ray.text.hashing import segment_starts

                        ks_sub = k[idx_split]
                        o = np.argsort(ks_sub, kind="stable")
                        ss = segment_starts(ks_sub[o])
                        within = np.arange(len(o), dtype=np.int64) - np.repeat(
                            ss[:-1], np.diff(ss)
                        )
                        cum = np.empty(len(o), dtype=np.int64)
                        cum[o] = within
                        salt[idx_split] = cum % kk[idx_split]
                    # replicate side of hot keys: k copies, salts 0..k-1
                    rep = np.ones(len(k), dtype=np.int64)
                    rep_mask = is_hot & ~split_here
                    rep[rep_mask] = kk[rep_mask]
                    if (rep > 1).any():
                        idx = np.repeat(np.arange(len(k)), rep)
                        starts = np.concatenate([[0], np.cumsum(rep)[:-1]])
                        local = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, rep)
                        new_salt = salt[idx]
                        from_rep = np.repeat(rep > 1, rep)
                        new_salt[from_rep] = local[from_rep]
                        batch = batch.take(pa.array(idx))
                        k, salt = k[idx], new_salt
        jk = _jk(k, salt)
        b = (jk.view(np.uint64) & np.uint64(num_buckets - 1)).astype(np.int64)
        return (
            batch.append_column("__jk", pa.array(jk))
            .append_column("__bucket", pa.array(b))
            .append_column("__side", pa.array(np.full(len(batch), side, dtype=np.int8)))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_join(left, right, *, left_on: str, right_on: str,
                   left_cols: list[str], right_cols: list[str]):
    """Inner equi-join with the RIGHT side broadcast: the right table
    is collected once, key-sorted once, ``ray.put`` once, and every
    left block probes it with ``searchsorted`` + range expansion —
    map-only, NO shuffle (the T3 broadcast pattern, same as
    ``joins/pip.py``). Exact integer keys, so no hash and no collision
    recheck. Caller guarantees the right side fits a broadcast; use
    :func:`hash_join` (optionally with ``broadcast_max_rows``) when it
    may not."""
    rt = pa.concat_tables(
        ray.get(right.select_columns(right_cols).to_arrow_refs())
    ).combine_chunks()
    rt = rt.filter(pc.is_valid(rt[right_on]))  # null keys never match
    rk = rt[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rk, kind="stable")
    ref = ray.put((rk[order], rt.take(pa.array(order))))
    out_cols = [*left_cols, *right_cols]

    def probe(batch: pa.Table) -> pa.Table:
        batch, lk = _clean_keys(batch, left_on, left_cols)
        rk_s, rtbl = ray.get(ref)  # zero-copy plasma read per task
        lo = np.searchsorted(rk_s, lk, "left")
        hi = np.searchsorted(rk_s, lk, "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {c: pa.nulls(0, (batch.schema.field(c).type if c in left_cols
                                 else rtbl.schema.field(c).type)) for c in out_cols}
            )
        li = np.repeat(np.arange(len(lk)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        ri = np.repeat(lo, counts) + within
        out_l = batch.take(pa.array(li))
        out_r = rtbl.take(pa.array(ri))
        cols = {c: out_l[c] for c in left_cols}
        cols.update({c: out_r[c] for c in right_cols})
        return pa.table(cols)

    return left.map_batches(probe, batch_format="pyarrow")


def hash_join(
    left,
    right,
    *,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 128,
    pair_budget: int | None = None,
    salt_max: int = 64,
    hot_track: int = 64,
    broadcast_max_rows: int | None = None,
    hot_exact: bool = False,
):
    """Inner equi-join of two Datasets on integer keys → Dataset with
    ``left_cols + right_cols`` (caller avoids name collisions; the join
    keys may appear in either list). Both sides shuffle once, co-
    partitioned by key hash; no side is broadcast or materialized.
    ``pair_budget`` enables hot-key salting (see module docstring) —
    note the pre-pass executes both inputs' lineage once before the
    join re-executes it, the right trade when inputs are reads (a
    column-pruned extra scan) but worth a ``materialize()`` upstream
    when the inputs are expensive computed pipelines.

    ``hot_exact=True`` swaps the lossy per-block heavy-hitter sampler
    for exact global counts (one keys-only packed all-to-all per side
    + a distributed count join; only budget violators reach the
    driver) — pay it when the key distribution may hide hot keys
    spread ≤ once per block, the one regime the sampler misses.

    ``broadcast_max_rows`` enables the Spark-style adaptive plan: when
    the right side counts at or below it, the join runs map-only via
    :func:`broadcast_join` (no all-to-all at all — at small scale the
    sort shuffle's fixed cost dominates; at 100 TB the count exceeds
    the limit and the shuffle plan engages). The count is one
    ``right.count()`` — metadata-cheap when the right side is a read,
    a lineage execution otherwise, same caveat as ``pair_budget``."""
    check_pow2(num_buckets)
    if left_on not in left_cols:
        left_cols = [left_on, *left_cols]
    if right_on not in right_cols:
        right_cols = [right_on, *right_cols]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"column name collision across sides: {sorted(overlap)}")

    if broadcast_max_rows is not None and right.count() <= broadcast_max_rows:
        return broadcast_join(
            left, right, left_on=left_on, right_on=right_on,
            left_cols=left_cols, right_cols=right_cols,
        )

    plan_ref = None
    if pair_budget is not None:
        if hot_exact:
            # exact global counts (one keys-only packed all-to-all per
            # side): catches spread-thin hot keys the sampler's
            # per-block ≥2 cut misses — see _exact_hot_counts
            cl, cr = _exact_hot_counts(left, right, left_on, right_on,
                                       pair_budget)
        else:
            cl = _hot_key_counts(left, left_on, hot_track)
            cr = _hot_key_counts(right, right_on, hot_track)
        plan = _salt_plan(cl, cr, pair_budget, salt_max)
        plan_ref = ray.put(plan)

    # union of differently-shaped sides: pad each side with the other's
    # columns as nulls so the schemas line up
    def pad(batch: pa.Table, other_cols: list[str], other_types: dict) -> pa.Table:
        for c in other_cols:
            batch = batch.append_column(c, pa.nulls(len(batch), other_types[c]))
        return batch

    l_types = {f: left.schema().base_schema.field(f).type for f in left_cols}
    r_types = {f: right.schema().base_schema.field(f).type for f in right_cols}
    order = [*left_cols, *right_cols, "__jk", "__bucket", "__side"]
    pack_cols = ["__jk", *left_cols, *right_cols]

    def pack_bucketed(batch: pa.Table) -> pa.Table:
        """Rows → one LIST-PACKED row per bucket present in the block
        (stages/exchange.py): the all-to-all moves ≤ blocks ×
        num_buckets packed rows instead of every raw row;
        ``join_bucket`` flattens them back. Byte volume unchanged."""
        return pack_by_bucket(
            batch, "__bucket", pack_cols, scalar_cols=("__side",),
            types={"__jk": pa.int64(), **l_types, **r_types},
        )

    lt = _tag(left, left_on, left_cols, 0, num_buckets, plan_ref).map_batches(
        lambda b: pack_bucketed(pad(b, right_cols, r_types).select(order)),
        batch_format="pyarrow",
    )
    rt = _tag(right, right_on, right_cols, 1, num_buckets, plan_ref).map_batches(
        lambda b: pack_bucketed(pad(b, left_cols, l_types).select(order)),
        batch_format="pyarrow",
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        l_packed = group.filter(pa.array(lmask))
        r_packed = group.filter(pa.array(~lmask))
        empty = pa.table(
            {c: pa.nulls(0, (l_types | r_types)[c]) for c in [*left_cols, *right_cols]}
        )
        if len(l_packed) == 0 or len(r_packed) == 0:
            return empty
        # unpack each side's own columns (the other side's lists are
        # null per packed row and never read)
        l_tbl = pa.table({c: flat(l_packed, c) for c in ["__jk", *left_cols]})
        r_tbl = pa.table({c: flat(r_packed, c) for c in ["__jk", *right_cols]})
        lk = l_tbl["__jk"].to_numpy(zero_copy_only=False)
        rk = r_tbl["__jk"].to_numpy(zero_copy_only=False)
        order_r = np.argsort(rk, kind="stable")
        rk_s = rk[order_r]
        lo = np.searchsorted(rk_s, lk, "left")
        hi = np.searchsorted(rk_s, lk, "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        li = np.repeat(np.arange(len(lk)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        ri = order_r[np.repeat(lo, counts) + within]
        out_l = l_tbl.select(left_cols).take(pa.array(li))
        out_r = r_tbl.select(right_cols).take(pa.array(ri))
        # exact-key recheck: a 64-bit __jk collision (or two hot shards
        # colliding) could pair different raw keys — drop such pairs
        keq = (
            out_l[left_on].to_numpy(zero_copy_only=False)
            == out_r[right_on].to_numpy(zero_copy_only=False)
        )
        if not keq.all():
            m = pa.array(keq)
            out_l, out_r = out_l.filter(m), out_r.filter(m)
        cols = {c: out_l[c] for c in left_cols}
        cols.update({c: out_r[c] for c in right_cols})
        return pa.table(cols)

    return lt.union(rt).groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
