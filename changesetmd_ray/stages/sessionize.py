"""Gap-based sessionization — the classic log/training-data windowed
operator (sessions = runs of a user's events where consecutive gaps stay
within a threshold). North_rule addition: the reference has no windowed
operator (its closest concept is the changeset created_at/closed_at
lifetime, reference ``changesetmd.py:239-254``); the SQL analogue is the
lag/cumulative-sum window formulation the oracle uses.

Distributed shape: ONE bucketed groupby by user hash; inside a bucket
every user's segment is pure vectorized arithmetic (sort, diff, cumsum,
reduceat) — no SQL window engine, no per-row Python.

Null-timestamp parity with the ANSI-SQL lag/window formulation
(DuckDB oracle, NULLS LAST):

- null timestamps sort last within the user,
- a null after a valid event CONTINUES the session (the SQL interval
  comparison against a NULL lag/ts is NULL → not a new session),
- a null after a null STARTS a session (``lag(ts) is null``),
- per-session min/max skip nulls (an all-null session emits null
  start/end).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import check_pow2, hash_bucket, segment_starts

_I64MAX = np.iinfo(np.int64).max
_I64MIN = np.iinfo(np.int64).min


def sessionize(
    ds,
    *,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    num_buckets: int = 64,
):
    """→ Dataset ``(user_id, session_n, n_events, session_start,
    session_end)``; sessions ordered/numbered per user by (ts, id),
    split where the gap between consecutive valid timestamps exceeds
    ``gap_us`` microseconds."""
    check_pow2(num_buckets)

    def _uid_with_sentinel(col: pa.ChunkedArray) -> np.ndarray:
        """int64 user ids with nulls mapped to the _I64MIN sentinel —
        one group, like SQL's PARTITION BY null grouping. fill_null
        BEFORE to_numpy: a nullable int column otherwise round-trips
        through float64 and corrupts ids ≥ 2^53. (A real user_id equal
        to INT64_MIN would merge with the null group — accepted.)"""
        import pyarrow.compute as pc

        valid = ~np.asarray(pc.is_null(col).combine_chunks())
        u = col.combine_chunks().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        return np.where(valid, u, _I64MIN)

    def tag(batch: pa.Table) -> pa.Table:
        u = _uid_with_sentinel(batch[user_col])
        return batch.append_column("__b", pa.array(hash_bucket(u, num_buckets)))

    def sessions(group: pa.Table) -> pa.Table:
        uid = _uid_with_sentinel(group[user_col])
        eid = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_arr = group[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        nat = np.isnat(ts_arr)
        t_i = ts_arr.astype(np.int64)
        sort_key = np.where(nat, _I64MAX, t_i)  # NULLS LAST
        order = np.lexsort((eid, sort_key, uid))
        u_s, t_s, nat_s = uid[order], t_i[order], nat[order]
        starts = segment_starts(u_s)
        new = np.ones(len(u_s), dtype=np.int64)
        if len(u_s) > 1:
            prev_nat, cur_nat = nat_s[:-1], nat_s[1:]
            both_valid = ~prev_nat & ~cur_nat
            gap_big = np.zeros(len(u_s) - 1, dtype=bool)
            gap_big[both_valid] = (t_s[1:][both_valid] - t_s[:-1][both_valid]) > gap_us
            same_user = u_s[1:] == u_s[:-1]
            # new iff: user change, prev row's ts is null (SQL lag NULL),
            # or a real gap between two valid timestamps
            new[1:] = (~same_user | prev_nat | gap_big).astype(np.int64)
        sess = np.cumsum(new)
        # renumber within user: subtract the user's first session - 1
        sess = sess - np.repeat(sess[starts[:-1]], np.diff(starts)) + 1
        # per (user, session) aggregation via the combined sorted key
        key_change = np.ones(len(u_s), dtype=bool)
        key_change[1:] = (u_s[1:] != u_s[:-1]) | (sess[1:] != sess[:-1])
        ks = np.flatnonzero(key_change)
        # min/max over VALID timestamps only (SQL aggregates skip nulls)
        lo = np.minimum.reduceat(np.where(nat_s, _I64MAX, t_s), ks)
        hi = np.maximum.reduceat(np.where(nat_s, _I64MIN, t_s), ks)
        ke = np.append(ks[1:], len(u_s))
        start_dt = np.where(lo == _I64MAX, np.int64(_I64MIN), lo).astype("datetime64[us]")
        end_dt = np.where(hi == _I64MIN, np.int64(_I64MIN), hi).astype("datetime64[us]")
        # _I64MIN is numpy's NaT sentinel → arrow null, the SQL min/max
        # of an all-null session
        out_uid = u_s[ks]
        return pa.table(
            {
                "user_id": pa.array(out_uid, pa.int64(),
                                    mask=out_uid == _I64MIN),
                "session_n": pa.array(sess[ks]),
                "n_events": pa.array(ke - ks),
                "session_start": pa.array(start_dt, pa.timestamp("us"), from_pandas=True),
                "session_end": pa.array(end_dt, pa.timestamp("us"), from_pandas=True),
            }
        )

    from changesetmd_ray.stages.exchange import flat, pack_by_bucket

    def pack(batch: pa.Table) -> pa.Table:
        # list-packed exchange (stages/exchange.py): the raw event rows
        # are this stage's dominant data movement at scale
        return pack_by_bucket(batch, "__b", [user_col, id_col, ts_col])

    def sessions_packed(packed: pa.Table) -> pa.Table:
        return sessions(
            pa.table({c: flat(packed, c) for c in (user_col, id_col, ts_col)})
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .map_batches(pack, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sessions_packed, batch_format="pyarrow")
    )
