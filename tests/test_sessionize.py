"""Sessionization vs the DuckDB lag/window formulation, including the
null-timestamp corner the fixtures don't exercise."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from changesetmd_ray.stages.sessionize import sessionize

_SQL = """
with e as (
  select user_id, event_id, ts,
    case when lag(ts) over w is null
         or ts - lag(ts) over w > interval 30 minute then 1 else 0 end as new_s
  from events
  window w as (partition by user_id order by ts, event_id)
), s as (
  select user_id, ts,
    sum(new_s) over (partition by user_id order by ts, event_id
                     rows unbounded preceding) as session_n
  from e
)
select user_id, cast(session_n as bigint) as session_n,
       count(*) as n_events, min(ts) as session_start, max(ts) as session_end
from s group by user_id, session_n
order by user_id, session_n
"""


def _compare(tbl: pa.Table):
    got = (
        sessionize(ray.data.from_arrow(tbl).repartition(4), num_buckets=8)
        .to_pandas()
        .sort_values(["user_id", "session_n"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", tbl)
    exp = con.execute(_SQL).df().reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["user_id", "session_n", "n_events"]:
        assert got[c].astype("int64").tolist() == exp[c].astype("int64").tolist(), c
    for c in ["session_start", "session_end"]:
        g = pd.to_datetime(got[c]).tolist()
        x = pd.to_datetime(exp[c]).tolist()
        assert all((pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(g, x)), c


def test_sessionize_matches_sql_window(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    uid = rng.integers(0, 40, n)
    base = np.datetime64("2022-06-01T00:00:00", "us")
    ts = base + rng.integers(0, 86_400_000_000 * 3, n).astype("timedelta64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid.astype(np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    _compare(tbl)


def test_sessionize_null_user_ids_match_sql(ray_session):
    """Null user_ids form ONE partition (SQL PARTITION BY null
    grouping) and come back as null, not as an undefined NaN cast."""
    base = np.datetime64("2022-06-01T00:00:00", "us")
    rows = [
        (1, 1, base),
        (1, 2, base + np.timedelta64(5, "m")),
        (None, 3, base),
        (None, 4, base + np.timedelta64(10, "m")),   # joins event 3's session
        (None, 5, base + np.timedelta64(120, "m")),  # gap -> session 2
        (2, 6, base),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    got = (
        sessionize(ray.data.from_arrow(tbl).repartition(2), num_buckets=8)
        .to_pandas()
        .sort_values(["user_id", "session_n"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", tbl)
    exp = con.execute(_SQL).df().reset_index(drop=True)
    assert len(got) == len(exp) == 4
    g = list(zip(got["user_id"].astype("Int64"), got["session_n"], got["n_events"]))
    x = list(zip(exp["user_id"].astype("Int64"), exp["session_n"].astype("int64"),
                 exp["n_events"].astype("int64")))
    assert sorted(g, key=str) == sorted(x, key=str)


def test_sessionize_null_timestamps_match_sql(ray_session):
    """Nulls: after-valid continues the session, after-null starts one,
    all-null sessions emit null start/end — exactly DuckDB's window
    semantics with NULLS LAST."""
    base = np.datetime64("2022-06-01T00:00:00", "us")
    rows = [
        # user 1: valid, +5m, null (joins), null (own session), null (own)
        (1, 1, base),
        (1, 2, base + np.timedelta64(5, "m")),
        (1, 3, None),
        (1, 4, None),
        (1, 5, None),
        # user 2: only nulls
        (2, 6, None),
        (2, 7, None),
        # user 3: valid, gap > 30m -> new session, then null
        (3, 8, base),
        (3, 9, base + np.timedelta64(45, "m")),
        (3, 10, None),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [None if r[2] is None else r[2] for r in rows], pa.timestamp("us")
            ),
        }
    )
    _compare(tbl)
