"""As-of join vs DuckDB's lateral formulation, including null
timestamps, equal-timestamp ties, and keys with no match."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from changesetmd_ray.joins.asof import asof_join

_SQL = """
select l.lid, l.k,
  (select r.v from r
    where r.k = l.k and r.ts <= l.ts
    order by r.ts desc, r.v desc limit 1) as v
from l order by l.lid
"""


def _compare(left_tbl, right_tbl):
    got = (
        asof_join(
            ray.data.from_arrow(left_tbl).repartition(3),
            ray.data.from_arrow(right_tbl).repartition(3),
            left_key="k", right_key="k", left_ts="ts", right_ts="ts",
            left_cols=["lid", "k"], right_val="v", num_buckets=8,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left_tbl)
    con.register("r", right_tbl)
    exp = con.execute(_SQL).df().reset_index(drop=True)
    assert got["lid"].tolist() == exp["lid"].tolist()
    gv, xv = got["v"].tolist(), exp["v"].tolist()
    assert all(
        (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(gv, xv)
    ), (gv, xv)


def _ts(vals):
    base = np.datetime64("2023-01-01", "us")
    return pa.array(
        [None if v is None else base + np.timedelta64(v, "s") for v in vals],
        pa.timestamp("us"),
    )


def test_asof_random_matches_sql(ray_session):
    rng = np.random.default_rng(4)
    nl, nr = 400, 300
    left = pa.table({"lid": pa.array(np.arange(nl, dtype=np.int64)),
                     "k": pa.array(rng.integers(0, 20, nl).astype(np.int64)),
                     "ts": _ts(rng.integers(0, 1000, nl).tolist())})
    right = pa.table({"k": pa.array(rng.integers(0, 25, nr).astype(np.int64)),
                      "ts": _ts(rng.integers(0, 1000, nr).tolist()),
                      "v": pa.array(rng.integers(0, 10_000, nr).astype(np.int64))})
    _compare(left, right)


def test_asof_edges(ray_session):
    """Equal-ts tie (max v wins), exact-equal ts match (inclusive),
    null left ts (no match), null right ts (never matches), key with no
    right rows."""
    left = pa.table({"lid": pa.array([1, 2, 3, 4, 5], pa.int64()),
                     "k": pa.array([10, 10, 10, 11, 12], pa.int64()),
                     "ts": _ts([100, 50, None, 100, 100])})
    right = pa.table({"k": pa.array([10, 10, 10, 10, 11], pa.int64()),
                      "ts": _ts([100, 100, 40, None, None]),
                      "v": pa.array([7, 9, 3, 999, 888], pa.int64())})
    _compare(left, right)


def test_asof_null_keys_and_null_values(ray_session):
    """SQL parity: null KEYS never match (null-key left rows pass
    through with null value, null-key right rows are dropped), and a
    null right_val LOSES an equal-ts tie to a non-null value."""
    left = pa.table({"lid": pa.array([1, 2, 3], pa.int64()),
                     "k": pa.array([None, 0, 10], pa.int64()),
                     "ts": _ts([100, 100, 100])})
    right = pa.table({"k": pa.array([None, 0, 10, 10], pa.int64()),
                      "ts": _ts([50, 60, 100, 100]),
                      "v": pa.array([111, 222, None, 5], pa.int64())})
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_key="k", right_key="k", left_ts="ts", right_ts="ts",
            left_cols=["lid"], right_val="v", num_buckets=8,
        ).take_all()
    }
    assert got == {1: None, 2: 222, 3: 5}
