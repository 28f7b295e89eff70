"""Query registry: every implemented operator from SURVEY.md §2 as a
(Ray pipeline, ANSI-SQL oracle) pair over the driver testdata tables
(``TESTDATA.md``: region nation customer supplier part orders lineitem
events documents embeddings).

Geo parity trick: the testdata has no native coordinates, so geo queries
derive lon/lat/bboxes **deterministically from integer key columns**
with pure integer arithmetic + one float division — numpy and DuckDB
produce bit-identical doubles, so join/tile outputs match exactly. The
SQL fragments below mirror the numpy expressions operation-for-operation.

Float-aggregate parity: lossy ops (ROUND) are applied per-row on
identical doubles; aggregates sum grid-aligned values whose float error
(≤1e-7) is far below the grid (0.01), so a final ROUND recovers the
exact decimal on both sides regardless of summation order. Averages are
avoided (sum+count returned instead). Outputs prefer integer columns
(ids, ranks, counts) — floats only where exact (stored values or
per-row derived doubles).

Ray implementations use the engine's own operators (pip_join, bbox_join,
knn_join, tile ops, exact_dedup, quality_features, ann_cosine_topk…) —
the oracle never executes any Ray-side code path.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from changesetmd_ray.geo.envelope import EARTH_RADIUS_M, bbox_area_sq_m
from changesetmd_ray.joins.bbox import bbox_join
from changesetmd_ray.joins.knn import knn_join
from changesetmd_ray.joins.pip import pip_join
from changesetmd_ray.joins.tiles import raster_vector_join, tile_counts
from changesetmd_ray.geo.grid import unpack_cell
from changesetmd_ray.text.analysis import Fingerprint, LangId, TokenCount, quality_features
from changesetmd_ray.text.ann import ann_cosine_topk, ann_lsh_topk
from changesetmd_ray.stages.reduce import tree_combine
from changesetmd_ray.text.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    simhash_candidates,
)

# ------------------------------------------------------------------ io


def _read(sf_dir: str, table: str, columns: list[str] | None = None,
          blocks: int | None = None):
    """Column-pruned read. ``blocks`` forces a block count for
    compute-heavy downstream stages: the small test files arrive as ONE
    block (far under target_max_block_size), which would serialize any
    expensive map into a single task — at 100 TB the file count provides
    the parallelism and ``blocks`` is unnecessary."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    if blocks is not None:
        # split the READ itself (no shuffle): row-group-level read tasks
        return ray.data.read_parquet(path, columns=columns, override_num_blocks=blocks)
    return ray.data.read_parquet(path, columns=columns)


def _read_small(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _shuffle_blocks(sf_dir: str, table: str, *, rows_per_block: int = 65_536,
                    max_blocks: int | None = None) -> int:
    """Size-proportional block-count hint for reads that feed a SHUFFLE
    through a trivial (projection-grade) map: Ray auto-splits any read
    into ~2×cores blocks, and sort/groupby overhead scales with input
    block count — measured 5-7× on the radius-kNN join at sf0.1 (64
    auto blocks ≈ 4.9 s vs size-derived 2 blocks ≈ 0.65 s, identical
    output). Tracks the table's actual row count so larger inputs keep
    their parallelism; the cap defaults to 2× the cluster's cores (the
    value is passed as ``override_num_blocks``, so a fixed cap would
    serialize reads on bigger machines). Do NOT use for reads whose
    pre-shuffle map is compute-heavy (PIP probing, pair kernels) —
    those want the default split."""
    if max_blocks is None:
        try:
            max_blocks = max(64, 2 * int(ray.cluster_resources().get("CPU", 32)))
        except Exception:
            max_blocks = 64
    meta = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata
    return max(1, min(-(-meta.num_rows // rows_per_block), max_blocks))


# ------------------------------------------- derived geometry (parity)
# numpy and SQL MUST stay operation-for-operation identical; see module
# docstring. All key columns are int64.

def _pt_sql(tbl: str, key: str) -> str:
    return (
        f"(select {key}, (({key}*7919)%360000)/1000.0 - 180.0 as lon, "
        f"(({key}*104729)%170000)/1000.0 - 85.0 as lat from {tbl})"
    )


def _add_point_cols(batch: pa.Table, key: str) -> pa.Table:
    k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
    lon = ((k * 7919) % 360000) / 1000.0 - 180.0
    lat = ((k * 104729) % 170000) / 1000.0 - 85.0
    return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))


_BOX_PARAMS = {
    # key: (lon_mod, lat_mod, w_base, w_mod, h_base, h_mod)  [milli-degrees]
    "orders": (350000, 160000, 100, 40, 100, 30),
    "part": (350000, 160000, 500, 50, 500, 35),
    "supplier": (300000, 150000, 10000, 7, 8000, 5),
}
_BOX_STEP = {"orders": 100, "part": 100, "supplier": 3000}


def _box_sql(tbl: str, key: str) -> str:
    lon_mod, lat_mod, w_base, w_mod, h_base, h_mod = _BOX_PARAMS[tbl]
    step = _BOX_STEP[tbl]
    return (
        f"(select {key}, "
        f"(({key}*7919)%{lon_mod})/1000.0 - {lon_mod//2000}.0 as min_lon, "
        f"(({key}*104729)%{lat_mod})/1000.0 - {lat_mod//2000}.0 as min_lat, "
        f"(({key}*7919)%{lon_mod})/1000.0 - {lon_mod//2000}.0 + ({w_base} + ({key}%{w_mod})*{step})/1000.0 as max_lon, "
        f"(({key}*104729)%{lat_mod})/1000.0 - {lat_mod//2000}.0 + ({h_base} + ({key}%{h_mod})*{step})/1000.0 as max_lat "
        f"from {tbl})"
    )


def _box_arrays(k: np.ndarray, tbl: str):
    lon_mod, lat_mod, w_base, w_mod, h_base, h_mod = _BOX_PARAMS[tbl]
    step = _BOX_STEP[tbl]
    k = k.astype(np.int64)
    min_lon = ((k * 7919) % lon_mod) / 1000.0 - (lon_mod // 2000)
    min_lat = ((k * 104729) % lat_mod) / 1000.0 - (lat_mod // 2000)
    max_lon = min_lon + (w_base + (k % w_mod) * step) / 1000.0
    max_lat = min_lat + (h_base + (k % h_mod) * step) / 1000.0
    return min_lon, min_lat, max_lon, max_lat


def _add_box_cols(batch: pa.Table, key: str, tbl: str) -> pa.Table:
    k = batch[key].to_numpy(zero_copy_only=False)
    lo_x, lo_y, hi_x, hi_y = _box_arrays(k, tbl)
    return (
        batch.append_column("min_lon", pa.array(lo_x))
        .append_column("min_lat", pa.array(lo_y))
        .append_column("max_lon", pa.array(hi_x))
        .append_column("max_lat", pa.array(hi_y))
    )


def _events_points(sf_dir: str, blocks: int | None = None):
    return _read(sf_dir, "events", ["event_id"], blocks=blocks).map_batches(
        lambda b: _add_point_cols(b, "event_id"), batch_format="pyarrow"
    )


def _supplier_rect_table(sf_dir: str) -> pa.Table:
    sup = _read_small(sf_dir, "supplier", ["s_suppkey"])
    k = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    lo_x, lo_y, hi_x, hi_y = _box_arrays(k, "supplier")
    return pa.table(
        {
            "s_suppkey": pa.array(k.astype(np.int64)),
            "min_lon": pa.array(lo_x),
            "min_lat": pa.array(lo_y),
            "max_lon": pa.array(hi_x),
            "max_lat": pa.array(hi_y),
        }
    )


def _rects_as_polygons(rects: pa.Table, id_col: str) -> pa.Table:
    """Rectangles → the PIP polygon fixture schema (counter-clockwise
    rings) so the pip_join path runs its real ring machinery.
    Vectorized build (no per-row Python loop) — safe to reuse on a
    LARGE polygon side, not just the broadcast-small fixture."""
    n = len(rects)
    lo_x = rects["min_lon"].to_numpy(zero_copy_only=False)
    hi_x = rects["max_lon"].to_numpy(zero_copy_only=False)
    lo_y = rects["min_lat"].to_numpy(zero_copy_only=False)
    hi_y = rects["max_lat"].to_numpy(zero_copy_only=False)
    # CCW ring: (lo,lo) (hi,lo) (hi,hi) (lo,hi), 4 points per rect
    lon = np.column_stack([lo_x, hi_x, hi_x, lo_x]).reshape(-1)
    lat = np.column_stack([lo_y, lo_y, hi_y, hi_y]).reshape(-1)
    pts = pa.StructArray.from_arrays(
        [pa.array(lon, pa.float64()), pa.array(lat, pa.float64())],
        names=["lon", "lat"],
    )
    ring = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 4 * n + 4, 4, dtype=np.int32)[: n + 1]), pts
    )
    return pa.table(
        {
            "poly_id": rects[id_col].cast(pa.int64()),
            "kind": pa.array(["ring"] * n, pa.string()),
            "ring": ring,
            "lat_threshold": pa.nulls(n),
        }
    )


_HAVERSINE_SQL = (
    "2*{R}*asin(least(sqrt("
    "pow(sin((radians({lat2})-radians({lat1}))/2),2) + "
    "cos(radians({lat1}))*cos(radians({lat2}))*"
    "pow(sin((radians({lon2})-radians({lon1}))/2),2)),1.0))"
)

# ----------------------------------------------------------- relational


def q_tpch_q1(sf_dir: str):
    """TPC-H Q1 shape (A4 grouped aggregation with per-batch partial
    combine): per (returnflag, linestatus) sums + count. All inputs sit
    on exact 0.01 grids, so sums run in integer cents (order-independent,
    bit-exact vs any SQL engine); the final /100.0 divides identical
    integers into identical doubles on both sides."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        blocks=_shuffle_blocks(sf_dir, "lineitem"),
    )
    cutoff = np.datetime64("1998-09-02T00:00:00", "us")

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff, pa.timestamp("us")))
        t = batch.filter(keep)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        d100 = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        g = (
            t.select(["l_returnflag", "l_linestatus"])
            .append_column("qty", pa.array(qty))
            .append_column("cents", pa.array(cents))
            .append_column("disc4", pa.array(cents * (100 - d100)))
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("cents", "sum"), ("disc4", "sum"), ("qty", "count")])
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_sum", "sum"), ("cents_sum", "sum"),
             ("disc4_sum", "sum"), ("qty_count", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty_sum", "cents_sum",
             "disc4_sum", "qty_count"]
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["qty_sum"],
                "sum_base_price": pc.divide(
                    pc.cast(batch["cents_sum"], pa.float64()), 100.0
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(batch["disc4_sum"], pa.float64()), 10000.0
                ),
                "count_order": batch["qty_count"],
            }
        )

    return tree_combine(partials, combine).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


_SQL_TPCH_Q1 = """
select l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as bigint)) as bigint) as sum_qty,
       cast(sum(cast(round(l_extendedprice*100) as bigint)) as bigint) / 100.0
           as sum_base_price,
       cast(sum(cast(round(l_extendedprice*100) as bigint)
           * (100 - cast(round(l_discount*100) as bigint))) as bigint) / 10000.0
           as sum_disc_price,
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""


def q_filter_project(sf_dir: str):
    """M1/M4: vectorized filter + projection with column pruning at the
    read (only 3 columns leave storage)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    return ds.filter(expr="l_quantity >= 45")


_SQL_FILTER_PROJECT = (
    "select l_orderkey, l_partkey, l_quantity from lineitem where l_quantity >= 45"
)


def q_topk_orders(sf_dir: str):
    """O2 top-k: explicit sort (range-partition shuffle) + limit."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


_SQL_TOPK_ORDERS = (
    "select o_orderkey, o_totalprice from orders "
    "order by o_totalprice desc, o_orderkey asc limit 10"
)


def q_orders_per_segment(sf_dir: str):
    """J1 parent↔child via broadcast: the small customer table ships
    once via ray.put; orders stream and aggregate per segment."""
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    segs = np.asarray(cust["c_mktsegment"].to_pylist(), dtype=object)
    order_k = np.argsort(keys)
    lookup_ref = ray.put((keys[order_k], segs[order_k]))

    class AttachSegment:
        def __init__(self):
            self.keys, self.segs = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(self.keys, ck), 0, max(len(self.keys) - 1, 0))
            # inner-join parity: drop orders whose custkey has no
            # customer row instead of attaching a neighbor's segment
            hit = (len(self.keys) > 0) & (self.keys[pos] == ck) if len(self.keys) else np.zeros(len(ck), bool)
            # null prices are excluded like SQL sum/count (a NaN would
            # otherwise rint-cast to INT64_MIN garbage)
            valid = ~np.asarray(pc.is_null(batch["o_totalprice"]).combine_chunks())
            hit &= valid
            seg = self.segs[pos[hit]]
            # integer cents: the sum is order-independent, so the tree
            # combine is bit-exact vs the oracle's round(sum(...), 2)
            # (prices sit on the 0.01 grid; see q_tpch_q1)
            price = batch["o_totalprice"].to_numpy(zero_copy_only=False)[hit]
            cents = np.rint(price * 100.0).astype(np.int64)
            t = pa.table({"c_mktsegment": pa.array(list(seg), pa.string()),
                          "cents": pa.array(cents)})
            return t.group_by("c_mktsegment").aggregate([("cents", "sum"), ("cents", "count")])

    partials = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"],
        blocks=_shuffle_blocks(sf_dir, "orders"),
    ).map_batches(lambda b: AttachSegment()(b), batch_format="pyarrow")

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_mktsegment").aggregate(
            [("cents_sum", "sum"), ("cents_count", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "cents_sum", "cents_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                # exact cents / 100.0 = the double nearest the decimal
                # total — identical to the oracle's round(sum(...), 2)
                "sum_price": pc.divide(pc.cast(batch["cents_sum"], pa.float64()), 100.0),
                "n_orders": batch["cents_count"],
            }
        )

    return tree_combine(partials, combine).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


_SQL_ORDERS_PER_SEGMENT = """
select c_mktsegment,
       round(sum(round(o_totalprice, 2)), 2) as sum_price,
       count(*) as n_orders
from orders join customer on o_custkey = c_custkey
group by c_mktsegment
"""


def q_customers_semi_anti(sf_dir: str):
    """J6 semi- AND anti-join in one battery slot (round-5
    consolidation). ``side='semi'``: distinct customer keys having an
    open ('O') order — a per-batch distinct + one small groupby (no
    raw-row shuffle). ``side='anti'``: customers with no 'F' order,
    through the size-gated membership join (joins/broadcast.py): the
    filtered key set broadcasts while its map-side-distinct size is
    below the limit, and falls back to the bucketed shuffle anti-join
    above it — the driver collect can never grow unbounded (round-3
    verdict #4)."""
    from changesetmd_ray.joins.broadcast import anti_join

    o_orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).filter(
        expr="o_orderstatus == 'O'"
    )

    def distinct_batch(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"c_custkey": pa.array(u, pa.int64())})

    def one(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    semi = (
        o_orders.map_batches(distinct_batch, batch_format="pyarrow")
        .groupby("c_custkey")
        .map_groups(one, batch_format="pyarrow")
    )

    f_orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).filter(
        expr="o_orderstatus == 'F'"
    )
    anti = anti_join(
        _read(sf_dir, "customer", ["c_custkey"]), f_orders,
        big_on="c_custkey", small_on="o_custkey",
    )

    def tag(side: str):
        return lambda b: b.append_column("side", pa.array([side] * len(b), pa.string()))

    return semi.map_batches(tag("semi"), batch_format="pyarrow").union(
        anti.map_batches(tag("anti"), batch_format="pyarrow")
    )


_SQL_SEMI_ANTI = """
select distinct o_custkey as c_custkey, 'semi' as side
from orders where o_orderstatus = 'O'
union all
select c_custkey, 'anti' as side from customer where not exists
  (select 1 from orders where o_custkey = c_custkey and o_orderstatus = 'F')
"""


def q_latest_event_per_user(sf_dir: str):
    """A5/S8 keep-latest dedup (the reference's last-writer-wins upsert,
    changesetmd.py:164-182): per-batch partial keep-latest, then a small
    per-user final merge."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"],
               blocks=_shuffle_blocks(sf_dir, "events"))

    def _ts_key(col: pa.ChunkedArray) -> np.ndarray:
        # NaT's int64 sentinel INT64_MIN negates to itself, so a null
        # timestamp would WIN under -ts; map it to a losing sentinel
        # (the oracle's NULLS LAST under ts desc)
        ts_arr = col.to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return np.where(np.isnat(ts_arr), np.iinfo(np.int64).max, -ts_arr.astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, _ts_key(batch["ts"]), uid))
        u = uid[order]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        sel = order[first]
        return pa.table(
            {"user_id": pa.array(uid[sel]), "event_id": pa.array(eid[sel]),
             "ts": batch["ts"].take(pa.array(sel))}
        )

    def final(group: pa.Table) -> pa.Table:
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        i = int(np.lexsort((-eid, _ts_key(group["ts"])))[0])
        return pa.table(
            {
                "user_id": group["user_id"].slice(i, 1),
                "event_id": group["event_id"].slice(i, 1),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").map_groups(
        final, batch_format="pyarrow"
    )


_SQL_LATEST_EVENT = """
select user_id, event_id from (
  select user_id, event_id,
         row_number() over (partition by user_id order by ts desc, event_id desc) rn
  from events) where rn = 1
"""


def q_events_by_type(sf_dir: str):
    """A1/A4 count per predicate group with partial combine, PLUS the
    A3 watermark (per-type max timestamp) in the same tree — one
    battery slot covers the grouped count and the max aggregate
    (round-5 consolidation; the per-partition-partial → combine shape
    is exactly what the flagship manifest records)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("event_type").aggregate(
            [("event_type", "count"), ("ts", "max")]
        )
        return g.rename_columns(["event_type", "n", "max_ts"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("event_type").aggregate(
            [("n", "sum"), ("max_ts", "max")]
        )
        return g.rename_columns(["event_type", "n", "max_ts"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch["event_type"],
             "n": batch["n"],
             "max_ts": batch["max_ts"]}
        )

    return tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"), combine
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


_SQL_EVENTS_BY_TYPE = (
    "select event_type, count(*) as n, max(ts) as max_ts "
    "from events group by event_type"
)


def q_events_sampling(sf_dir: str):
    """O3 sampling, both modes in one battery slot (round-5
    consolidation). ``mode='systematic'``: deterministic
    multiplicative-hash sample (~5%) — reproducible across
    engines/runs, unlike random_sample. ``mode='stratified'``:
    per-stratum deterministic rates (keep ALL rare purchases, thin the
    noise classes), the class-balancing step of a training-data
    pipeline (stages/sample.py). Exact integer arithmetic both sides
    (Knuth multiplicative hash mod 2^32)."""
    from changesetmd_ray.stages.sample import stratified_sample, systematic_sample

    sys_ds = systematic_sample(
        _read(sf_dir, "events", ["event_id"]), key_col="event_id", rate=0.05
    )
    strat = stratified_sample(
        _read(sf_dir, "events", ["event_id", "event_type"]),
        key_col="event_id", group_col="event_type",
        rates={"purchase": 1.0, "click": 0.1, "view": 0.02}, default_rate=0.05,
    ).select_columns(["event_id", "event_type"])

    def tag_sys(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {"mode": pa.array(["systematic"] * n, pa.string()),
             "event_id": batch["event_id"],
             "event_type": pa.nulls(n, pa.string())}
        )

    def tag_strat(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {"mode": pa.array(["stratified"] * n, pa.string()),
             "event_id": batch["event_id"],
             "event_type": batch["event_type"]}
        )

    return sys_ds.map_batches(tag_sys, batch_format="pyarrow").union(
        strat.map_batches(tag_strat, batch_format="pyarrow")
    )


_SQL_EVENTS_SAMPLING = """
select 'systematic' as mode, event_id, cast(null as varchar) as event_type
from events
where (cast(event_id as hugeint) * 2654435761) % 4294967296 < 214748364
union all
select 'stratified' as mode, event_id, event_type from events
where (cast(event_id as hugeint) * 2654435761) % 4294967296 <
  case event_type
    when 'purchase' then 4294967296
    when 'click' then 429496729
    when 'view' then 85899345
    else 214748364 end
"""
# hugeint: bigint would overflow above event_id ~3.4e9, while the numpy
# side wraps mod 2^64 — and (x mod 2^64) mod 2^32 == x mod 2^32, so the
# hugeint form matches the uint64 wrap exactly at any scale factor.
# Thresholds are int(rate * 2^32) with Python truncation — the literals
# must match that truncation exactly (0.05 → 214748364).


def q_events_sessions(sf_dir: str):
    """Gap-based sessionization (the classic log/training-data windowed
    operator) — see :func:`changesetmd_ray.stages.sessionize.sessionize`
    for the distributed shape and null-timestamp oracle parity."""
    from changesetmd_ray.stages.sessionize import sessionize

    return sessionize(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        user_col="user_id", id_col="event_id", ts_col="ts",
        gap_us=30 * 60 * 1_000_000,
    )


_SQL_EVENTS_SESSIONS = """
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
"""


def q_top_orders_per_cust(sf_dir: str):
    """Per-key top-k (top-3 orders by value per customer, ties → lowest
    order key): bucketed by customer hash, ranked with one vectorized
    lexsort + segment arithmetic per bucket — the grouped form of O2.
    Rank-only output (the float price stays internal, ulp-robust)."""
    from changesetmd_ray.text.hashing import hash_bucket, segment_starts

    NB = 64
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def tag(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column("__b", pa.array(hash_bucket(c, NB)))

    def topk(group: pa.Table) -> pa.Table:
        cust = group["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        okey = group["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = group["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -price, cust))
        c_s = cust[order]
        starts = segment_starts(c_s)
        rank = (
            np.arange(len(c_s), dtype=np.int64)
            - np.repeat(starts[:-1], np.diff(starts)) + 1
        )
        keep = rank <= 3
        return pa.table(
            {
                "o_custkey": pa.array(c_s[keep]),
                "o_orderkey": pa.array(okey[order[keep]]),
                "rank": pa.array(rank[keep]),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__b").map_groups(
        topk, batch_format="pyarrow"
    )


_SQL_TOP_ORDERS_PER_CUST = """
select o_custkey, o_orderkey, rank from (
  select o_custkey, o_orderkey,
    row_number() over (partition by o_custkey
                       order by o_totalprice desc, o_orderkey asc) as rank
  from orders) where rank <= 3
"""


_QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_order_price_quantiles(sf_dir: str):
    """Exact distributed quantiles of order value WITHOUT a global sort
    (stages/stats.py::exact_quantiles: histogram refinement, three
    streaming passes, shuffled volume ≈ num_bins ints per block).
    Values are selected, never averaged — bit-exact vs percentile_disc."""
    from changesetmd_ray.stages.stats import exact_quantiles

    return exact_quantiles(
        _read(sf_dir, "orders", ["o_totalprice"]), col="o_totalprice", qs=_QUANTILE_QS
    )


_SQL_ORDER_PRICE_QUANTILES = f"""
with agg as (
  select quantile_disc(o_totalprice, {_QUANTILE_QS}) as v from orders
)
select unnest({_QUANTILE_QS}) as q, unnest(v) as value from agg
"""


def q_orders_asof_events(sf_dir: str):
    """As-of join (joins/asof.py): for every order of a customer who is
    also an events user, the customer's most recent event at or before
    the order date (null when none) — one bucketed shuffle, vectorized
    merge inside the bucket. Ties at equal timestamps: max event_id
    (the SQL ORDER BY ts DESC, event_id DESC LIMIT 1 rule)."""
    from changesetmd_ray.joins.asof import asof_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def low_cust(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["o_custkey"], 150))

    return asof_join(
        orders.map_batches(low_cust, batch_format="pyarrow"),
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        left_key="o_custkey", right_key="user_id",
        left_ts="o_orderdate", right_ts="ts",
        left_cols=["o_orderkey", "o_custkey"],
        right_val="event_id",
    )


_SQL_ORDERS_ASOF_EVENTS = """
select o.o_orderkey, o.o_custkey,
  (select e.event_id from events e
    where e.user_id = o.o_custkey and e.ts <= o.o_orderdate
    order by e.ts desc, e.event_id desc limit 1) as event_id
from orders o where o.o_custkey < 150
"""


def q_events_distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct-user count WITH its exactness audit: the
    mergeable sketch (stages/stats.py::hll_distinct, 2^p-byte registers
    merged by element-wise max) runs alongside the exact distributed
    distinct (::exact_distinct_count, list-packed bucket shuffle), and
    the sketch estimate must land within 5σ of its published standard
    error (1.04/√2^p) of the exact answer. Output = the exact count +
    the audit verdict, so the driver's value-hash check covers the
    sketch: a broken estimator flips ``hll_ok`` and fails the oracle."""
    from changesetmd_ray.stages.stats import exact_distinct_count, hll_distinct

    ds = _read(sf_dir, "events", ["user_id"])
    p = 12
    est = int(hll_distinct(ds, col="user_id", p=p)["n_distinct_est"][0].as_py())
    exact = exact_distinct_count(_read(sf_dir, "events", ["user_id"]), col="user_id")
    bound = 5.0 * 1.04 / math.sqrt(1 << p)
    ok = exact > 0 and abs(est - exact) / exact <= bound
    return pa.table(
        {"n_users": pa.array([exact], pa.int64()), "hll_ok": pa.array([ok], pa.bool_())}
    )


_SQL_DISTINCT_USERS_HLL = """
select count(distinct user_id) as n_users, true as hll_ok from events
"""


def q_union_dedup(sf_dir: str):
    """O4 idempotency: union the events table with itself, exact-dedup by
    event_id (keep first), count per type — re-applying a partition twice
    yields the original counts (reference README.md:101-104)."""
    a = _read(sf_dir, "events", ["event_id", "event_type"])
    b = _read(sf_dir, "events", ["event_id", "event_type"])
    deduped = exact_dedup(
        a.union(b), key_col="event_id", id_col="event_id",
        unique_ids=False,  # the doubled input repeats every id by design
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("event_type").aggregate([("event_type", "count")])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("event_type").aggregate([("event_type_count", "sum")])
        return g.rename_columns(["event_type", "event_type_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch["event_type"], "n": batch["event_type_count"]}
        )

    return tree_combine(
        deduped.map_batches(partial, batch_format="pyarrow"), combine
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


# dedup of the doubled input = the original per-type counts
_SQL_UNION_DEDUP = (
    "select event_type, count(*) as n from events group by event_type"
)


def q_promo_parts_by_brand(sf_dir: str):
    """M8 string predicate (the reference's tags->created_by LIKE
    'JOSM%' shape, README.md:226-228) + grouped count."""
    ds = _read(sf_dir, "part", ["p_brand", "p_type"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.starts_with(batch["p_type"], "PROMO")
        return batch.filter(keep).group_by("p_brand").aggregate([("p_brand", "count")])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("p_brand").aggregate([("p_brand_count", "sum")])
        return g.rename_columns(["p_brand", "p_brand_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"p_brand": batch["p_brand"], "n": batch["p_brand_count"]})

    return tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"), combine
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


_SQL_PROMO_PARTS = (
    "select p_brand, count(*) as n from part where p_type like 'PROMO%' group by p_brand"
)


def q_nations_per_region(sf_dir: str):
    """J2-shaped broadcast lookup join on tiny dimension tables."""
    region = _read_small(sf_dir, "region")
    rk = region["r_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rn = np.asarray(region["r_name"].to_pylist(), dtype=object)
    order = np.argsort(rk)
    ref = ray.put((rk[order], rn[order]))

    class Attach:
        def __init__(self):
            self.rk, self.rn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(self.rk, k), 0, max(len(self.rk) - 1, 0))
            hit = (len(self.rk) > 0) & (self.rk[pos] == k) if len(self.rk) else np.zeros(len(k), bool)
            t = pa.table({"r_name": pa.array(list(self.rn[pos[hit]]), pa.string())})
            return t.group_by("r_name").aggregate([("r_name", "count")])

    partials = _read(sf_dir, "nation", ["n_regionkey"]).map_batches(
        lambda b: Attach()(b), batch_format="pyarrow"
    )

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("r_name").aggregate([("r_name_count", "sum")])
        return g.rename_columns(["r_name", "r_name_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"r_name": batch["r_name"], "n_nations": batch["r_name_count"]})

    return tree_combine(partials, combine).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


_SQL_NATIONS_PER_REGION = """
select r_name, count(*) as n_nations
from nation join region on n_regionkey = r_regionkey
group by r_name
"""


def q_priority_revenue(sf_dir: str):
    """J1 parent↔child equi-join (joins/equi.py): lineitem ⋈ orders on
    the order key through the ADAPTIVE plan — broadcast probe while the
    pruned orders side fits (bench scale), shuffle hash join above the
    row limit (100 TB) — then revenue per order priority in exact
    integer 1e-4-dollar units (same parity rule as tpch_q1)."""
    from changesetmd_ray.joins.equi import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"], blocks=16)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"], blocks=8)
    joined = hash_join(
        li, orders,
        left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderkey", "o_orderpriority"],
        # adaptive plan: orders (2 pruned cols) broadcasts below 4 M
        # rows — at bench scale the sort shuffle's fixed cost dominated
        # (2.3 s vs 0.4 s); at 100 TB the count exceeds the limit and
        # the shuffle path engages
        broadcast_max_rows=4_000_000,
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        d100 = np.rint(batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return (
            batch.select(["o_orderpriority"])
            .append_column("rev4", pa.array(cents * (100 - d100)))
            .group_by("o_orderpriority")
            .aggregate([("rev4", "sum"), ("rev4", "count")])
        )

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_orderpriority").aggregate(
            [("rev4_sum", "sum"), ("rev4_count", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "rev4_sum", "rev4_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "revenue": pc.divide(pc.cast(batch["rev4_sum"], pa.float64()), 10000.0),
                "n_items": batch["rev4_count"],
            }
        )

    # fanin=1: the broadcast-joined partials keep the read's 16 blocks
    # (≤ 5 priority rows each) — one repartition barrier suffices
    return tree_combine(
        joined.map_batches(partial, batch_format="pyarrow"), combine, fanin=1
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


_SQL_PRIORITY_REVENUE = """
select o_orderpriority,
       sum(cast(round(l_extendedprice*100) as bigint)
           * (100 - cast(round(l_discount*100) as bigint))) / 10000.0 as revenue,
       count(*) as n_items
from lineitem join orders on l_orderkey = o_orderkey
group by o_orderpriority
"""


# ------------------------------------------------------------------ geo


def q_geo_pip(sf_dir: str):
    """J2 point-in-polygon: events-derived points probed against the
    broadcast supplier rectangles through the real STRtree + ray-casting
    path. Closed-box semantics == SQL BETWEEN (ST_Intersects parity)."""
    rects = _supplier_rect_table(sf_dir)
    polys = _rects_as_polygons(rects, "s_suppkey")
    # larger rows_per_block than the shuffle queries: the probe map is
    # compute-bearing (STRtree + ray casting), so keep some parallelism
    pairs = pip_join(
        _events_points(sf_dir, blocks=_shuffle_blocks(sf_dir, "events", rows_per_block=16_384)),
        polys, id_col="event_id",
    )
    return pairs.map_batches(
        lambda b: b.rename_columns(["event_id", "s_suppkey"]), batch_format="pyarrow"
    )


_SQL_GEO_PIP = f"""
with p as {_pt_sql('events', 'event_id')}, r as {_box_sql('supplier', 's_suppkey')}
select p.event_id, r.s_suppkey
from p, r
where p.lon between r.min_lon and r.max_lon
  and p.lat between r.min_lat and r.max_lat
"""


def q_geo_bbox_join(sf_dir: str):
    """J3 bbox∩bbox with cell partitioning + skew salting + shuffle-free
    reference-point dedup, PLUS the documented ST_CoveredBy geofilter
    shape (reference README.md:230-234, order boxes covered by supplier
    rectangles) in the same battery slot (round-5 consolidation);
    ``rel`` tags the predicate, ``right_key`` is p_partkey /
    s_suppkey respectively."""

    def orders_boxes():
        return _read(
            sf_dir, "orders", ["o_orderkey"], blocks=_shuffle_blocks(sf_dir, "orders")
        ).map_batches(lambda b: _add_box_cols(b, "o_orderkey", "orders"),
                      batch_format="pyarrow")

    parts = _read(
        sf_dir, "part", ["p_partkey"], blocks=_shuffle_blocks(sf_dir, "part")
    ).map_batches(lambda b: _add_box_cols(b, "p_partkey", "part"), batch_format="pyarrow")
    inter = bbox_join(orders_boxes(), parts, zoom=6,
                      left_id="o_orderkey", right_id="p_partkey")
    rects = ray.data.from_arrow(_supplier_rect_table(sf_dir))
    cov = bbox_join(
        orders_boxes(), rects, zoom=5, predicate="coveredby",
        left_id="o_orderkey", right_id="s_suppkey",
    )

    def tag(rel: str, right: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"rel": pa.array([rel] * len(batch), pa.string()),
                 "o_orderkey": batch["o_orderkey"],
                 "right_key": batch[right]}
            )
        return fn

    return inter.map_batches(tag("intersects", "p_partkey"),
                             batch_format="pyarrow").union(
        cov.map_batches(tag("coveredby", "s_suppkey"), batch_format="pyarrow")
    )


_SQL_GEO_BBOX_JOIN = f"""
with o as {_box_sql('orders', 'o_orderkey')}, p as {_box_sql('part', 'p_partkey')},
     r as {_box_sql('supplier', 's_suppkey')}
select 'intersects' as rel, o.o_orderkey, p.p_partkey as right_key
from o, p
where o.min_lon <= p.max_lon and p.min_lon <= o.max_lon
  and o.min_lat <= p.max_lat and p.min_lat <= o.max_lat
union all
select 'coveredby' as rel, o.o_orderkey, r.s_suppkey as right_key
from o, r
where o.min_lon >= r.min_lon and o.max_lon <= r.max_lon
  and o.min_lat >= r.min_lat and o.max_lat <= r.max_lat
"""


def q_geo_knn(sf_dir: str):
    """J4 exact haversine kNN — BOTH join shapes in one battery slot
    (round-5 consolidation). ``mode='knn'``: supplier rect centers as
    broadcast probes, events points as streaming corpus.
    ``mode='radius'``: the scale path — cell-partitioned radius kNN
    with BOTH sides as Datasets (no broadcast): each customer-derived
    probe gets its ≤3 nearest event points within 200 km (data margin
    to the radius boundary ≥ 22 m at sf0.01 — far beyond float error).
    Rank-only output (float distances stay internal — ulp-robust);
    ``probe_id`` is s_suppkey / c_custkey respectively."""
    from changesetmd_ray.joins.knn import knn_radius_join

    rects = _supplier_rect_table(sf_dir)
    k = rects["s_suppkey"].to_numpy(zero_copy_only=False)
    # probe = rect min corner (already a derived exact double)
    probes = pa.table(
        {"id": pa.array(k.astype(np.int64)), "lon": rects["min_lon"], "lat": rects["min_lat"]}
    )
    corpus = _events_points(
        sf_dir, blocks=_shuffle_blocks(sf_dir, "events", rows_per_block=16_384)
    )
    knn = knn_join(corpus, probes, 3, corpus_id="event_id")

    cust_probes = _read(
        sf_dir, "customer", ["c_custkey"], blocks=_shuffle_blocks(sf_dir, "customer")
    ).map_batches(lambda b: _add_point_cols(b, "c_custkey"), batch_format="pyarrow")
    rad = knn_radius_join(
        _events_points(sf_dir, blocks=_shuffle_blocks(sf_dir, "events")),
        cust_probes, 3, 200_000.0, zoom=6,
        corpus_id="event_id", probe_id="c_custkey",
    )

    def tag(mode: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"mode": pa.array([mode] * len(batch), pa.string()),
                 "probe_id": batch["probe_id"],
                 "event_id": batch["neighbor_id"],
                 "rank": batch["rank"]}
            )
        return fn

    return knn.map_batches(tag("knn"), batch_format="pyarrow").union(
        rad.map_batches(tag("radius"), batch_format="pyarrow")
    )


_SQL_GEO_KNN = f"""
with p as {_pt_sql('events', 'event_id')}, r as {_box_sql('supplier', 's_suppkey')},
     c as {_pt_sql('customer', 'c_custkey')}
select 'knn' as mode, s_suppkey as probe_id, event_id, rank from (
  select r.s_suppkey, p.event_id,
         row_number() over (partition by r.s_suppkey order by
           {_HAVERSINE_SQL.format(R=EARTH_RADIUS_M, lat1='r.min_lat', lon1='r.min_lon', lat2='p.lat', lon2='p.lon')}
           asc, p.event_id asc) as rank
  from r, p) where rank <= 3
union all
select 'radius' as mode, c_custkey as probe_id, event_id, rank from (
  select c.c_custkey, p.event_id,
         row_number() over (partition by c.c_custkey order by
           {_HAVERSINE_SQL.format(R=EARTH_RADIUS_M, lat1='c.lat', lon1='c.lon', lat2='p.lat', lon2='p.lon')}
           asc, p.event_id asc) as rank
  from c, p
  where {_HAVERSINE_SQL.format(R=EARTH_RADIUS_M, lat1='c.lat', lon1='c.lon', lat2='p.lat', lon2='p.lon')} <= 200000.0
) where rank <= 3
"""


def q_geo_tile_counts(sf_dir: str):
    """J5/A4 raster tiles: per-tile point counts at zoom 6 (partial
    combine before the shuffle), sorted output (O2)."""
    tc = tile_counts(_events_points(sf_dir, blocks=_shuffle_blocks(sf_dir, "events")), 6)

    def unpack(batch: pa.Table) -> pa.Table:
        _, ix, iy = unpack_cell(batch["tile_key"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table(
            {"tile_x": pa.array(ix), "tile_y": pa.array(iy), "n_points": batch["n_points"]}
        )

    return tc.map_batches(unpack, batch_format="pyarrow")


_SQL_GEO_TILE_COUNTS = f"""
with p as {_pt_sql('events', 'event_id')},
t as (select
  cast(greatest(least(floor((lon + 180.0)/360.0*64), 63), 0) as bigint) as tile_x,
  cast(greatest(least(floor((1.0 - ln(tan(radians(greatest(least(lat, 85.05112877980659), -85.05112877980659)))
        + 1.0/cos(radians(greatest(least(lat, 85.05112877980659), -85.05112877980659))))/pi())/2.0*64), 63), 0) as bigint) as tile_y
from p)
select tile_x, tile_y, count(*) as n_points from t group by tile_x, tile_y
"""


def q_geo_zonal_stats(sf_dir: str):
    """Zonal statistics (J2 + A4 composition): per supplier region,
    the number of event points inside — pip_join then a combiner-first
    count per polygon."""
    rects = _supplier_rect_table(sf_dir)
    polys = _rects_as_polygons(rects, "s_suppkey")
    pairs = pip_join(
        _events_points(sf_dir, blocks=_shuffle_blocks(sf_dir, "events", rows_per_block=16_384)),
        polys, id_col="event_id",
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("poly_id").aggregate([("poly_id", "count")])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by("poly_id").aggregate([("poly_id_count", "sum")])
        return g.rename_columns(["poly_id", "poly_id_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"s_suppkey": batch["poly_id"], "n_events": batch["poly_id_count"]}
        )

    # the polygon side is broadcast-small by design (pip_join ships it
    # via ray.put), so the combined domain is bounded — tree, not sort
    return tree_combine(
        pairs.map_batches(partial, batch_format="pyarrow"), combine
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


_SQL_GEO_ZONAL_STATS = f"""
with p as {_pt_sql('events', 'event_id')}, r as {_box_sql('supplier', 's_suppkey')}
select r.s_suppkey, count(*) as n_events
from p, r
where p.lon between r.min_lon and r.max_lon
  and p.lat between r.min_lat and r.max_lat
group by r.s_suppkey
"""


def q_geo_area_filter(sf_dir: str):
    """M7 area filter (the documented "drop continent-sized bboxes"
    query, reference README.md:184-186): order boxes above 1e11 m²
    equal-area."""
    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda b: _add_box_cols(b, "o_orderkey", "orders"), batch_format="pyarrow"
    )

    def big(batch: pa.Table) -> pa.Table:
        area = bbox_area_sq_m(
            batch["min_lon"].to_numpy(zero_copy_only=False),
            batch["min_lat"].to_numpy(zero_copy_only=False),
            batch["max_lon"].to_numpy(zero_copy_only=False),
            batch["max_lat"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"o_orderkey": batch["o_orderkey"].filter(pa.array(area > 1.0e11))})

    return ds.map_batches(big, batch_format="pyarrow")


_SQL_GEO_AREA_FILTER = f"""
with o as {_box_sql('orders', 'o_orderkey')}
select o_orderkey from o
where pow({EARTH_RADIUS_M}, 2) * abs(radians(max_lon - min_lon))
      * abs(sin(radians(max_lat)) - sin(radians(min_lat))) > 1.0e11
"""


def q_geo_raster_lookup(sf_dir: str):
    """J5 raster↔vector: events points pick up the per-tile supplier
    density raster (broadcast side built from the supplier rect min
    corners) at zoom 5; missing tiles → 0."""
    rects = _supplier_rect_table(sf_dir)
    from changesetmd_ray.geo.grid import pack_tile, tile_xyz

    sx, sy = tile_xyz(
        rects["min_lon"].to_numpy(zero_copy_only=False),
        rects["min_lat"].to_numpy(zero_copy_only=False),
        5,
    )
    keys = pack_tile(5, sx, sy).astype(np.int64)
    u, n = np.unique(keys, return_counts=True)
    raster = pa.table({"tile_key": pa.array(u), "sup_n": pa.array(n.astype(np.int64))})
    joined = raster_vector_join(
        _events_points(sf_dir, blocks=_shuffle_blocks(sf_dir, "events")),
        raster, 5, value_cols=("sup_n",),
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "tile_x": batch["tile_x"],
                "tile_y": batch["tile_y"],
                "sup_n": pc.fill_null(batch["sup_n"], 0),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


_MERC_Y_SQL = (
    "cast(greatest(least(floor((1.0 - ln(tan(radians(greatest(least({lat}, 85.05112877980659), -85.05112877980659)))"
    " + 1.0/cos(radians(greatest(least({lat}, 85.05112877980659), -85.05112877980659))))/pi())/2.0*{n}), {nm1}), 0) as bigint)"
)

_SQL_GEO_RASTER_LOOKUP = f"""
with p as {_pt_sql('events', 'event_id')}, r as {_box_sql('supplier', 's_suppkey')},
pt as (select event_id,
  cast(greatest(least(floor((lon + 180.0)/360.0*32), 31), 0) as bigint) as tile_x,
  {_MERC_Y_SQL.format(lat='lat', n=32, nm1=31)} as tile_y from p),
rt as (select
  cast(greatest(least(floor((min_lon + 180.0)/360.0*32), 31), 0) as bigint) as tile_x,
  {_MERC_Y_SQL.format(lat='min_lat', n=32, nm1=31)} as tile_y, count(*) as sup_n
  from r group by 1, 2)
select pt.event_id, pt.tile_x, pt.tile_y, coalesce(rt.sup_n, 0) as sup_n
from pt left join rt on pt.tile_x = rt.tile_x and pt.tile_y = rt.tile_y
"""


def q_geo_cell_encode(sf_dir: str):
    """T2 cell encoders (own S2 + hex implementations). SQL-oracled
    bit-exactly: the encoders' float constants are inlined into the SQL
    via repr and the S2 Hilbert rounds unrolled with the lookup table as
    a list literal (:mod:`changesetmd_ray.oracle_cells_sql`)."""
    from changesetmd_ray.stages.encode import CellEncoder

    pts = _events_points(sf_dir).map_batches(
        lambda b: b.append_column("min_lon", b["lon"])
        .append_column("min_lat", b["lat"])
        .append_column("max_lon", b["lon"])
        .append_column("max_lat", b["lat"]),
        batch_format="pyarrow",
    )
    enc = pts.map_batches(
        lambda b: CellEncoder(s2_level=12, hex_res=8, grid_zoom=7)(b),
        batch_format="pyarrow",
    )
    return enc.select_columns(["event_id", "s2_cell", "hex_cell", "grid_cell"])


def _sql_geo_cell_encode() -> str:
    from changesetmd_ray.oracle_cells_sql import cells_select

    inner = cells_select(
        _pt_sql("events", "event_id"),
        ["event_id"],
        s2_level=12,
        hex_res=8,
        grid_zoom=7,
    )
    return f"select event_id, s2_cell, hex_cell, grid_cell from {inner} t"


# ------------------------------------------------------- text/training


def q_docs_exact_dedup(sf_dir: str):
    """Exact dedup keep-first over documents (distributed hash-group)."""
    out = exact_dedup(
        _read(sf_dir, "documents", ["doc_id", "text"],
              blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=1024)),
        key_col="text", id_col="doc_id",
    )
    return out.select_columns(["doc_id"])


_SQL_DOCS_EXACT_DEDUP = "select min(doc_id) as doc_id from documents group by text"


def q_docs_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified at ≥ 0.6 —
    SQL-ORACLED: with ``carry_text`` the kept pairs are exactly the
    pairs whose word-3-shingle Jaccard ≥ 0.6, which DuckDB reproduces
    over shingle strings (hash-set vs string-set Jaccard coincide
    absent 64-bit collisions). Candidate recall is the one LSH degree
    of freedom: at (n_perm=128, n_bands=32, r=4) a pair at the
    corpus's lowest above-threshold similarity (J ≈ 0.87, measured —
    the fixture plants near-dups ≥ 0.87 and background ≤ 0.15, a wide
    margin around 0.6) collides in no band with probability
    (1−0.87⁴)³² ≈ 1.5e-12, and the hashing is deterministic — verified
    pair-exact vs the oracle at sf0.001/0.01/0.1."""
    pairs = minhash_lsh_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"],
              blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640)),
        threshold=0.6, carry_text=True, n_bands=32,
    )
    return pairs.select_columns(["id_a", "id_b"])


_SQL_DOCS_MINHASH = """
with tk as (
  select doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') as tk from documents
), s as (
  select doc_id, list_distinct(
    case when len(tk) >= 3
      then list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      else [array_to_string(tk, ' ')] end) as sh
  from tk where len(tk) > 0
), e as (
  select doc_id, unnest(sh) as g from s
), n as (
  select doc_id, len(sh) as n from s
), inter as (
  select a.doc_id as id_a, b.doc_id as id_b, count(*) as c
  from e a join e b on a.g = b.g and a.doc_id < b.doc_id
  group by 1, 2
)
select id_a, id_b from inter
join n na on na.doc_id = id_a
join n nb on nb.doc_id = id_b
where c * 1.0 / (na.n + nb.n - c) >= 0.6
"""


def q_docs_simhash(sf_dir: str):
    """SimHash near-dup pairs at Hamming ≤ 3 — SQL-ORACLED exactly,
    no recall caveat: pigeonhole banding (4 bands of 16 bits for t=3)
    GUARANTEES every pair at Hamming ≤ 3 shares a band, so the output
    is precisely the Hamming-≤-3 pair set over the fingerprints; with
    the md5 token hash the fingerprints themselves reproduce in pure
    SQL (64 bit-majority sums over md5-hi-64 token hashes, DuckDB
    ``bit_count(xor(...))`` for the Hamming check). The crc32+splitmix
    default hash stays the throughput configuration."""
    from changesetmd_ray.text.hashing import md5_token_hashes

    return simhash_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"],
              blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640)),
        max_hamming=3, token_hasher=md5_token_hashes,
    )


def _sql_docs_simhash(max_hamming: int = 3) -> str:
    """Unrolled SQL reproduction of the md5-token-hash SimHash64:
    per-(doc, token) counts → 64 signed bit-majority sums (bit set iff
    strictly more weighted ones than zeros) → ubigint fingerprint →
    pair join on ``bit_count(xor) <= t`` (same tie rule ``score > 0``
    and empty-doc fingerprint 0 as :func:`simhash64`)."""
    bit_terms = ", ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then c else -c end) as s{b}"
        for b in range(64)
    )
    fp_expr = " + ".join(
        f"(case when s{b} > 0 then {1 << b}::ubigint else 0::ubigint end)"
        for b in range(64)
    )
    return f"""
with tk as (
  select doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) as t
  from documents
), h as (
  select doc_id, ('0x' || substr(md5(t), 1, 16))::ubigint as h, count(*) as c
  from tk group by 1, 2
), bits as (
  select doc_id, {bit_terms} from h group by doc_id
), fp0 as (
  select doc_id, {fp_expr} as fp from bits
), fp as (
  select d.doc_id, coalesce(f.fp, 0::ubigint) as fp
  from documents d left join fp0 f using (doc_id)
)
select a.doc_id as id_a, b.doc_id as id_b,
       cast(bit_count(xor(a.fp, b.fp)) as bigint) as hamming
from fp a join fp b on a.doc_id < b.doc_id
where bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


def q_docs_text_analysis(sf_dir: str):
    """The full per-document text-analysis surface in ONE fused pass
    (battery-slot consolidation, round 5): quality features, heuristic
    language-ID, BPE-ish token count and the winnowing fingerprint all
    append to the same streamed batch — one pruned read, zero
    shuffles, every column exactly SQL-oracled (the four per-operator
    oracles of rounds 2-4, joined on doc_id)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640))
    ds = ds.map_batches(quality_features, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: LangId()(b), batch_format="pyarrow")
    ds = ds.map_batches(lambda b: TokenCount()(b), batch_format="pyarrow")
    ds = ds.map_batches(lambda b: Fingerprint(gram_hash="md5")(b),
                        batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "n_chars", "n_tokens_ws", "n_punct", "n_digits",
         "quality_ok", "lang_pred", "n_tokens_bpe", "fingerprint"]
    )


_SQL_DOCS_QUALITY = r"""
select doc_id,
  length(text) as n_chars,
  case when length(trim(text)) = 0 then 0
       else len(regexp_extract_all(trim(text), '\s+')) + 1 end as n_tokens_ws,
  len(regexp_extract_all(text, '[.,;:!?]')) as n_punct,
  len(regexp_extract_all(text, '[0-9]')) as n_digits,
  (length(text) >= 50 and
   (case when length(trim(text)) = 0 then 0
         else len(regexp_extract_all(trim(text), '\s+')) + 1 end) >= 10 and
   cast(len(regexp_extract_all(text, '[.,;:!?]')) as double)
     <= cast(greatest(length(text), 1) as double) * 0.1) as quality_ok
from documents
"""


def _sql_docs_langid() -> str:
    from changesetmd_ray.text.analysis import _LANG_MARKERS

    hits = ",\n    ".join(
        "len(list_filter(tk, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + f"], x))) as h_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    m = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    # first-max-wins tie order = the marker dict's insertion order
    case = "\n       ".join(f"when h_{lg} = {m} then '{lg}'" for lg in langs)
    return f"""
with toks as (
  select doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') as tk from documents
), sc as (
  select doc_id, len(tk) as n,
    {hits}
  from toks
)
select doc_id,
  case when n = 0 then 'und'
       when {m} = 0 then 'und'
       {case}
  end as lang_pred
from sc
"""


_SQL_DOCS_TOKENS = r"""
select doc_id,
  len(regexp_extract_all(text, '''(?:s|d|m|t|ll|ve|re)\b|[^\W\d_]+|\d+|[^\w\s]+')) as n_tokens_bpe
from documents
"""


# Winnowing fingerprint oracle (Schleimer et al. MOSS; whitespace-
# invariant), exact with the md5 gram hash: DuckDB rebuilds every
# position's k-gram via substr+md5, takes the window min per sliding w,
# and xor-folds the distinct mins (bit_xor DISTINCT), value-identical
# to the engine's uint64 arithmetic. The crc32+splitmix gram hash
# stays the operator default (oracled configuration uses md5).
_SQL_DOCS_FINGERPRINT = r"""
with norm as (
  select doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) as s from documents
), gram as (
  select doc_id,
         unnest(range(1, length(s) - 8 + 2)) as pos,
         s, length(s) - 8 + 1 as ng
  from norm where length(s) >= 8
), gh as (
  select doc_id, pos, ng,
         ('0x' || substr(md5(substr(s, cast(pos as int), 8)), 1, 16))::ubigint as h
  from gram
), winmin as (
  select doc_id, pos, ng,
         min(h) over (partition by doc_id order by pos
                      rows between current row and 3 following) as m
  from gh
), mins as (
  select doc_id, m from winmin where ng < 4 or pos <= ng - 4 + 1
), folded as (
  select doc_id, bit_xor(distinct m) as fpu from mins group by doc_id
), short as (
  select doc_id, ('0x' || substr(md5(s), 1, 16))::ubigint as fpu
  from norm where length(s) < 8
), allfp as (
  select * from folded union all select * from short
)
select doc_id,
       cast(cast(fpu as hugeint)
            - case when fpu >= 9223372036854775808::ubigint
                   then 18446744073709551616::hugeint else 0::hugeint end
            as bigint) as fingerprint
from allfp
"""


def _sql_docs_text_analysis() -> str:
    """Composite text-analysis oracle: the four per-operator oracles as
    CTEs joined on doc_id — each remains exact, so the composite is."""
    return f"""
with q as ({_SQL_DOCS_QUALITY}),
     l as ({_sql_docs_langid()}),
     t as ({_SQL_DOCS_TOKENS}),
     f as ({_SQL_DOCS_FINGERPRINT})
select q.doc_id, q.n_chars, q.n_tokens_ws, q.n_punct, q.n_digits,
       q.quality_ok, l.lang_pred, t.n_tokens_bpe, f.fingerprint
from q
join l using (doc_id)
join t using (doc_id)
join f using (doc_id)
"""


def q_ann_cosine(sf_dir: str):
    """Similarity-search top-k, BOTH kernels in one battery slot
    (round-5 consolidation): exact brute-force cosine AND IVF in its
    oracle-checkable configuration (``nprobe=None`` = probe every cell
    → bit-exact vs brute force while still exercising the quantizer
    training, per-cell assignment/rerank and merge; the pruned
    configuration's recall is unit-tested). Rank-only output for ulp
    robustness; ``method`` tags the kernel."""
    from changesetmd_ray.text.ann import ann_ivf_topk

    emb = _read_small(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(pc.less(emb["vec_id"], 8))

    def corpus():
        return _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                     blocks=_shuffle_blocks(sf_dir, "embeddings", rows_per_block=1024))

    def tag(ds, method: str):
        return ds.map_batches(
            lambda b, m=method: b.select(["query_id", "neighbor_id", "rank"])
            .append_column("method", pa.array([m] * len(b), pa.string())),
            batch_format="pyarrow",
        )

    exact = tag(ann_cosine_topk(corpus(), queries, 5), "exact")
    ivf = tag(
        ann_ivf_topk(corpus(), queries, 5, n_clusters=16, nprobe=None),
        "ivf",
    )
    return exact.union(ivf)


_SQL_ANN_COSINE = """
with g as (
  select query_id, neighbor_id, rank from (
    select q.vec_id as query_id, e.vec_id as neighbor_id,
           row_number() over (partition by q.vec_id
             order by list_cosine_similarity(q.embedding, e.embedding) desc, e.vec_id asc) as rank
    from embeddings q, embeddings e where q.vec_id < 8) where rank <= 5
)
select query_id, neighbor_id, rank, 'exact' as method from g
union all
select query_id, neighbor_id, rank, 'ivf' as method from g
"""


# ------------------------------------------------- pages (input_hint)


def pages_from_docs(sf_dir: str, out_dir: str, n_shards: int = 4) -> list[str]:
    """Deterministically derive an ``input_hint``-shaped pages table
    (url, warc_ts, html, text, lang) from the documents table: each
    doc's text is carried into the page body byte-identical, and
    1 + doc_id % 3 geo signals with integer-derived coordinates are
    planted in the head. Idempotent: shard files are only written once."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"part-{s:05d}.parquet") for s in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return paths
    docs = _read_small(sf_dir, "documents", ["doc_id", "text", "lang"])
    ids = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    base = np.datetime64("2021-01-01T00:00:00", "us")

    # fully vectorized synthesis (numpy %-format + Arrow element-wise
    # join): the per-row f-string loop this replaces dominated the
    # first bench call of pages_pipeline/pages_tags at sf0.1
    def _s(a: np.ndarray) -> pa.Array:  # int array → string array
        return pa.array(np.char.mod("%d", a))

    gen = pc.binary_join_element_wise(
        '<meta name="generator" content="gen-', _s(ids % 7), ".", _s(ids % 5), '">', ""
    )
    geo_metas = []
    for jj in range(3):
        k = ids * 31 + jj * 7
        lon = ((k * 7919) % 360000) / 1000.0 - 180.0
        lat = ((k * 104729) % 170000) / 1000.0 - 85.0
        tag = pc.binary_join_element_wise(
            '<meta name="geo.position" content="',
            pa.array(np.char.mod("%.7f", lat)), ";",
            pa.array(np.char.mod("%.7f", lon)), '">', "",
        )
        # doc plants 1 + doc_id % 3 signals: blank out tags past that
        mask = pa.array(jj < 1 + ids % 3)
        geo_metas.append(pc.if_else(mask, tag, pa.scalar("", pa.string())))
    html = pc.binary_join_element_wise(
        "<html><head>", gen, *geo_metas, "</head><body><p>",
        docs["text"].combine_chunks(), "</p></body></html>", "",
    )
    url = pc.binary_join_element_wise("https://docs.example.org/d", _s(ids), "")
    ts = base + ids.astype("timedelta64[s]").astype("timedelta64[us]")
    table = pa.table(
        {
            "url": url,
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": docs["text"],
            "lang": docs["lang"],
        }
    )
    shard_of = ids % n_shards
    for s in range(n_shards):
        if os.path.exists(paths[s]):
            continue
        tmp = paths[s] + ".tmp"
        pq.write_table(table.filter(pa.array(shard_of == s)), tmp)
        os.replace(tmp, paths[s])
    return paths


def q_pages_pipeline(sf_dir: str):
    """The flagship extract+encode chain over input_hint pages (S5 + T2):
    html → points/bbox with byte-identical text passthrough → S2/hex/grid
    cells. Fully SQL-oracled: the planted coords are e3-integer-derived
    (parsed float == (e3)/1000.0 exactly, single rounding on both sides),
    and the cell ids reproduce via :mod:`changesetmd_ray.oracle_cells_sql`
    over the bbox centre."""
    from changesetmd_ray.stages.encode import CellEncoder
    from changesetmd_ray.stages.extract import GeoExtractor

    tag = os.path.basename(os.path.normpath(sf_dir))
    paths = pages_from_docs(sf_dir, f"/tmp/changesetmd_pages_v2_{tag}")
    # pruned read: the query outputs url + derived columns only, so
    # `text`/`lang`/`warc_ts` never leave storage (GeoExtractor's
    # passthrough is presence-optional)
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    ds = ds.map_batches(lambda b: GeoExtractor()(b), batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: CellEncoder(s2_level=12, hex_res=8, grid_zoom=7)(b),
        batch_format="pyarrow",
    )
    return ds.select_columns(
        ["url", "n_points", "min_lon", "min_lat", "max_lon", "max_lat", "s2_cell", "hex_cell"]
    )


def _sql_pages_pipeline() -> str:
    from changesetmd_ray.oracle_cells_sql import cells_select

    # bbox centre source: per-doc min/max over the planted points, with
    # the integer-e3-numerator float derivation (bit-equal to the floats
    # the extractor parses out of the "%.7f" html strings)
    ctr = """(
      with __pts as (
        select doc_id,
          ((((doc_id*31 + j*7) * 7919) % 360000) - 180000)/1000.0 as lon,
          ((((doc_id*31 + j*7) * 104729) % 170000) - 85000)/1000.0 as lat
        from documents, (select unnest([0, 1, 2]) as j) t
        where j <= doc_id % 3
      ), __agg as (
        select doc_id, cast(count(*) as int) as n_points,
          min(lon) as min_lon, min(lat) as min_lat,
          max(lon) as max_lon, max(lat) as max_lat
        from __pts group by doc_id
      )
      select 'https://docs.example.org/d' || doc_id as url, n_points,
        min_lon, min_lat, max_lon, max_lat,
        (min_lon + max_lon)*0.5 as lon, (min_lat + max_lat)*0.5 as lat
      from __agg
    )"""
    inner = cells_select(
        ctr,
        ["url", "n_points", "min_lon", "min_lat", "max_lon", "max_lat"],
        s2_level=12,
        hex_res=8,
    )
    return (
        "select url, n_points, min_lon, min_lat, max_lon, max_lat, "
        f"s2_cell, hex_cell from {inner} t"
    )


def q_pages_points_flatten(sf_dir: str):
    """M3 flatten (the reference's <discussion>/<comment> 1→N child-row
    extraction, changesetmd.py:227-234): pages → GeoExtractor → explode
    the ``points`` list column into child rows (doc_id, point ordinal,
    milli-degree int coords). Coordinates round-trip html text, so the
    output is integer-exact against the SQL derivation."""
    from changesetmd_ray.stages.extract import GeoExtractor

    tag = os.path.basename(os.path.normpath(sf_dir))
    paths = pages_from_docs(sf_dir, f"/tmp/changesetmd_pages_v2_{tag}")
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    ds = ds.map_batches(lambda b: GeoExtractor2Cols()(b), batch_format="pyarrow")

    def flatten(batch: pa.Table) -> pa.Table:
        from changesetmd_ray.pipelines.flagship import explode_list_column

        idx, j, flat = explode_list_column(batch["points"])
        url = batch["url"].to_pylist()
        did = np.array([int(u.rsplit("/d", 1)[1]) for u in url], dtype=np.int64)
        lon = flat.field("lon").to_numpy(zero_copy_only=False)
        lat = flat.field("lat").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(did[idx]),
                "j": pa.array(j),
                "lon_e3": pa.array(np.rint(lon * 1000.0).astype(np.int64)),
                "lat_e3": pa.array(np.rint(lat * 1000.0).astype(np.int64)),
            }
        )

    return ds.map_batches(flatten, batch_format="pyarrow")


class GeoExtractor2Cols:
    """GeoExtractor over a (url, html)-only projection: pads the columns
    the full extractor carries through so the same stage code runs on a
    pruned read."""

    def __init__(self):
        from changesetmd_ray.stages.extract import GeoExtractor

        self.inner = GeoExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        padded = pa.table(
            {
                "url": batch["url"],
                "warc_ts": pa.nulls(n, pa.timestamp("us")),
                "html": batch["html"],
                "text": pa.nulls(n, pa.string()),
                "lang": pa.nulls(n, pa.string()),
            }
        )
        return self.inner(padded).select(["url", "points"])


_SQL_PAGES_POINTS_FLATTEN = """
select doc_id, cast(j as bigint) as j,
       cast(round((((doc_id*31 + j*7) * 7919) % 360000)/1000.0 - 180.0, 3)*1000 as bigint) as lon_e3,
       cast(round((((doc_id*31 + j*7) * 104729) % 170000)/1000.0 - 85.0, 3)*1000 as bigint) as lat_e3
from documents, (select unnest([0, 1, 2]) as j) t
where j <= doc_id % 3
"""


def q_flagship_points_join(sf_dir: str):
    """S7 child-table sink + J1 over the flagship's own artifacts: run
    (or resume) the flagship over input_hint pages — which writes BOTH
    the parent table and the flattened ``points`` child table, the
    reference's two-table layout (changesets + comments,
    changesetmd.py:190-196) — then hash-join the child rows back to
    their parents. Output is integer-exact against the planted-coords
    SQL derivation (same trick as ``pages_points_flatten``)."""
    from changesetmd_ray.joins.equi import hash_join
    from changesetmd_ray.pipelines.flagship import (
        read_output,
        read_points_output,
        run_flagship,
    )

    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    pages = pages_from_docs(sf_dir, f"/tmp/changesetmd_pages_v2_{tag}")
    # unique output dir per invocation: the driver battery must never
    # see a prior (possibly interrupted) run's manifest/partitions —
    # resume-over-existing-state is exercised by tests/test_flagship.py
    out = tempfile.mkdtemp(prefix=f"changesetmd_flagship_{tag}_")
    run_flagship(pages, out, wave_size=4, concurrency=(1, 4))

    def _doc_id(batch: pa.Table) -> np.ndarray:
        urls = batch["url"].to_pylist()
        return np.array([int(u.rsplit("/d", 1)[1]) for u in urls], dtype=np.int64)

    def parent_fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"p_doc_id": pa.array(_doc_id(batch)), "n_points": batch["n_points"]}
        )

    def child_fn(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(_doc_id(batch)),
                "seq": batch["seq"],
                "lon_e3": pa.array(np.rint(lon * 1000.0).astype(np.int64)),
                "lat_e3": pa.array(np.rint(lat * 1000.0).astype(np.int64)),
            }
        )

    parent = read_output(out, columns=["url", "n_points"]).map_batches(
        parent_fn, batch_format="pyarrow"
    )
    child = read_points_output(out, columns=["url", "seq", "lon", "lat"]).map_batches(
        child_fn, batch_format="pyarrow"
    )
    j = hash_join(
        child, parent,
        left_on="doc_id", right_on="p_doc_id",
        left_cols=["doc_id", "seq", "lon_e3", "lat_e3"],
        right_cols=["p_doc_id", "n_points"],
    )
    return j.select_columns(["doc_id", "seq", "lon_e3", "lat_e3", "n_points"])


_SQL_FLAGSHIP_POINTS_JOIN = """
select doc_id, cast(j as bigint) as seq,
       cast(round((((doc_id*31 + j*7) * 7919) % 360000)/1000.0 - 180.0, 3)*1000 as bigint) as lon_e3,
       cast(round((((doc_id*31 + j*7) * 104729) % 170000)/1000.0 - 85.0, 3)*1000 as bigint) as lat_e3,
       cast(1 + doc_id % 3 as int) as n_points
from documents, (select unnest([0, 1, 2]) as j) t
where j <= doc_id % 3
"""


def q_pages_tags(sf_dir: str):
    """M2 tag-map fold + M8 tag predicates (the reference's jsonb tags
    with containment + LIKE, changesetmd.py:223-225, README.md:218-228):
    meta tags fold into a map<string,string> column; filter = map
    contains 'generator' AND its value LIKE 'gen-3%'."""
    from changesetmd_ray.stages.tags import TagExtractor

    tag = os.path.basename(os.path.normpath(sf_dir))
    paths = pages_from_docs(sf_dir, f"/tmp/changesetmd_pages_v2_{tag}")
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    ds = ds.map_batches(TagExtractor(), batch_format="pyarrow")

    def predicate(batch: pa.Table) -> pa.Table:
        gen = pc.map_lookup(batch["tags"], pa.scalar("generator"), "first")
        keep = pc.and_kleene(pc.is_valid(gen), pc.match_like(gen, "gen-3%"))
        keep = pc.fill_null(keep, False)
        t = batch.filter(keep)
        gen_kept = pc.map_lookup(t["tags"], pa.scalar("generator"), "first")
        did = pa.array(
            [int(u.rsplit("/d", 1)[1]) for u in t["url"].to_pylist()], pa.int64()
        )
        return pa.table({"doc_id": did, "generator": gen_kept})

    return ds.map_batches(predicate, batch_format="pyarrow")


_SQL_PAGES_TAGS = """
select doc_id, 'gen-' || cast(doc_id % 7 as varchar) || '.' || cast(doc_id % 5 as varchar) as generator
from documents where doc_id % 7 = 3
"""


def media_from_docs(sf_dir: str, out_dir: str, n_shards: int = 4) -> list[str]:
    """Deterministic media fixture derived from documents, cached to
    parquet shards once (the pages_from_docs pattern). All four media
    codecs are REAL:

    - ``doc_id % 6 == 0`` — solid-color 24-bit BMPs (color/dims
      integer-derived from doc_id, stages/codecs.py);
    - ``doc_id % 6 == 2`` — JPEGs (stages/jpeg.py) of a solid grey
      ``v = 128 + 3·((doc_id % 41) − 20)`` chosen so the quality-90
      luma DC quantizer (3) divides ``8·(v−128)`` and the decode is
      BIT-EXACT — varied dims, 4:4:4/4:2:0 subsampling, restart
      intervals AND (``doc_id % 12 == 8``) full progressive SOF2
      streams cover every decoder path;
    - ``doc_id % 6 == 4`` — PNGs (stages/png.py) or, for
      ``doc_id % 12 == 10``, GIFs (stages/gif.py, real LZW) of a solid
      color; both are lossless so any planted color survives exactly
      and ONE oracle branch covers both formats;
    - ``doc_id % 8 == 1`` — VID1 containers (frame count in the
      header); ``doc_id % 8 == 5`` — REAL minimal ISO BMFF MP4s
      (stages/codecs.py::mp4_encode — same frame-count/fps facts
      carried in a real moov/trak/mdhd/stts box tree, so the frames
      oracle covers both containers with one formula);
    - ``doc_id % 4 == 3`` — 16-bit PCM WAVs (stages/codecs.py) of a
      constant amplitude ``a = ((doc_id·37) % 4001) − 2000`` at
      8 kHz — |a|/32768 divides by a power of two, so the decoded
      mean-|sample| stat is float-exact in SQL.

    The per-row codec encodes are Python-level, so they must run only
    at fixture-build time — queries and bench read the parquet."""
    from changesetmd_ray.stages.codecs import (
        bmp_encode,
        mp4_encode,
        vid1_encode,
        wav_encode,
    )
    from changesetmd_ray.stages.gif import gif_encode
    from changesetmd_ray.stages.jpeg import jpeg_encode
    from changesetmd_ray.stages.png import png_encode

    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"part-{s:05d}.parquet") for s in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return paths
    docs = _read_small(sf_dir, "documents", ["doc_id", "text"])
    did = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = docs["text"].to_pylist()
    payloads = []
    mtypes = []
    for d, t in zip(did, texts):
        if d % 2 == 0:
            mtypes.append("image")
            if d % 6 == 0:
                px = np.full(
                    (int(3 + d % 7), int(4 + d % 9), 3),
                    (d % 256, (d * 7) % 256, (d * 13) % 256),
                    np.uint8,
                )
                payloads.append(bmp_encode(px))
            elif d % 6 == 2:
                v = int(128 + 3 * ((d % 41) - 20))
                px = np.full((int(9 + d % 17), int(11 + d % 13), 3), v, np.uint8)
                prog = d % 12 == 8  # a third of the JPEGs are SOF2
                payloads.append(jpeg_encode(
                    px, quality=90,
                    subsampling="420" if d % 12 == 2 else "444",
                    restart_interval=0 if prog else int((d // 2) % 3),
                    progressive=prog,
                ))
            else:
                px = np.full(
                    (int(5 + d % 11), int(6 + d % 8), 3),
                    ((d * 3) % 256, (d * 5) % 256, (d * 11) % 256),
                    np.uint8,
                )
                if d % 12 == 10:  # half the lossless rows are GIFs
                    payloads.append(gif_encode(px))
                else:
                    payloads.append(png_encode(px))
        elif d % 4 == 1:
            mtypes.append("video")
            if d % 8 == 1:
                payloads.append(vid1_encode(
                    int(1 + d % 60), 25, (t or "").encode("utf-8")[:16]))
            else:
                payloads.append(mp4_encode(
                    int(1 + d % 60), 25, (t or "").encode("utf-8")[:16]))
        else:
            mtypes.append("audio")
            amp = int((d * 37) % 4001) - 2000
            n = int(100 + d % 50)
            payloads.append(wav_encode(
                np.full(n, amp, np.int16), 8000))
    mtype = np.asarray(mtypes)
    table = pa.table(
        {
            "media_id": docs["doc_id"],
            "media_type": pa.array(mtype.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    shard_of = did % n_shards
    for s in range(n_shards):
        if os.path.exists(paths[s]):
            continue
        tmp = paths[s] + ".tmp"
        pq.write_table(table.filter(pa.array(shard_of == s)), tmp)
        os.replace(tmp, paths[s])
    return paths


def mediafp_from_docs(sf_dir: str, out_dir: str) -> list[str]:
    """Perceptual-hash + spectral-audio fixture (cached parquet, the
    media_from_docs pattern; ids offset into the 10M/20M/30M ranges so
    they never collide with the main media fixture):

    - ``doc_id % 16 == 6`` — a NEAR-DUP IMAGE PAIR: a deterministic
      photo-like multi-sinusoid RGB (params splitmix64-derived from
      doc_id) stored as BMP (id ``10M + doc_id``) and its
      brightness-shifted (+12) JPEG-q90 recompression (id
      ``20M + doc_id``) — cross-format, so the pair is only findable
      through REAL decode → pHash. Measured margins over the full sf0.1
      id range: planted-pair Hamming ≤ 8, so ``max_hamming=10`` makes
      recall a pigeonhole GUARANTEE (unrelated fixture images may
      legitimately fall inside the radius too — low-frequency content
      on a 12-parameter manifold collides — which is why the query
      asserts recall rather than pair-set equality, the ann_lsh
      pattern).
    - ``doc_id % 16 == 14`` — an alternating-sign square wave
      (amplitude ``a = 500 + (doc_id·53) % 2500``, ``n = 128 +
      2·(doc_id % 33)`` samples at 8 kHz, id ``30M + doc_id``): ALL
      energy sits in the Nyquist bin, so spectral centroid and rolloff
      round to exactly 4000 Hz and ``rms = a/32768`` is float-exact
      (power-of-two divisor) — closed-form oracle values for the
      AudioFeatures rFFT stage."""
    from changesetmd_ray.stages.codecs import bmp_encode, wav_encode
    from changesetmd_ray.stages.jpeg import jpeg_encode
    from changesetmd_ray.text.hashing import splitmix64 as _sm

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part-00000.parquet")
    if os.path.exists(path):
        return [path]
    docs = _read_small(sf_dir, "documents", ["doc_id"])
    did = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def grad_img(d: int) -> np.ndarray:
        u = _sm(np.uint64(d * 131) + np.arange(12, dtype=np.uint64)).astype(
            np.float64) / 2**64
        img = np.zeros((h, w, 3))
        for c in range(3):
            fy, fx = 0.5 + 2.5 * u[4 * c], 0.5 + 2.5 * u[4 * c + 1]
            py, px = 2 * np.pi * u[4 * c + 2], 2 * np.pi * u[4 * c + 3]
            img[..., c] = 128 + 90 * np.sin(2 * np.pi * fy * yy / h + py) * np.cos(
                2 * np.pi * fx * xx / w + px)
        return np.clip(img, 0, 255).astype(np.uint8)

    ids, mtypes, payloads = [], [], []
    for d in did:
        d = int(d)
        if d % 16 == 6:
            base = grad_img(d)
            near = np.clip(base.astype(np.int16) + 12, 0, 255).astype(np.uint8)
            ids += [10_000_000 + d, 20_000_000 + d]
            mtypes += ["image", "image"]
            payloads += [bmp_encode(base), jpeg_encode(near, quality=90)]
        elif d % 16 == 14:
            a = 500 + (d * 53) % 2500
            n = 128 + 2 * (d % 33)
            pcm = np.full(n, a, np.int16)
            pcm[1::2] = -a
            ids.append(30_000_000 + d)
            mtypes.append("audio")
            payloads.append(wav_encode(pcm, 8000))
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(mtypes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return [path]


def q_media_pipeline(sf_dir: str):
    """The full multimodal surface in ONE query (stages/multimodal.py),
    through the REAL codecs (stages/codecs.py BMP + stages/jpeg.py
    baseline JPEG) over the cached media fixture
    (:func:`media_from_docs`). Images flow resize(64×48, real decode →
    nearest-neighbor gather → re-encode in the SAME format) →
    metadata → decode (real pixel-stat features); videos pass the
    resize stage untouched and flow through the 1→N frame sampler
    (real header parse); audio rows flow through the WAV PCM-stats
    stage (real RIFF chunk walk + sample math). Exactly SQL-oracled:
    BMP rows f0 = (r+g+b)/765 of the planted color (solid survives NN
    resize) with payload_bytes = 9270 (the 64×48 BMP size); JPEG rows
    f0 = 3v/765 of the planted grey v (bit-exact through huffman
    decode → IDCT → resize → q90 re-encode → second decode); PNG rows
    f0 of the planted color (lossless, exact through resize +
    re-encode); DEFLATE/entropy-coded sizes are not closed-form, so
    JPEG/PNG payload_bytes are null; frames every 2nd index below
    1 + doc_id % 60 at 25 fps (ts = 40 ms each); audio rows carry
    (n_samples, duration_ms, 44+2n payload bytes, mean|s|/32768 —
    exact, power-of-two divisor)."""
    from changesetmd_ray.stages.multimodal import (
        audio_stats,
        decode_media,
        resize_media,
        sample_frames,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    paths = media_from_docs(sf_dir, f"/tmp/changesetmd_media_v6_{tag}")
    # pruned read: the query's outputs derive from the payload alone;
    # meta_* columns never leave storage
    # payload-heavy read: size blocks explicitly — the default splitter
    # shreds media tables into ~1 MB blocks and per-task fixed costs
    # dominate the decode (measured 6-9× on 20 k images, BASELINE.md
    # round-5 media notes). Results are per-row / layout-invariant.
    ds = ray.data.read_parquet(paths, columns=["media_id", "media_type", "payload"],
                               override_num_blocks=max(16, 4 * len(paths)))
    resized = resize_media(ds, width=64, height=48, codec="image", batch_size=256)

    def images_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.fill_null(pc.equal(batch["media_type"], "image"), False)
        ).select(["media_id", "media_type", "payload"])

    feats = decode_media(
        resized.map_batches(images_only, batch_format="pyarrow"),
        feat_dim=16, codec="image", batch_size=256,
    )

    def feat_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        feat = batch["feature"].combine_chunks()
        f0 = feat.flatten().to_numpy(zero_copy_only=False).reshape(-1, 16)[:, 0]
        # JPEG/PNG rows (media_id % 6 == 2 / 4): the entropy-coded /
        # DEFLATE byte size is not closed-form for the oracle — report
        # null, the pixel stat f0 is the (bit-exact) proof of decode
        mid = batch["media_id"].to_numpy(zero_copy_only=False)
        compressed = (mid % 6) != 0
        pbytes = pc.if_else(pa.array(compressed), pa.nulls(n, pa.int64()),
                            pc.cast(batch["payload_bytes"], pa.int64()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": pa.array(["feature"] * n, pa.string()),
                "frame_idx": pa.nulls(n, pa.int64()),
                "ts_ms": pa.nulls(n, pa.int64()),
                "payload_bytes": pbytes,
                "f0": pa.array(f0.astype(np.float64)),
            }
        )

    frames = sample_frames(resized, stride=2, codec="video", batch_size=256)

    def frame_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": pa.array(["frame"] * n, pa.string()),
                "frame_idx": batch["frame_idx"],
                "ts_ms": batch["ts_ms"],
                "payload_bytes": pa.nulls(n, pa.int64()),
                "f0": pa.nulls(n, pa.float64()),
            }
        )

    def audio_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.fill_null(pc.equal(batch["media_type"], "audio"), False)
        )

    audio = audio_stats(
        ds.map_batches(audio_only, batch_format="pyarrow"),
        codec="wav", batch_size=256)

    def audio_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": pa.array(["audio"] * n, pa.string()),
                "frame_idx": batch["n_samples"],
                "ts_ms": batch["duration_ms"],
                "payload_bytes": pc.cast(
                    pc.binary_length(batch["payload"]), pa.int64()),
                # power-of-two divisor: exact in float64 on both sides
                "f0": pc.divide(batch["mean_abs"], 32768.0),
            }
        )

    # --- round-5 branches: perceptual-hash near-dup + spectral audio
    # (stages/media_fp.py) over the planted cross-format fixture.
    from changesetmd_ray.stages.media_fp import (
        audio_features,
        media_neardup_candidates,
    )

    fp_paths = mediafp_from_docs(sf_dir, f"/tmp/changesetmd_mediafp_v1_{tag}")
    fp_ds = ray.data.read_parquet(
        fp_paths, columns=["media_id", "media_type", "payload"],
        override_num_blocks=16)  # payload-heavy: see the note above

    # recall assertion (the ann_lsh pattern): every planted BMP↔JPEG
    # pair MUST be found at max_hamming=10 (measured planted Hamming
    # ≤ 8 over the full sf0.1 id range + pigeonhole banding = a
    # guarantee); unrelated fixture images inside the radius are
    # legitimate near-dups of the fingerprint, so the emitted rows are
    # the asserted planted pairs, not the full pair set.
    found = {
        (r["id_a"], r["id_b"])
        for r in media_neardup_candidates(
            fp_ds, max_hamming=10, hot_group_limit=None  # exact pair list
        ).take_all()
    }
    planted_d = [
        int(d) for d in _read_small(sf_dir, "documents", ["doc_id"])
        ["doc_id"].to_numpy(zero_copy_only=False) if d % 16 == 6
    ]
    missing = [
        d for d in planted_d if (10_000_000 + d, 20_000_000 + d) not in found
    ]
    if missing:
        raise AssertionError(
            f"media near-dup recall failure: planted pairs missed for doc_ids {missing[:5]}"
        )
    phash_rows = ray.data.from_arrow(pa.table(
        {
            "media_id": pa.array([10_000_000 + d for d in planted_d], pa.int64()),
            "kind": pa.array(["phash"] * len(planted_d), pa.string()),
            "frame_idx": pa.array([20_000_000 + d for d in planted_d], pa.int64()),
            "ts_ms": pa.nulls(len(planted_d), pa.int64()),
            "payload_bytes": pa.nulls(len(planted_d), pa.int64()),
            "f0": pa.nulls(len(planted_d), pa.float64()),
        }
    ))

    def audio_fp_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.fill_null(pc.equal(batch["media_type"], "audio"), False))

    spectral = audio_features(
        fp_ds.map_batches(audio_fp_only, batch_format="pyarrow"))

    def spectral_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cent = batch["spectral_centroid_hz"].to_numpy(zero_copy_only=False)
        roll = batch["spectral_rolloff_hz"].to_numpy(zero_copy_only=False)
        # all planted energy sits in the Nyquist bin: centroid/rolloff
        # equal 4000 Hz up to rFFT dust, so the integer round is exact
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": pa.array(["spectral"] * n, pa.string()),
                "frame_idx": pa.array(np.rint(cent).astype(np.int64)),
                "ts_ms": pa.array(np.rint(roll).astype(np.int64)),
                "payload_bytes": pa.nulls(n, pa.int64()),
                "f0": batch["rms"],  # a/32768 — float-exact both sides
            }
        )

    return (
        feats.map_batches(feat_rows, batch_format="pyarrow")
        .union(frames.map_batches(frame_rows, batch_format="pyarrow"))
        .union(audio.map_batches(audio_rows, batch_format="pyarrow"))
        .union(phash_rows)
        .union(spectral.map_batches(spectral_rows, batch_format="pyarrow"))
    )


# the planted media truths, reproduced in SQL: solid colors survive the
# real nearest-neighbor resize, so the decoded per-channel means ARE the
# planted colors; 9270 = 54-byte header + 48 rows × 192 padded bytes of
# the resized 64×48 BMP; JPEG rows (doc_id % 6 = 2) decode BIT-EXACTLY
# to the planted grey v = 128 + 3*((doc_id % 41) - 20) because grey has
# Cb = Cr = 128 exactly and the q90 luma DC quantizer (3) divides
# 8*(v-128) — so f0 = 3v/765 in closed form even though the payload
# crossed huffman decode → IDCT → resize → re-encode → second decode;
# PNG rows (doc_id % 6 = 4) are lossless so the planted color IS the
# stat; compressed formats report null payload_bytes (DEFLATE/entropy
# sizes aren't closed-form); VID1 headers carry 1 + doc_id % 60 frames
# at 25 fps (stride 2 → even frame_idx, ts exactly 40 ms per frame);
# WAV rows (doc_id % 4 = 3) decode 100 + doc_id % 50 constant samples
# of amplitude ((doc_id*37) % 4001) - 2000 at 8 kHz — mean|s|/32768
# has a power-of-two divisor, exact in float64 on both sides
_SQL_MEDIA_PIPELINE = """
select doc_id as media_id, 'feature' as kind,
       cast(null as bigint) as frame_idx, cast(null as bigint) as ts_ms,
       cast(9270 as bigint) as payload_bytes,
       -- feature vectors are stored float32 (the ML convention); the
       -- REAL cast reproduces that rounding exactly
       cast(cast(cast((doc_id % 256) + ((doc_id * 7) % 256)
                      + ((doc_id * 13) % 256) as double) / 765.0
                 as real) as double) as f0
from documents where doc_id % 6 = 0
union all
select doc_id as media_id, 'feature' as kind,
       cast(null as bigint) as frame_idx, cast(null as bigint) as ts_ms,
       cast(null as bigint) as payload_bytes,
       cast(cast(cast(3 * (128 + 3 * ((doc_id % 41) - 20)) as double)
                 / 765.0 as real) as double) as f0
from documents where doc_id % 6 = 2
union all
select doc_id as media_id, 'feature' as kind,
       cast(null as bigint) as frame_idx, cast(null as bigint) as ts_ms,
       cast(null as bigint) as payload_bytes,
       cast(cast(cast(((doc_id * 3) % 256) + ((doc_id * 5) % 256)
                      + ((doc_id * 11) % 256) as double) / 765.0
                 as real) as double) as f0
from documents where doc_id % 6 = 4
union all
select doc_id as media_id, 'frame' as kind, f as frame_idx,
       f * 40 as ts_ms, cast(null as bigint) as payload_bytes,
       cast(null as double) as f0
from documents cross join (select unnest(range(0, 60, 2)) as f) fr
where doc_id % 4 = 1 and f < 1 + doc_id % 60
union all
select doc_id as media_id, 'audio' as kind,
       100 + doc_id % 50 as frame_idx,
       (100 + doc_id % 50) * 1000 // 8000 as ts_ms,
       cast(44 + 2 * (100 + doc_id % 50) as bigint) as payload_bytes,
       cast(abs(((doc_id * 37) % 4001) - 2000) as double) / 32768.0 as f0
from documents where doc_id % 4 = 3
union all
-- perceptual-hash near-dup recall assertions: the planted BMP <->
-- JPEG-recompressed pair for every doc_id % 16 = 6 must be found (the
-- query raises otherwise), emitted as (id_a, partner) rows
select 10000000 + doc_id as media_id, 'phash' as kind,
       20000000 + doc_id as frame_idx, cast(null as bigint) as ts_ms,
       cast(null as bigint) as payload_bytes, cast(null as double) as f0
from documents where doc_id % 16 = 6
union all
-- spectral features of the planted Nyquist-tone WAVs: centroid and
-- rolloff round to exactly 4000 Hz, rms = a/32768 is float-exact
select 30000000 + doc_id as media_id, 'spectral' as kind,
       cast(4000 as bigint) as frame_idx, cast(4000 as bigint) as ts_ms,
       cast(null as bigint) as payload_bytes,
       cast(500 + (doc_id * 53) % 2500 as double) / 32768.0 as f0
from documents where doc_id % 16 = 14
"""


def _dup_pairs_ds(sf_dir: str):
    """Verified dup-pair Dataset shared by both cluster queries:
    documents sharing a (lang, length-bucket) fingerprint pair up
    star-shaped within their key group (collision-guarded by the actual
    key)."""
    from changesetmd_ray.text.hashing import hash_bytes64

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=1024))

    def add_hash(batch: pa.Table) -> pa.Table:
        # null text partitions separately (SQL's length(NULL) is NULL,
        # its own window partition) — never folded into bucket 0
        keys = [
            f"{lg}|{'null' if t is None else len(t) // 100}"
            for lg, t in zip(batch["lang"].to_pylist(), batch["text"].to_pylist())
        ]
        h = np.fromiter(
            (hash_bytes64(k.encode("utf-8")) for k in keys), np.uint64, len(batch)
        )
        return (
            batch.drop_columns(["text"])
            .append_column("__key", pa.array(keys, pa.string()))
            .append_column("__h", pa.array(h.astype(np.int64)))
        )

    def group_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        keys = group["__key"].to_pylist()
        out_a, out_b = [], []
        by_key: dict[str, int] = {}
        order = np.argsort(ids)
        for i in order:  # collision guard: pair only true key matches
            t = keys[i]
            if t in by_key:
                out_a.append(by_key[t])
                out_b.append(int(ids[i]))
            else:
                by_key[t] = int(ids[i])
        return pa.table({"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64())})

    return ds.map_batches(add_hash, batch_format="pyarrow").groupby("__h").map_groups(
        group_pairs, batch_format="pyarrow"
    )


def q_docs_dup_clusters(sf_dir: str):
    """Duplicate-cluster assignment, BOTH implementations cross-checked
    in one query: documents sharing a (lang, length-bucket) fingerprint
    form a cluster → (doc_id, rep_id = min id of the component).

    Runs the small-pair-list path (driver union-find,
    text/dedup.py::duplicate_clusters) AND the 100-TB path (distributed
    min-label propagation, ::duplicate_clusters_dataset — the pair list
    never reaches the driver), asserts they agree row-for-row, and
    returns the distributed result. Cluster membership ≪ corpus is the
    documented regime for the driver-side compare."""
    from changesetmd_ray.text.dedup import duplicate_clusters, duplicate_clusters_dataset

    rows = _dup_pairs_ds(sf_dir).take_all()  # ONE execution
    pairs = pa.Table.from_pylist(rows) if rows else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    uf = duplicate_clusters(pairs)
    dist = duplicate_clusters_dataset(ray.data.from_arrow(pairs)).take_all()
    a = sorted((r["doc_id"], r["rep_id"]) for r in uf.to_pylist())
    b = sorted((r["doc_id"], r["rep_id"]) for r in dist)
    if a != b:
        raise AssertionError(
            f"union-find and label-propagation clusterings diverge: "
            f"{len(a)} vs {len(b)} rows"
        )
    return pa.table(
        {"doc_id": pa.array([x for x, _ in b], pa.int64()),
         "rep_id": pa.array([y for _, y in b], pa.int64())}
    )


_SQL_DOCS_DUP_CLUSTERS = """
select doc_id, min(doc_id) over (partition by lang, length(text)//100) as rep_id
from documents
qualify count(*) over (partition by lang, length(text)//100) > 1
"""


def q_docs_top_tokens(sf_dir: str):
    """Corpus vocabulary building — the wide exploded-token aggregation
    every tokenizer-training / frequency-filter pipeline runs: tokenize
    each doc, count per token with per-batch COMBINING before the one
    bucketed shuffle (the all-to-all carries one partial count row per
    distinct (batch, token), never per occurrence), then take the
    top-100 by count (ties → token asc). Token definition matches the
    SQL oracle on the ASCII corpus ([0-9a-z_]+ over lower())."""
    from changesetmd_ray.text.hashing import hash_bytes64, tokenize

    NB = 64
    ds = _read(sf_dir, "documents", ["text"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640))

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for tok in tokenize(t or ""):
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        h = np.fromiter(
            (hash_bytes64(t.encode()) for t in toks), np.uint64, len(toks)
        )
        return pa.table(
            {
                "__b": pa.array((h & np.uint64(NB - 1)).astype(np.int64)),
                "token": pa.array(toks, pa.string()),
                "n": pa.array([counts[t] for t in toks], pa.int64()),
            }
        )

    from changesetmd_ray.stages.exchange import flat, pack_by_bucket

    def combine(packed: pa.Table) -> pa.Table:
        group = pa.table({c: flat(packed, c) for c in ("token", "n")})
        return group.group_by("token").aggregate([("n", "sum")]).rename_columns(
            ["token", "n"]
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        # list-packed vocabulary exchange: token rows = blocks ×
        # per-block distinct tokens at scale
        .map_batches(lambda b: pack_by_bucket(b, "__b", ["token", "n"]),
                     batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pyarrow")
    )
    top = agg.sort(["n", "token"], descending=[True, False]).limit(100)
    return top.select_columns(["token", "n"])


_SQL_DOCS_TOP_TOKENS = r"""
select token, count(*) as n from (
  select unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) as token
  from documents)
group by token
order by n desc, token asc
limit 100
"""


def q_docs_keep_best(sf_dir: str):
    """The end-to-end near-dup REDUCTION a training-data pipeline runs:
    cluster near-duplicates (distributed label propagation), then keep
    ONE document per cluster — the best by quality (longest text, ties
    → smallest doc_id); unclustered docs pass through as their own
    cluster. Composition of the dedup-cluster, J1-attach and grouped
    argmax operators, each stage a bounded bucketed shuffle (the text
    column never shuffles — only (doc_id, n_chars) and labels)."""
    from changesetmd_ray.text.dedup import duplicate_clusters_dataset
    from changesetmd_ray.text.hashing import splitmix64

    NB = 64
    clusters = duplicate_clusters_dataset(_dup_pairs_ds(sf_dir))

    def doc_rows(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # null text → n_chars sentinel -1: loses to any real length
        # (the oracle's NULLS LAST), never poisons an int column with NaN
        n_chars = pc.fill_null(pc.cast(pc.utf8_length(batch["text"]), pa.int64()), -1)
        b = (splitmix64(did.astype(np.uint64)) & np.uint64(NB - 1)).astype(np.int64)
        return pa.table(
            {"__b": pa.array(b), "doc_id": pa.array(did), "n_chars": n_chars,
             "rep": pa.nulls(len(batch), pa.int64())}
        )

    def cluster_rows(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(did.astype(np.uint64)) & np.uint64(NB - 1)).astype(np.int64)
        return pa.table(
            {"__b": pa.array(b), "doc_id": pa.array(did),
             "n_chars": pa.array(np.full(len(batch), -1, dtype=np.int64)),
             "rep": batch["rep_id"]}
        )

    def attach_rep(group: pa.Table) -> pa.Table:
        # nullable int columns must never round-trip through float64
        # (ids ≥ 2^53 would silently corrupt): track validity separately
        is_doc = ~np.asarray(group["rep"].is_valid())
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = group["rep"].fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        nch = group["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_doc, n_doc = did[is_doc], nch[is_doc]
        lab_v, lab_r = did[~is_doc], rep[~is_doc]
        order = np.argsort(lab_v, kind="stable")
        lab_v, lab_r = lab_v[order], lab_r[order]
        # one label row per vertex → vectorized lookup by searchsorted;
        # docs without a label rep themselves (singletons)
        pos = np.searchsorted(lab_v, d_doc)
        pos_c = np.minimum(pos, max(len(lab_v) - 1, 0))
        has = (len(lab_v) > 0) & (lab_v[pos_c] == d_doc) if len(lab_v) else np.zeros(
            len(d_doc), dtype=bool
        )
        rep_arr = np.where(has, lab_r[pos_c] if len(lab_v) else 0, d_doc)
        b2 = (splitmix64(rep_arr.astype(np.uint64)) & np.uint64(NB - 1)).astype(np.int64)
        return pa.table(
            {"__b2": pa.array(b2), "rep_id": pa.array(rep_arr),
             "doc_id": pa.array(d_doc), "n_chars": pa.array(n_doc)}
        )

    def best_per_rep(group: pa.Table) -> pa.Table:
        rep = group["rep_id"].to_numpy(zero_copy_only=False)
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        nch = group["n_chars"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nch, rep))
        r_s = rep[order]
        first = np.concatenate([[True], r_s[1:] != r_s[:-1]])
        sel = order[first]
        return pa.table(
            {"rep_id": pa.array(rep[sel]), "doc_id": pa.array(did[sel]),
             "n_chars": pa.array(nch[sel])}
        )

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=1024)).map_batches(
        doc_rows, batch_format="pyarrow"
    )
    both = docs.union(clusters.map_batches(cluster_rows, batch_format="pyarrow"))
    labeled = both.groupby("__b").map_groups(attach_rep, batch_format="pyarrow")
    return labeled.groupby("__b2").map_groups(best_per_rep, batch_format="pyarrow")


_SQL_DOCS_KEEP_BEST = """
with lab as (
  select doc_id, length(text) as n_chars,
    case when count(*) over (partition by lang, length(text)//100) > 1
         then min(doc_id) over (partition by lang, length(text)//100)
         else doc_id end as rep_id
  from documents
)
select rep_id, doc_id, n_chars from (
  select rep_id, doc_id, n_chars,
    row_number() over (partition by rep_id order by n_chars desc, doc_id asc) rn
  from lab) where rn = 1
"""


def q_docs_ngram_jaccard(sf_dir: str):
    """Character-5-gram Jaccard near-dup (the 4th dedup mode): MinHash
    LSH over 5-gram hashes, exact n-gram Jaccard verified ≥ 0.5 —
    SQL-ORACLED by the same argument as ``docs_minhash_neardup``: the
    kept pairs are exactly the pairs with char-5-gram Jaccard ≥ 0.5
    (measured corpus margin: planted dups ≥ 0.87, background ≤ 0.36),
    and at (n_perm=128, n_bands=32, r=4) the per-pair candidate-miss
    probability at J = 0.87 is ≈ 1.5e-12; deterministic hashing,
    verified pair-exact vs the oracle per sf. The oracle compares the
    doc pairs' DISTINCT substr-5 sets directly (cross join +
    list_intersect) — quadratic BY DESIGN, fine at the driver's oracle
    scale (125k pairs at sf0.01); the Ray side stays fast at sf0.1
    (7.7 s) where the quadratic oracle does not."""
    pairs = minhash_lsh_candidates(
        _read(sf_dir, "documents", ["doc_id", "text"],
              blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640)),
        char_ngrams=5, threshold=0.5, carry_text=True, n_bands=32,
    )
    return pairs.select_columns(["id_a", "id_b"])


_SQL_DOCS_NGRAM_JACCARD = """
with g as (
  select doc_id, list_distinct(
    case when length(text) <= 5 then [lower(text)]
    else list_transform(range(1, length(text) - 3), i -> substr(lower(text), i, 5))
    end) as gs
  from documents where length(text) > 0
)
select a.doc_id as id_a, b.doc_id as id_b
from g a join g b on a.doc_id < b.doc_id
where len(list_intersect(a.gs, b.gs)) * 1.0
      / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.5
"""


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (5th dedup mode) with an exact
    SQL oracle: cosine ≥ 0.4 (data margin to the threshold ≥ 1e-4 ≫
    float error, verified at sf0.001/sf0.01)."""
    from changesetmd_ray.text.ann import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"],
              blocks=_shuffle_blocks(sf_dir, "embeddings", rows_per_block=1024)), threshold=0.4
    )


_SQL_EMBEDDING_NEARDUP = """
select a.vec_id as id_a, b.vec_id as id_b
from embeddings a, embeddings b
where a.vec_id < b.vec_id
  and list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate cosine top-k, driver-gated on recall:
    the query ALSO runs the exact brute-force top-k (ann_cosine's
    kernel) and asserts per-query recall ≥ 0.6 and mean recall ≥ 0.8 —
    the deterministic floor of this configuration (n_bits=16,
    max_mismatch=8, fixed seed: measured min-recall 0.6/0.8/0.6 and
    mean 0.87/0.90/0.85 at sf 0.001/0.01/0.1). The returned assertion
    rows are exact-SQL-expressible, so the battery check is a real
    rows+schema+hash match, not rows-only: a recall regression below
    the documented bound raises inside the query."""
    k = 5
    emb = _read_small(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = emb.filter(pc.less(emb["vec_id"], 8))

    def corpus():
        return _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                     blocks=_shuffle_blocks(sf_dir, "embeddings", rows_per_block=1024))

    approx = ann_lsh_topk(corpus(), queries, k, n_bits=16, max_mismatch=8)
    exact = ann_cosine_topk(corpus(), queries, k)
    lsh_sets: dict[int, set] = {}
    for r in approx.select_columns(["query_id", "neighbor_id"]).take_all():
        lsh_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact_sets: dict[int, set] = {}
    for r in exact.select_columns(["query_id", "neighbor_id"]).take_all():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = {
        q: len(lsh_sets.get(q, set()) & s) / len(s) for q, s in exact_sets.items()
    }
    bad = {q: r for q, r in recalls.items() if r < 0.6}
    if bad:
        raise AssertionError(f"ann_lsh per-query recall below 0.6: {bad}")
    mean = sum(recalls.values()) / len(recalls)
    if mean < 0.8:
        raise AssertionError(f"ann_lsh mean recall {mean:.3f} below 0.8")
    qs = sorted(recalls)
    return pa.table(
        {
            "query_id": pa.array(qs, pa.int64()),
            "k": pa.array([k] * len(qs), pa.int64()),
            "recall_bound": pa.array([0.6] * len(qs), pa.float64()),
            "recall_ok": pa.array([True] * len(qs), pa.bool_()),
        }
    )


_SQL_ANN_LSH = """
select vec_id as query_id, cast(5 as bigint) as k,
       0.6 as recall_bound, true as recall_ok
from embeddings where vec_id < 8
"""


# --------------------------------------------------------------- registry

QUERIES = {
    "tpch_q1": q_tpch_q1,
    "filter_project": q_filter_project,
    "topk_orders": q_topk_orders,
    "orders_per_segment": q_orders_per_segment,
    "customers_semi_anti": q_customers_semi_anti,
    "latest_event_per_user": q_latest_event_per_user,
    "events_by_type": q_events_by_type,
    "events_sampling": q_events_sampling,
    "events_sessions": q_events_sessions,
    "top_orders_per_cust": q_top_orders_per_cust,
    "order_price_quantiles": q_order_price_quantiles,
    "events_distinct_users_hll": q_events_distinct_users_hll,
    "orders_asof_events": q_orders_asof_events,
    "union_dedup": q_union_dedup,
    "promo_parts_by_brand": q_promo_parts_by_brand,
    "nations_per_region": q_nations_per_region,
    "priority_revenue": q_priority_revenue,
    "geo_pip": q_geo_pip,
    "geo_bbox_join": q_geo_bbox_join,
    "geo_knn": q_geo_knn,
    "geo_tile_counts": q_geo_tile_counts,
    "geo_zonal_stats": q_geo_zonal_stats,
    "geo_area_filter": q_geo_area_filter,
    "geo_raster_lookup": q_geo_raster_lookup,
    "geo_cell_encode": q_geo_cell_encode,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_minhash_neardup": q_docs_minhash,
    "docs_simhash_neardup": q_docs_simhash,
    "docs_text_analysis": q_docs_text_analysis,
    "ann_cosine": q_ann_cosine,
    "ann_lsh": q_ann_lsh,
    "pages_pipeline": q_pages_pipeline,
    "docs_dup_clusters": q_docs_dup_clusters,
    "docs_keep_best": q_docs_keep_best,
    "docs_top_tokens": q_docs_top_tokens,
    "docs_ngram_jaccard": q_docs_ngram_jaccard,
    "embedding_neardup": q_embedding_neardup,
    "pages_points_flatten": q_pages_points_flatten,
    "pages_tags": q_pages_tags,
    "media_pipeline": q_media_pipeline,
    "flagship_points_join": q_flagship_points_join,
}

# round-5: driver-checkable coverage for the LLM-curation stack
# (pipelines/curation_queries.py — line/span dedup, SemDeDup,
# classifier+LM, repetition, decontamination, BPE, packing/export, and
# the curate() composition)
from changesetmd_ray.pipelines import curation_queries as _cq  # noqa: E402

QUERIES.update(
    {
        "docs_line_dedup": _cq.q_docs_line_dedup,
        "docs_span_dedup": _cq.q_docs_span_dedup,
        "docs_semdedup": _cq.q_docs_semdedup,
        "docs_model_scores": _cq.q_docs_model_scores,
        "docs_repetition": _cq.q_docs_repetition,
        "docs_decontam": _cq.q_docs_decontam,
        "bpe_roundtrip": _cq.q_bpe_roundtrip,
        "packing_export": _cq.q_packing_export,
        "curation_docs": _cq.q_curation_docs,
    }
)
# NOTE: the driver's correctness battery checks at most 50 queries (r2
# registered 52, exactly the first 50 in dict order got rows) — keep
# this registry at ≤ 50 entries so every query gets a driver verdict.
assert len(QUERIES) <= 50, f"driver battery caps at 50 (have {len(QUERIES)})"

ORACLE_SQL = {
    "tpch_q1": _SQL_TPCH_Q1,
    "filter_project": _SQL_FILTER_PROJECT,
    "topk_orders": _SQL_TOPK_ORDERS,
    "orders_per_segment": _SQL_ORDERS_PER_SEGMENT,
    "customers_semi_anti": _SQL_SEMI_ANTI,
    "latest_event_per_user": _SQL_LATEST_EVENT,
    "events_by_type": _SQL_EVENTS_BY_TYPE,
    "events_sampling": _SQL_EVENTS_SAMPLING,
    "events_sessions": _SQL_EVENTS_SESSIONS,
    "top_orders_per_cust": _SQL_TOP_ORDERS_PER_CUST,
    "order_price_quantiles": _SQL_ORDER_PRICE_QUANTILES,
    "orders_asof_events": _SQL_ORDERS_ASOF_EVENTS,
    "union_dedup": _SQL_UNION_DEDUP,
    "promo_parts_by_brand": _SQL_PROMO_PARTS,
    "nations_per_region": _SQL_NATIONS_PER_REGION,
    "priority_revenue": _SQL_PRIORITY_REVENUE,
    "geo_pip": _SQL_GEO_PIP,
    "geo_bbox_join": _SQL_GEO_BBOX_JOIN,
    "geo_knn": _SQL_GEO_KNN,
    "geo_tile_counts": _SQL_GEO_TILE_COUNTS,
    "geo_zonal_stats": _SQL_GEO_ZONAL_STATS,
    "geo_area_filter": _SQL_GEO_AREA_FILTER,
    "geo_raster_lookup": _SQL_GEO_RASTER_LOOKUP,
    "docs_exact_dedup": _SQL_DOCS_EXACT_DEDUP,
    "docs_text_analysis": _sql_docs_text_analysis(),
    "ann_cosine": _SQL_ANN_COSINE,
    "docs_dup_clusters": _SQL_DOCS_DUP_CLUSTERS,
    "docs_keep_best": _SQL_DOCS_KEEP_BEST,
    "docs_top_tokens": _SQL_DOCS_TOP_TOKENS,
    "embedding_neardup": _SQL_EMBEDDING_NEARDUP,
    "pages_points_flatten": _SQL_PAGES_POINTS_FLATTEN,
    "pages_tags": _SQL_PAGES_TAGS,
    "geo_cell_encode": _sql_geo_cell_encode(),
    "pages_pipeline": _sql_pages_pipeline(),
    "flagship_points_join": _SQL_FLAGSHIP_POINTS_JOIN,
    "events_distinct_users_hll": _SQL_DISTINCT_USERS_HLL,
    "docs_minhash_neardup": _SQL_DOCS_MINHASH,
    "docs_ngram_jaccard": _SQL_DOCS_NGRAM_JACCARD,
    "docs_simhash_neardup": _sql_docs_simhash(),
    "media_pipeline": _SQL_MEDIA_PIPELINE,
    "ann_lsh": _SQL_ANN_LSH,
    "docs_line_dedup": _cq._SQL_DOCS_LINE_DEDUP,
    "docs_span_dedup": _cq._SQL_DOCS_SPAN_DEDUP,
    "docs_semdedup": _cq._SQL_DOCS_SEMDEDUP,
    "docs_model_scores": _cq._SQL_DOCS_MODEL_SCORES,
    "docs_repetition": _cq._sql_docs_repetition(),
    "docs_decontam": _cq._SQL_DOCS_DECONTAM,
    "bpe_roundtrip": _cq._SQL_BPE_ROUNDTRIP,
    "packing_export": _cq._SQL_PACKING_EXPORT,
    "curation_docs": _cq._sql_curation_docs(),
    # every registered query is exactly oracled: ann_lsh returns
    # recall-assertion rows (the approximate neighbor set itself is not
    # SQL-expressible, its ≥-bound contract is), media_pipeline decodes
    # planted BMP/VID1 media through the real codecs
}
