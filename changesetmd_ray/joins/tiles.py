"""J5 — raster-tile ↔ vector operators (SURVEY.md §2.4 J5, §2.6 O2).

Web-mercator slippy tiles are the raster grid; vector rows (points or
bboxes) are assigned tile keys with :mod:`changesetmd_ray.geo.grid`
kernels inside stateless ``map_batches``. Aggregation pre-combines
inside each batch before the global ``groupby`` shuffle (A4 partial
aggregation), and ordered tile output uses an explicit range-partition
``sort`` (O2 — never rely on block order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from changesetmd_ray.geo.grid import pack_tile, tile_xyz


def assign_tiles(ds, zoom: int, *, lon_col: str = "lon", lat_col: str = "lat",
                 out_col: str = "tile_key"):
    """Append ``tile_x``, ``tile_y``, ``out_col`` (packed uint64→int64)
    web-mercator tile columns at ``zoom``. Null/NaN coords → null tiles."""

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        x = np.zeros(len(lon), dtype=np.int64)
        y = np.zeros(len(lon), dtype=np.int64)
        if ok.any():
            x[ok], y[ok] = tile_xyz(lon[ok], lat[ok], zoom)
        key = pack_tile(zoom, x, y).astype(np.int64)
        mask = ~ok
        return (
            batch.append_column("tile_x", pa.array(x, pa.int64(), mask=mask))
            .append_column("tile_y", pa.array(y, pa.int64(), mask=mask))
            .append_column(out_col, pa.array(key, pa.int64(), mask=mask))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tile_counts(ds, zoom: int, *, lon_col: str = "lon", lat_col: str = "lat",
                num_buckets: int = 64):
    """Per-tile point counts, sorted by tile key. Partial aggregation
    inside every block bounds the shuffle to (distinct tiles per block)
    rows, and the global sum runs through stages/reduce.py instead of
    Ray's sort-based groupby: a repartition tree (already sorted, no
    shuffle) for zooms whose tile domain fits one block, the bucketed
    sparse reduce + explicit sort beyond that. Measured 6× faster than
    the naive groupby+sort on 16 M points at zoom 8."""
    from changesetmd_ray.stages.reduce import bucket_sum, tree_sum

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        x, y = tile_xyz(lon[ok], lat[ok], zoom)
        keys = pack_tile(zoom, x, y).astype(np.int64)
        u, n = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "tile_key": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    partials = ds.select_columns([lon_col, lat_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    if 4**zoom <= 1 << 22:  # tile domain fits one block → sorted tree
        agg = tree_sum(partials, key_col="tile_key", val_col="n")
    else:
        agg = bucket_sum(
            partials, key_col="tile_key", val_col="n", num_buckets=num_buckets
        ).sort("tile_key")
    return agg.map_batches(
        lambda t: t.rename_columns(["tile_key", "n_points"]), batch_format="pyarrow"
    )


def raster_vector_join(vector, raster: pa.Table, zoom: int, *,
                       lon_col: str = "lon", lat_col: str = "lat",
                       tile_col: str = "tile_key",
                       value_cols: tuple = ("value",),
                       concurrency=None):
    """Join vector rows to a (small, broadcast) raster table keyed by
    ``tile_col``: every vector row gets the raster value(s) of the tile
    it falls in (null when the tile has no raster row).

    The raster side ships once via ``ray.put`` and is probed with a
    vectorized ``searchsorted`` per batch — the broadcast-join shape for
    a small side (SURVEY.md §2.4); for raster sets too large to
    broadcast, assign tiles then hash-join on ``tile_col`` instead.

    ``concurrency=None`` (default) runs the probe as a TASK pool: the
    per-worker state is one zero-copy ``ray.get`` of the broadcast
    payload, so rebuilding it per task costs microseconds while an
    autoscaling actor pool pays ~1.5 s of process-spawn latency before
    the first batch (the flagship's task-pools-not-actor-pools rule,
    pipelines/flagship.py). Pass an int / (min, max) to force actors.
    """
    keys = raster[tile_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    payload = (keys[order], {c: raster[c].to_numpy(zero_copy_only=False)[order] for c in value_cols})
    ref = ray.put(payload)

    class Probe:
        def __init__(self):
            self.keys, self.values = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[tile_col]
            if len(self.keys) == 0:
                # empty raster: every value column is null (numpy's &
                # would not short-circuit the keys[pos_c] gather below)
                for c, vals in self.values.items():
                    batch = batch.append_column(
                        c, pa.nulls(len(batch), pa.from_numpy_dtype(vals.dtype))
                    )
                return batch
            # null tile keys must NOT go through to_numpy's float64 path:
            # 60-bit packed keys lose precision in float64 (ulp > 128)
            valid = ~np.asarray(pc.is_null(col).combine_chunks())
            tk = np.asarray(pc.fill_null(col, 0).combine_chunks()).astype(np.int64)
            pos = np.searchsorted(self.keys, tk)
            pos_c = np.clip(pos, 0, len(self.keys) - 1)
            hit = valid & (self.keys[pos_c] == tk)
            for c, vals in self.values.items():
                v = vals[pos_c]
                batch = batch.append_column(c, pa.array(v, mask=~hit))
            return batch

    tiled = assign_tiles(vector, zoom, lon_col=lon_col, lat_col=lat_col, out_col=tile_col)
    if concurrency is None:
        return tiled.map_batches(
            lambda b: Probe()(b), batch_format="pyarrow"
        )
    return tiled.map_batches(Probe, batch_format="pyarrow", concurrency=concurrency)


def write_sorted_tiles(ds, out_dir: str, *, tile_col: str = "tile_key"):
    """Ordered tile output: explicit range-partition sort on the tile
    key, then partitioned parquet (one directory per tile) so any tile
    is independently re-readable/resumable."""
    ds.sort(tile_col).write_parquet(out_dir, partition_cols=[tile_col])
