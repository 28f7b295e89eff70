"""Point-list explode stage (M3-shaped flatten, SURVEY.md §2.2).

The reference flattens nested ``<discussion>/<comment>`` children into a
second table (``changesetmd.py:227-234``); the analogous 1→N operator
here flattens the ``points: list<struct<lon,lat>>`` column produced by
the extract stage into one row per point, carrying chosen parent columns
along. Pure Arrow (list_flatten + take on repeated parent indices) — no
Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_points_batch(
    batch: pa.Table,
    *,
    points_col: str = "points",
    keep: tuple = ("url", "warc_ts"),
    with_seq: bool = True,
) -> pa.Table:
    """One output row per point; parent columns in ``keep`` repeated.
    ``point_seq`` numbers points within their parent row (document
    order, stable across reruns)."""
    pts = batch[points_col].combine_chunks()  # ChunkedArray → single Array
    flat = pc.list_flatten(pts)
    counts = pc.list_value_length(pts).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), counts))
    cols = {k: pc.take(batch[k], idx) for k in keep}
    cols["lon"] = flat.field("lon")
    cols["lat"] = flat.field("lat")
    if with_seq:
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        seq = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(offs, counts)
        cols["point_seq"] = pa.array(seq)
    return pa.table(cols)


def explode_points(ds, *, points_col: str = "points", keep: tuple = ("url", "warc_ts"),
                   with_seq: bool = True):
    """Dataset-level explode: ``map_batches`` over the batch kernel."""

    def fn(batch: pa.Table) -> pa.Table:
        return explode_points_batch(batch, points_col=points_col, keep=keep, with_seq=with_seq)

    return ds.map_batches(fn, batch_format="pyarrow")
