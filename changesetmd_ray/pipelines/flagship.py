"""Flagship pipeline: pages parquet → geo extraction → cell encoding →
partitioned parquet, resumable per input shard.

The Ray-Data shape of the reference's bulk-load entry point
(``changesetmd.py:494-627``, SURVEY.md §3.1): the iterparse loop becomes
a streaming ``map_batches`` chain; "create tables" disappears into
declared Arrow schemas; "build indexes after load" becomes the
CellEncoder columns; the progress/state bookkeeping becomes the
per-partition manifest (SURVEY.md §4.3.4).

Scale design notes:
- one input *file* = one partition (≙ a replication sequence file,
  ``changesetmd.py:290-300``); waves of ``wave_size`` partitions are
  processed per streaming-executor run, so a crash redoes at most one
  wave and the manifest advances between waves. At 100 TB a wave is a
  few thousand files; within a wave Ray streams blocks with
  backpressure — nothing is materialized.
- output is ``data/shard_id=<id>/`` partitioned parquet with
  deterministic directories: re-running a partition first removes its
  directory, so reruns are idempotent whole-partition overwrites
  (≙ the reference's upsert-on-replicate, ``changesetmd.py:164-182``).
- the extract/encode stages are task pools (their state rebuilds in
  microseconds; autoscaling actor pools ramp too slowly to saturate a
  node — measured); batches stay Arrow end-to-end (zero-copy ``text``
  passthrough).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from changesetmd_ray.stages.encode import CellEncoder
from changesetmd_ray.stages.extract import GeoExtractor
from changesetmd_ray.state.manifest import Manifest


def _shard_of(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


@ray.remote
def _shard_meta(data_dir: str, points_dir: str, pid: str) -> dict:
    """Manifest metrics for one finished partition from parquet FOOTERS
    only — no data read-back: parent rows + warc_ts watermark come from
    file metadata / column statistics, and the points count is the sum
    of the child files' row counts (child rows ARE the flattened
    points). This still validates that the claimed rows are physically
    on disk (footer row counts describe the bytes actually written)
    while costing milliseconds per shard instead of re-reading the
    wave's data (measured ~3.3 s of the 1 M-page flagship run). Files
    whose row groups lack stats fall back to reading just the warc_ts
    column."""
    import glob as _glob

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    rows = 0
    wm = None
    for f in sorted(_glob.glob(os.path.join(data_dir, f"shard_id={pid}", "*.parquet"))):
        md = _pq.read_metadata(f)
        rows += md.num_rows
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        if "warc_ts" not in names or md.num_rows == 0:
            continue
        ci = names.index("warc_ts")
        stats = [md.row_group(r).column(ci).statistics for r in range(md.num_row_groups)]
        if any(s is None or not s.has_min_max for s in stats):
            col = _pq.read_table(f, columns=["warc_ts"])["warc_ts"]
            mx = _pc.max(col).as_py()
        else:
            mx = max(s.max for s in stats)
        if mx is not None and (wm is None or mx > wm):
            wm = mx
    points = sum(
        _pq.read_metadata(f).num_rows
        for f in _glob.glob(os.path.join(points_dir, f"shard_id={pid}", "*.parquet"))
    )
    return {"rows": rows, "points": points,
            "watermark": str(wm) if wm is not None else None}


def _attach_shard_id(batch: pa.Table) -> pa.Table:
    shard = pc.replace_substring_regex(batch["path"], r"^.*/([^/]+)\.parquet$", r"\1")
    return batch.drop_columns(["path"]).append_column("shard_id", shard)


def explode_list_column(col) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """List column → ``(parent_row_idx, seq, flat_values)`` with
    document order preserved (``seq`` = 0-based ordinal within the
    parent row). The ONE list-explode kernel — the flagship child sink
    and the M3 flatten query both use it. Slice-safe: Arrow offsets are
    absolute, so they are rebased before the repeat arithmetic."""
    pts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = pts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    counts = np.diff(offsets)
    idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    total = int(counts.sum())
    seq = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], counts)
    return idx, seq, pts.flatten()


def _flatten_points_child(batch: pa.Table) -> pa.Table:
    """Parent rows → child point rows (url, warc_ts, seq, lon, lat) —
    the reference's second table write (changesets + comments,
    changesetmd.py:190-196): the nested ``points`` list explodes into a
    child table keyed by the parent's natural key, ``seq`` preserving
    document order. Expects the in-flight ``shard_id`` column."""
    idx_np, seq, flat = explode_list_column(batch["points"])
    idx = pa.array(idx_np)
    return pa.table(
        {
            "url": batch["url"].take(idx),
            "warc_ts": batch["warc_ts"].take(idx),
            "seq": pa.array(seq),
            "lon": flat.field("lon"),
            "lat": flat.field("lat"),
            "shard_id": batch["shard_id"].take(idx),
        }
    )


def _child_sink(batch: pa.Table, points_dir: str) -> pa.Table:
    """Side-effect child-table writer fused into the main wave pass:
    flattens the batch's ``points`` lists and writes them straight to
    ``points_dir/shard_id=<sid>/`` (hive layout, shard column in the
    directory only — identical to what ``write_parquet(partition_cols)``
    produced when the child table was a separate read-back pass), then
    returns the batch unchanged for the parent sink. One file per
    (block, shard), named DETERMINISTICALLY from the block's FULL
    content (a hash over every (url, warc_ts, seq) in the part — not
    just boundary rows, which can coincide across blocks when parent
    keys repeat) and committed with tmp + ``os.replace``: a Ray task
    retry or lineage re-execution re-processes the same input block,
    produces the same name, and overwrites instead of appending a
    duplicate — in-run idempotency on top of the wave-level rmtree —
    while two DIFFERENT blocks of the same shard can never collide on
    a name and silently clobber each other's rows."""
    import pyarrow.parquet as pq

    from changesetmd_ray.text.hashing import hash_bytes64

    child = _flatten_points_child(batch)
    if len(child) == 0:
        return batch
    sids = child["shard_id"]
    for sid in pc.unique(sids).to_pylist():
        part = child.filter(pc.equal(sids, sid)).drop_columns(["shard_id"])
        d = os.path.join(points_dir, f"shard_id={sid}")
        os.makedirs(d, exist_ok=True)
        urls = part["url"].combine_chunks()
        # StringArray buffers: [validity, offsets, data] — offsets+data
        # together pin the full column content
        ubufs = urls.buffers()
        ident = b"\x00".join(
            (
                ubufs[1].to_pybytes() if ubufs[1] else b"",
                ubufs[2].to_pybytes() if ubufs[2] else b"",
                part["warc_ts"].combine_chunks().to_numpy(
                    zero_copy_only=False).tobytes(),
                part["seq"].combine_chunks().to_numpy(
                    zero_copy_only=False).tobytes(),
                str(len(part)).encode(),
            )
        )
        name = f"part-{hash_bytes64(ident) & 0xFFFFFFFFFFFFFFFF:016x}.parquet"
        tmp = os.path.join(d, name + ".tmp")
        pq.write_table(part, tmp)
        os.replace(tmp, os.path.join(d, name))
    return batch


def run_flagship(
    input_files: list[str],
    out_dir: str,
    *,
    s2_level: int = 12,
    hex_res: int = 9,
    grid_zoom: int = 7,
    batch_size: int = 2048,
    concurrency=(1, 8),
    wave_size: int = 256,
    resume: bool = True,
    langs: list[str] | None = None,
) -> dict:
    """Run (or resume) the flagship pipeline over ``input_files``.

    Returns overall metrics: partitions processed/skipped, rows, points,
    wall seconds, rows/sec.
    """
    data_dir = os.path.join(out_dir, "data")
    points_dir = os.path.join(out_dir, "points")
    manifest = Manifest(os.path.join(out_dir, "_manifest"))
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(points_dir, exist_ok=True)

    # stages run as TASK pools; ``concurrency`` (int or (min, max)
    # tuple) caps concurrent tasks by its max bound, None = executor
    # default (all CPUs)
    task_cap = None
    if concurrency is not None:
        task_cap = max(concurrency) if isinstance(concurrency, tuple) else int(concurrency)

    for p in input_files:
        if not p.endswith(".parquet"):
            raise ValueError(
                f"input {p!r}: shard files must end in .parquet — the shard id "
                "is derived from the basename and drives resume bookkeeping"
            )
    by_shard = {_shard_of(p): p for p in input_files}
    if len(by_shard) != len(input_files):
        from collections import Counter

        dupes = [s for s, c in Counter(_shard_of(p) for p in input_files).items() if c > 1]
        raise ValueError(
            f"duplicate shard basenames {dupes!r}: shard ids must be unique "
            "(one file = one partition)"
        )
    order = sorted(by_shard)
    manifest.acquire_lock()
    try:
        pending, skipped = _plan_pending(
            manifest, order, resume, data_dir=data_dir, points_dir=points_dir
        )
        return _run_waves(
            manifest, pending, skipped, by_shard,
            data_dir=data_dir, points_dir=points_dir, out_dir=out_dir,
            s2_level=s2_level, hex_res=hex_res, grid_zoom=grid_zoom,
            batch_size=batch_size, task_cap=task_cap, wave_size=wave_size,
            langs=langs,
        )
    finally:
        manifest.release_lock()


def _plan_pending(manifest, order, resume, *, data_dir, points_dir):
    pending = manifest.pending(order) if resume else order
    if resume:
        # a "done" marker is only trusted when the rows it claims are
        # actually on disk — BOTH tables: a crash between invalidation
        # and rewrite, an out-of-band delete, or an out_dir produced by
        # a build without the child points table must all repair, not
        # silently skip
        repair = set()
        for pid in set(order) - set(pending):
            try:
                entry = manifest.read(pid)
            except (OSError, ValueError):
                repair.add(pid)
                continue
            if entry.get("rows", 0) > 0 and not os.path.isdir(
                os.path.join(data_dir, f"shard_id={pid}")
            ):
                repair.add(pid)
            elif entry.get("points", 0) > 0 and not os.path.isdir(
                os.path.join(points_dir, f"shard_id={pid}")
            ):
                repair.add(pid)
        if repair:
            for pid in repair:
                manifest.invalidate(pid)
            keep = set(pending) | repair
            pending = [p for p in order if p in keep]
    return pending, len(order) - len(pending)


def _run_waves(manifest, pending, skipped, by_shard, *, data_dir, points_dir,
               out_dir, s2_level, hex_res, grid_zoom, batch_size, task_cap,
               wave_size, langs):
    t0 = time.perf_counter()
    rows_total = 0
    points_total = 0
    wave_stats = None
    for w in range(0, len(pending), wave_size):
        wave = pending[w : w + wave_size]
        # idempotent overwrite: clear the wave's output dirs first
        # (parent AND child — they commit together per wave)
        for pid in wave:
            shutil.rmtree(os.path.join(data_dir, f"shard_id={pid}"), ignore_errors=True)
            shutil.rmtree(os.path.join(points_dir, f"shard_id={pid}"), ignore_errors=True)

        ds = ray.data.read_parquet([by_shard[p] for p in wave], include_paths=True)
        # the reference's contributor allow-list shape
        # (changesetmd.py:215-219): broadcast small set, vectorized is_in
        allow = pa.array(sorted(langs), pa.string()) if langs else None

        # task pools, not actor pools: the stage state (compiled
        # regex / lookup tables) rebuilds in microseconds, and
        # autoscaling actor pools ramp too slowly to saturate the
        # node (measured in joins/pip.py; extract was capped at 8
        # actors before this change).
        # shard-id attach + lang filter are FOLDED into this stage, not
        # separate map_batches: ReadParquet does not fuse with maps in
        # this Ray version, so each extra operator is another full
        # object-store crossing of the heavy ``html`` column (~GB/M
        # pages); folding keeps the payload's plasma hops at the
        # read boundary only
        def extract_fn(batch):
            if allow is not None:
                batch = batch.filter(pc.is_in(batch["lang"], value_set=allow))
            return GeoExtractor()(_attach_shard_id(batch))

        encoder = CellEncoder(
            s2_level=s2_level, hex_res=hex_res, grid_zoom=grid_zoom
        )

        def encode_fn(batch, _enc=encoder):
            return _enc(batch)

        ds = ds.map_batches(
            extract_fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=task_cap,
        )
        ds = ds.map_batches(
            encode_fn,
            batch_format="pyarrow",
            batch_size=max(batch_size * 4, 8192),
            concurrency=task_cap,
        )
        # child table (S7) commits inside the SAME pass as the parent —
        # the points lists never re-read from disk; the reference writes
        # changesets + comments from the one iterparse cursor the same
        # way (changesetmd.py:255-263). batch_size=None = whole blocks,
        # bounding child file count at one per (block, shard).
        ds = ds.map_batches(
            _child_sink,
            fn_kwargs={"points_dir": points_dir},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=task_cap,
        )
        t_wave = time.perf_counter()
        ds.write_parquet(data_dir, partition_cols=["shard_id"])
        wave_secs = time.perf_counter() - t_wave
        # per-stage wall breakdown for the tuning loop (the
        # measure-don't-guess rule): first lines of ds.stats()
        wave_stats = "\n".join(ds.stats().splitlines()[:30])

        # manifest metrics from a parallel FOOTER-ONLY scan of the
        # wave's output (validates the write — footer row counts
        # describe the bytes on disk; reference tracked rows + max
        # timestamp the same way, changesetmd.py:255-263). Zero-output
        # partitions (e.g. a lang filter matching nothing) naturally
        # report rows=0 — no special case.
        metas = ray.get(
            [_shard_meta.remote(data_dir, points_dir, pid) for pid in wave]
        )
        for pid, meta in zip(wave, metas):
            entry = {
                "input": by_shard[pid],
                "rows": int(meta["rows"]),
                "points": int(meta["points"]),
                "watermark": meta["watermark"],
                "wave_secs": wave_secs,
                "stage_config": {
                    "s2_level": s2_level,
                    "hex_res": hex_res,
                    "grid_zoom": grid_zoom,
                    "batch_size": batch_size,
                },
                "wave_stats": wave_stats,
            }
            manifest.mark_done(pid, entry)
            rows_total += entry["rows"]
            points_total += entry["points"]

    secs = time.perf_counter() - t0
    return {
        "partitions": len(pending),
        "skipped": skipped,
        "rows": rows_total,
        "points": points_total,
        "secs": secs,
        "rows_per_sec": rows_total / secs if secs > 0 else 0.0,
        "out_dir": out_dir,
        "last_wave_stats": wave_stats if pending else None,
    }


def read_output(out_dir: str, columns: list[str] | None = None):
    """Dataset over the flagship parent output (column-pruned)."""
    return ray.data.read_parquet(os.path.join(out_dir, "data"), columns=columns)


def read_points_output(out_dir: str, columns: list[str] | None = None):
    """Dataset over the flagship child (flattened points) output."""
    return ray.data.read_parquet(os.path.join(out_dir, "points"), columns=columns)
