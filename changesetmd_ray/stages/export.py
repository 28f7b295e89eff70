"""Seeded deterministic global shuffle + sharded training export.

The last step of a training-data pipeline: after dedup/filter/score,
the corpus must reach the trainer in S roughly-equal shards whose row
order is decorrelated from the input layout (crawl order, host
grouping) and reproducible from a seed. ``Dataset.random_shuffle`` is
the built-in, but its permutation depends on the block arrangement and
is not replayable — a resumed export would reshuffle everything.

Reference analogue: none — the reference loader preserves input order
(`changesetmd.py:208-271` single-pass iterparse); this is a
training-data addition in the same family as ``text/dedup``.

Design (the payload rides exactly ONE all-to-all — intrinsic to any
global shuffle; everything else is map-side):

- permutation key ``k = splitmix64(id_hash ^ splitmix64(seed))`` —
  uniform uint64, a pure function of (row id, seed), independent of
  how the input happens to be partitioned. Integer ids hash
  vectorized; string ids reuse :func:`hash_bytes128`, the same key
  derivation as ``exact_dedup`` (``text/dedup.py``).
- ``shard = k >> (64 - log2(num_shards))`` — the key's top bits, so
  expected shard sizes are equal and shard assignment needs no second
  hash. ``num_shards`` must be a power of two.
- within a shard, rows sort by ``k`` — a total order under the
  unique-id contract, so re-running the export writes the same
  rows in the same order into the same file: each shard file is an
  idempotent whole-partition overwrite, the engine-wide resume unit
  (one file = one partition, like the flagship sink).
- the exchange is the engine's list-packed primitive
  (:mod:`changesetmd_ray.stages.exchange`): each block packs its rows
  per shard into list columns, so the sort all-to-all moves at most
  ``blocks × num_shards`` packed rows (Ray's shuffle cost tracks row
  count far more than bytes — measured warm 10.9 s → 3.8-4.7 s on a
  4 M-row / 1 GB export at 32 CPUs, the payload bytes unchanged).
- one parquet file per shard, written inside the per-shard group
  task — the driver never sees row payloads; it collects only the
  S-row manifest (shard id, rows, path).

Null ids are rejected (a training row needs a stable identity; with
nulls the within-shard tie-break would be undefined). Duplicate ids
co-locate (same key → same shard) but their relative order within
the tie is NOT layout-invariant (the stable sort preserves whatever
order the exchange assembled the group in) — run ``exact_dedup``
first if full determinism is required, which a training pipeline
does anyway.

At 100 TB: the shuffle moves each payload byte once (Ray's sort-based
exchange, spilling via the object store); ``num_shards`` sizes the
output files (pick S ≈ total_bytes / 1-4 GB) and bounds per-task
memory — a shard group must fit one task, the same contract as every
``map_groups`` consumer in this repo.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from changesetmd_ray.stages.exchange import flat, flat_np, pack_by_bucket
from changesetmd_ray.text.hashing import check_pow2, hash_bytes128, splitmix64

_KEY = "__shuffle_k"
_SHARD = "__shuffle_shard"  # composite (split_idx * num_shards + shard)


def _id_hash64(batch: pa.Table, id_col: str) -> np.ndarray:
    """uint64 hash of the id column; vectorized for integers, the
    exact_dedup byte-hash for strings/binary. Raises on null ids."""
    col = batch[id_col]
    if pc.any(pc.is_null(col)).as_py():
        raise ValueError(f"{id_col}: null ids cannot be shuffle-exported")
    t = batch.schema.field(id_col).type
    if pa.types.is_integer(t):
        return splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
    vals = col.to_pylist()
    # hash_bytes128 returns SIGNED int64 halves (exact_dedup's key type);
    # mask to the uint64 bit pattern — numpy>=2.0 raises OverflowError on
    # negative values fed to a uint64 fromiter (1.26 only warned)
    return np.fromiter(
        (
            hash_bytes128(v.encode("utf-8") if isinstance(v, str) else bytes(v))[0]
            & 0xFFFFFFFFFFFFFFFF
            for v in vals
        ),
        np.uint64,
        len(vals),
    )


def _keyed_export(
    ds,
    *,
    id_col: str,
    seed: int,
    num_shards: int,
    out_dirs: list[str],
    split_hi: np.ndarray | None,
) -> list[dict]:
    """Shared single-exchange core for :func:`shuffle_export` (one
    split) and :func:`split_export` (N disjoint splits). The composite
    group key is ``split_idx * num_shards + shard``, so the payload
    rides exactly ONE list-packed all-to-all no matter how many splits
    there are — the input lineage executes once. ``split_hi`` is the
    sorted uint64 upper bound per split (``None`` → everything is
    split 0); ``out_dirs[i]`` receives split ``i``'s shard files.

    Returns the ≤ ``len(out_dirs) × num_shards`` manifest rows
    (dicts with split_idx/shard/rows/path) — never row payloads.
    """
    check_pow2(num_shards, "num_shards")
    shift = np.uint64(64 - int(num_shards).bit_length() + 1)
    seed_mix = splitmix64(np.array([np.uint64(seed)], np.uint64))[0]
    # split hash uses seed+1 so membership is independent of the
    # within-split shuffle order (same seed, different hash)
    split_mix = splitmix64(np.array([np.uint64(seed + 1)], np.uint64))[0]
    for d in out_dirs:
        os.makedirs(d, exist_ok=True)

    def key_batch(batch: pa.Table) -> pa.Table:
        h = _id_hash64(batch, id_col)
        k = splitmix64(h ^ seed_mix)
        shards = (
            np.zeros(len(k), np.int64)  # num_shards=1: >>64 is undefined
            if num_shards == 1
            else (k >> shift).astype(np.int64)
        )
        if split_hi is not None:
            sh = splitmix64(h ^ split_mix)
            # split i owns (hi[i-1], hi[i]]; hi[-1] == 2^64-1 so every
            # hash lands in a split — searchsorted-left IS that rule
            shards += np.searchsorted(split_hi, sh, side="left").astype(
                np.int64
            ) * np.int64(num_shards)
        # int64 view: Ray's sort shuffle compares the groupby key as a
        # signed value — composite ids (< splits × num_shards) fit int64
        keyed = batch.append_column(
            _KEY, pa.array(k.view(np.int64), pa.int64())
        ).append_column(_SHARD, pa.array(shards, pa.int64()))
        # list-pack per shard: the sort all-to-all then moves at most
        # blocks × splits × num_shards packed rows, not one per input row
        return pack_by_bucket(keyed, _SHARD, [*batch.column_names, _KEY])

    def write_shard(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        composite = int(group[_SHARD][0].as_py())
        split_idx, shard = divmod(composite, num_shards)
        k = flat_np(group, _KEY).view(np.uint64)
        order = pa.array(np.argsort(k, kind="stable"))
        out = pa.table(
            {
                c: flat(group, c).take(order)
                for c in group.column_names
                if c not in (_SHARD, _KEY)
            }
        )
        path = os.path.join(out_dirs[split_idx], f"shard-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # idempotent whole-shard overwrite
        return pa.table(
            {
                "split_idx": pa.array([split_idx], pa.int64()),
                "shard": pa.array([shard], pa.int64()),
                "rows": pa.array([len(out)], pa.int64()),
                "path": pa.array([path], pa.string()),
            }
        )

    manifest = (
        ds.map_batches(key_batch, batch_format="pyarrow")
        .groupby(_SHARD)
        .map_groups(write_shard, batch_format="pyarrow")
    )
    rows = manifest.take_all()  # ≤ splits × num_shards rows — bounded
    rows.sort(key=lambda r: (r["split_idx"], r["shard"]))
    return rows


def _manifest_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "shard": pa.array([r["shard"] for r in rows], pa.int64()),
            "rows": pa.array([r["rows"] for r in rows], pa.int64()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
        }
    )


def shuffle_export(
    ds,
    out_dir: str,
    *,
    id_col: str,
    seed: int = 0,
    num_shards: int = 64,
):
    """Globally shuffle ``ds`` by a seeded permutation of ``id_col``
    and write one parquet file per shard under ``out_dir``.

    Returns the export manifest as a pyarrow Table with one row per
    non-empty shard: ``shard:int64, rows:int64, path:string`` —
    bounded by ``num_shards``, never by the data.
    """
    rows = _keyed_export(
        ds,
        id_col=id_col,
        seed=seed,
        num_shards=num_shards,
        out_dirs=[out_dir],
        split_hi=None,
    )
    return _manifest_table(rows)


def split_export(
    ds,
    out_dir: str,
    *,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    num_shards: int = 64,
):
    """Deterministic disjoint train/val/test split + per-split shuffled
    export: ``fractions`` maps split name → fraction (must sum to 1).

    A row's split is decided by which fraction-weighted range of
    ``[0, 2⁶⁴)`` its ``splitmix64(id_hash ^ split_seed)`` falls in — a
    pure function of (id, seed), so membership is stable across runs,
    re-partitions and engine versions, and a given id NEVER leaks
    between splits (the leakage guarantee deduplication exists to
    protect). The split hash uses ``seed + 1`` so it is independent of
    the within-split shuffle order (same seed, different hash).

    All splits ride ONE list-packed exchange keyed
    ``(split, shard)`` — the input lineage executes exactly once (at
    100 TB a 3-way split reads the corpus once, not three times) — and
    split ``name``'s shards land in ``out_dir/<name>/``. Returns
    ``{name: manifest_table}`` with the same per-split manifest shape
    as :func:`shuffle_export`.
    """
    total = sum(fractions.values())
    if not np.isclose(total, 1.0):
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError("fractions must be positive")
    names = list(fractions)
    # cumulative uint64 range bounds; intermediates are clamped below
    # 2^64 (a float edge rounding to >= 2^64 would make the uint64 cast
    # undefined) and the last is forced to 2^64-1 so float rounding
    # can't orphan the top of the hash range
    edges = np.cumsum([fractions[n] for n in names])
    mid = np.minimum(edges[:-1] * float(2**64), float(2**64 - 2**12))
    hi = np.append(mid.astype(np.uint64), np.uint64(2**64 - 1))
    rows = _keyed_export(
        ds,
        id_col=id_col,
        seed=seed,
        num_shards=num_shards,
        out_dirs=[os.path.join(out_dir, n) for n in names],
        split_hi=hi,
    )
    return {
        name: _manifest_table([r for r in rows if r["split_idx"] == i])
        for i, name in enumerate(names)
    }


def mix_corpora(
    sources: dict,
    weights: dict[str, float],
    *,
    id_col: str,
    seed: int = 0,
    source_col: str = "source",
    counts: dict[str, int] | None = None,
):
    """Deterministic weighted mixture of multiple corpora — the
    data-mixing step of a pre-training pipeline (e.g. 70 % web,
    20 % code, 10 % reference).

    Downsampling-only semantics: the mixture total is the largest
    ``T = min_i(n_i / w_i)`` at which every source can supply its
    share without repeating rows; source *i* keeps ``w_i · T / n_i``
    of its rows by id-hash threshold (``systematic_sample``'s rule
    lifted to 64 bits) — membership is a pure function of (id, seed),
    so the mixture is reproducible and layout-stable, and proportions
    hold in expectation (binomial concentration around ``w_i · T``).

    Sources whose keep-rate is 1 pass through without hashing. Each
    row is tagged with its source name in ``source_col``; all sources
    must share a schema (the union requires it). ``n_i`` comes from
    ``counts`` when given (a pipeline that already knows its sizes —
    e.g. from an export manifest — pays nothing), else from
    ``Dataset.count()`` — metadata-cheap on parquet reads, one
    lineage execution on transformed inputs (materialize first if the
    lineage is expensive). Chain :func:`shuffle_export` (or call
    :func:`mix_export`) to interleave the mixture for training.

    Returns ``(mixed_dataset, plan)`` where plan maps source name →
    ``{rows, keep_rate, target}``.
    """
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have identical keys")
    total_w = sum(weights.values())
    if not np.isclose(total_w, 1.0):
        raise ValueError(f"weights must sum to 1, got {total_w}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    if counts is None:
        counts = {name: ds.count() for name, ds in sources.items()}
    elif set(counts) != set(sources):
        raise ValueError("counts and sources must have identical keys")
    t_total = min(counts[n] / weights[n] for n in sources)
    mix_seed = splitmix64(np.array([np.uint64(seed + 2)], np.uint64))[0]

    plan: dict[str, dict] = {}
    parts = []
    for name, ds in sources.items():
        target = weights[name] * t_total
        rate = min(1.0, target / counts[name]) if counts[name] else 0.0
        plan[name] = {"rows": counts[name], "keep_rate": rate, "target": int(target)}
        # float path: np.uint64(py_int >= 2^63) overflows C long; the
        # threshold is unused at rate 1, and below 1 the product fits
        thr = np.uint64(0) if rate >= 1.0 else np.uint64(rate * float(2**64 - 2048))

        def tag_and_thin(batch: pa.Table, _thr=thr, _rate=rate, _name=name) -> pa.Table:
            if _rate < 1.0:
                h = splitmix64(_id_hash64(batch, id_col) ^ mix_seed)
                batch = batch.filter(pa.array(h <= _thr))
            return batch.append_column(
                source_col, pa.array([_name] * len(batch), pa.string())
            )

        parts.append(ds.map_batches(tag_and_thin, batch_format="pyarrow"))
    mixed = parts[0]
    for p in parts[1:]:
        mixed = mixed.union(p)
    return mixed, plan


def mix_export(
    sources: dict,
    weights: dict[str, float],
    out_dir: str,
    *,
    id_col: str,
    seed: int = 0,
    num_shards: int = 64,
    source_col: str = "source",
    counts: dict[str, int] | None = None,
):
    """Fused weighted-mixture + interleaved shuffled export: tag + thin
    each source map-side (:func:`mix_corpora`), union, and run ONE
    list-packed payload all-to-all (:func:`shuffle_export`) — the whole
    pre-training data-mixing step with a single shuffle in the plan.
    Interleaving falls out of the shuffle: within every output shard,
    sources appear in seeded-permutation order, so a trainer streaming
    shards sees the mixture proportions locally, not source-by-source.

    Returns ``(manifest_table, plan)``.
    """
    mixed, plan = mix_corpora(
        sources, weights, id_col=id_col, seed=seed,
        source_col=source_col, counts=counts,
    )
    manifest = shuffle_export(
        mixed, out_dir, id_col=id_col, seed=seed, num_shards=num_shards
    )
    return manifest, plan


def read_export(out_dir: str, columns: list[str] | None = None):
    """Read an export back as a Dataset (shard files in shard order —
    Ray preserves per-file read order, so iteration order is the
    deterministic permutation)."""
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    return ray.data.read_parquet(files, columns=columns)
