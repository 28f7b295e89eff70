"""Sources layer — the Ray-native analogues of the reference's input
plumbing (SURVEY.md §2.1 S1-S4, S10).

| reference | here |
|---|---|
| file-open dispatch (plain/bz2/gz, ``changesetmd.py:566-583``) | Parquet shards under a root dir; one file = one partition |
| seq → zero-padded replication path (``changesetmd.py:290-300``) | :func:`partition_path` / :func:`discover_partitions` — deterministic id ↔ path |
| server ``state.yaml`` watermark (``changesetmd.py:337-343``)   | :func:`source_watermark` — max partition id present on the filesystem |
| fixed DDL (``queries.py:6-33``)                                | :data:`PAGES_SCHEMA` + :func:`validate_schema` at the read boundary |
| replication diff (apply seqs > last)                           | :func:`read_pages_incremental` — read only partitions missing from the checkpoint manifest |
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

# input_hint schema — the declared contract of the pages table
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_PART_RE = re.compile(r"^part-(\d+)\.parquet$")


def partition_path(root: str, partition_id: int) -> str:
    """Deterministic id → path (the seq → ``AAA/BBB/CCC.osm.gz`` rule,
    reference ``changesetmd.py:290-300``, flattened for Parquet)."""
    return os.path.join(root, f"part-{partition_id:05d}.parquet")


def discover_partitions(root: str) -> dict[str, str]:
    """Shard-id → path for every partition file under ``root`` (sorted).
    One file = one partition = one unit of resume."""
    out: dict[str, str] = {}
    for name in sorted(os.listdir(root)):
        if _PART_RE.match(name):
            out[os.path.splitext(name)[0]] = os.path.join(root, name)
    return out


def source_watermark(root: str) -> int | None:
    """Highest partition id present — the engine's ``last_server_sequence``
    (reference ``changesetmd.py:337-343``), from a filesystem listing."""
    ids = [int(m.group(1)) for n in os.listdir(root) if (m := _PART_RE.match(n))]
    return max(ids) if ids else None


def validate_schema(path: str, columns: list[str] | None = None) -> None:
    """Fail fast (before any task runs) if a shard's schema diverges
    from the declared contract for the requested columns."""
    actual = pq.read_schema(path)
    for name in columns or PAGES_SCHEMA.names:
        idx = actual.get_field_index(name)
        if idx < 0:
            raise ValueError(f"{path}: missing required column {name!r}")
        if PAGES_SCHEMA.get_field_index(name) < 0:
            continue  # extra (non-contract) column: presence-only check
        want = PAGES_SCHEMA.field(name)
        got = actual.field(idx)
        if got.type != want.type:
            raise ValueError(
                f"{path}: column {name!r} is {got.type}, contract says {want.type}"
            )


def read_pages(paths: list[str] | str, *, columns: list[str] | None = None,
               strict: bool = True, **read_kwargs):
    """Schema-validated column-pruned Dataset over page shards.

    ``paths`` is a shard list or a root directory. With ``strict``, the
    first shard's schema is checked against :data:`PAGES_SCHEMA` on the
    driver (cheap footer read) — the "create tables" DDL contract moved
    to the read boundary."""
    if isinstance(paths, str):
        paths = list(discover_partitions(paths).values())
    if not paths:
        raise ValueError("no partitions to read")
    if strict:
        validate_schema(paths[0], columns)
    return ray.data.read_parquet(paths, columns=columns, **read_kwargs)


def read_pages_incremental(root: str, manifest, *, columns: list[str] | None = None,
                           **read_kwargs):
    """The replication diff (reference §3.2): Dataset over only the
    partitions NOT yet recorded in the checkpoint ``manifest``; returns
    ``(dataset_or_None, pending_ids)``."""
    parts = discover_partitions(root)
    pending = manifest.pending(sorted(parts))
    if not pending:
        return None, []
    return read_pages([parts[p] for p in pending], columns=columns, **read_kwargs), pending
