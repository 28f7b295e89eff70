"""OSM changeset XML source — the reference's literal input format.

The reference parses changeset dumps (`changesets-*.osm`, optionally
bz2-compressed) with lxml iterparse into two Postgres tables
(`changesetmd.py:203-271`: osm_changeset + osm_changeset_comment).
This module is the Ray-native counterpart, dependency-free (stdlib
``xml.etree`` iterparse + ``bz2``):

- :func:`read_changesets_xml` / :func:`read_changeset_comments_xml` —
  Datasets over one table each. One FILE = one partition (the
  replication-sequence grain); each file streams through iterparse
  with bounded memory (processed elements cleared), yielding Arrow
  batches of ``batch_rows`` rows — the generator-UDF form of S5.
- :func:`load_changesets_xml` — the reference's bulk-load entry point
  shape: ONE parse pass per file writing BOTH parquet tables
  (tmp+rename per (file, table) → idempotent re-runs), so the XML
  decode cost is paid once, like the reference's single iterparse
  cursor feeding two insert lists. Returns per-file counts.

Semantics pinned to the reference:
- attributes may be absent (open/num_changes/uid/bbox) → nulls;
  ``tags`` is a ``map<string,string>`` of the <tag k v> children;
- comments come from <discussion><comment> children with their
  byte-identical <text> payloads;
- ``contributors`` is the reference's uid allow-list filter
  (string-compared, `changesetmd.py:215-219`).
"""

from __future__ import annotations

import bz2
import os
from datetime import datetime

import pyarrow as pa

CHANGESET_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("user_id", pa.int64()),
        ("created_at", pa.timestamp("us")),
        ("closed_at", pa.timestamp("us")),
        ("open", pa.bool_()),
        ("num_changes", pa.int64()),
        ("user_name", pa.string()),
        ("min_lat", pa.float64()),
        ("max_lat", pa.float64()),
        ("min_lon", pa.float64()),
        ("max_lon", pa.float64()),
        ("tags", pa.map_(pa.string(), pa.string())),
    ]
)

COMMENT_SCHEMA = pa.schema(
    [
        ("comment_changeset_id", pa.int64()),
        ("comment_user_id", pa.int64()),
        ("comment_user_name", pa.string()),
        ("comment_date", pa.timestamp("us")),
        ("comment_text", pa.string()),
    ]
)


def _open_xml(path: str):
    return bz2.open(path, "rb") if path.endswith(".bz2") else open(path, "rb")


def _ts(v: str | None):
    if not v:
        return None
    return datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ")


def _i(v: str | None):
    return int(v) if v not in (None, "") else None


def _f(v: str | None):
    return float(v) if v not in (None, "") else None


def iter_changeset_elements(path: str, contributors: set[str] | None = None):
    """Stream (changeset_row, comment_rows) tuples from one dump file
    with bounded memory: every processed element is cleared and the
    root's children dropped, so a planet-sized file never accumulates
    a tree (the reference clears lxml elements the same way,
    `changesetmd.py:216-219`)."""
    import xml.etree.ElementTree as ET

    with _open_xml(path) as f:
        context = ET.iterparse(f, events=("start", "end"))
        _, root = next(context)  # the <osm> element, from its start event
        for event, elem in context:
            if event != "end" or elem.tag != "changeset":
                continue
            a = elem.attrib
            if contributors is not None and a.get("uid") not in contributors:
                elem.clear()
                root.clear()
                continue
            tags = [
                (t.attrib["k"], t.attrib.get("v"))
                for t in elem.iter("tag")
            ]
            comments = []
            for disc in elem.iter("discussion"):
                for c in disc.iter("comment"):
                    text = None
                    for tx in c.iter("text"):
                        text = tx.text
                    comments.append(
                        {
                            "comment_changeset_id": _i(a.get("id")),
                            "comment_user_id": _i(c.attrib.get("uid")),
                            "comment_user_name": c.attrib.get("user"),
                            "comment_date": _ts(c.attrib.get("date")),
                            "comment_text": text,
                        }
                    )
            row = {
                "id": _i(a.get("id")),
                "user_id": _i(a.get("uid")),
                "created_at": _ts(a.get("created_at")),
                "closed_at": _ts(a.get("closed_at")),
                "open": None if a.get("open") is None else a.get("open") == "true",
                "num_changes": _i(a.get("num_changes")),
                "user_name": a.get("user"),
                "min_lat": _f(a.get("min_lat")),
                "max_lat": _f(a.get("max_lat")),
                "min_lon": _f(a.get("min_lon")),
                "max_lon": _f(a.get("max_lon")),
                "tags": tags,
            }
            yield row, comments
            elem.clear()
            root.clear()


def _changeset_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in CHANGESET_SCHEMA.names}
    return pa.table(
        {n: pa.array(cols[n], CHANGESET_SCHEMA.field(n).type) for n in CHANGESET_SCHEMA.names}
    )


def _comment_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in COMMENT_SCHEMA.names}
    return pa.table(
        {n: pa.array(cols[n], COMMENT_SCHEMA.field(n).type) for n in COMMENT_SCHEMA.names}
    )


def _paths_ds(paths: list[str]):
    """One single-row block PER path so each dump file parses in its
    own Ray task (``from_arrow`` with one table = ONE block = serial
    parse no matter the cluster size; a list of tables = one block
    each, so a 10^5-file dump fans out with backpressure)."""
    import ray.data

    return ray.data.from_arrow(
        [pa.table({"path": pa.array([p], pa.string())}) for p in sorted(paths)]
    )


def read_changesets_xml(paths: list[str], *, contributors: list[str] | None = None,
                        batch_rows: int = 4096):
    """Dataset over the changeset (parent) table of one or more dump
    files. One file = one read task; batches stream out every
    ``batch_rows`` changesets (generator UDF — the executor applies
    backpressure between yields)."""
    import ray.data

    allow = set(contributors) if contributors else None

    def parse(batch: pa.Table):
        for path in batch["path"].to_pylist():
            buf: list[dict] = []
            for row, _ in iter_changeset_elements(path, allow):
                buf.append(row)
                if len(buf) >= batch_rows:
                    yield _changeset_table(buf)
                    buf = []
            if buf:
                yield _changeset_table(buf)

    return _paths_ds(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def read_changeset_comments_xml(paths: list[str], *,
                                contributors: list[str] | None = None,
                                batch_rows: int = 4096):
    """Dataset over the discussion-comment (child) table — the
    reference's osm_changeset_comment."""
    import ray.data

    allow = set(contributors) if contributors else None

    def parse(batch: pa.Table):
        for path in batch["path"].to_pylist():
            buf: list[dict] = []
            for _, comments in iter_changeset_elements(path, allow):
                buf.extend(comments)
                if len(buf) >= batch_rows:
                    yield _comment_table(buf)
                    buf = []
            if buf:
                yield _comment_table(buf)

    return _paths_ds(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def load_changesets_xml(paths: list[str], out_dir: str, *,
                        contributors: list[str] | None = None,
                        batch_rows: int = 100_000):
    """Bulk load: one parse pass per file writes BOTH parquet tables
    (``out_dir/changesets/<stem>.parquet`` + ``out_dir/comments/...``)
    — the reference's `-f --create` entry point (`changesetmd.py:
    494-627`) with file-grain idempotency (tmp+rename overwrite).
    Runs as a Dataset of per-file load tasks so a 10^5-file dump
    streams with backpressure; returns the per-file count table
    (file, changesets, comments) — bounded by the file count."""
    import ray.data

    allow = set(contributors) if contributors else None

    def _stem(path: str) -> str:
        s = os.path.basename(path)
        for ext in (".bz2", ".osm", ".xml"):
            if s.endswith(ext):
                s = s[: -len(ext)]
        return s

    # two inputs collapsing onto one output stem (x.osm + x.osm.bz2)
    # would have parallel tasks racing on the same <stem>.parquet.tmp —
    # corrupting the file and double-counting rows. Refuse up front
    # (mirrors run_flagship's duplicate-shard-basename guard).
    stems: dict[str, str] = {}
    for p in paths:
        s = _stem(p)
        if s in stems:
            raise ValueError(
                f"inputs {stems[s]!r} and {p!r} both write {s}.parquet; "
                "drop one copy or rename it"
            )
        stems[s] = p
    cs_dir = os.path.join(out_dir, "changesets")
    cm_dir = os.path.join(out_dir, "comments")
    os.makedirs(cs_dir, exist_ok=True)
    os.makedirs(cm_dir, exist_ok=True)

    def load_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = {"file": [], "changesets": [], "comments": []}
        for path in batch["path"].to_pylist():
            stem = _stem(path)
            cs_rows: list[dict] = []
            cm_rows: list[dict] = []
            cs_parts: list[pa.Table] = []
            cm_parts: list[pa.Table] = []
            for row, comments in iter_changeset_elements(path, allow):
                cs_rows.append(row)
                cm_rows.extend(comments)
                if len(cs_rows) >= batch_rows:
                    cs_parts.append(_changeset_table(cs_rows))
                    cs_rows = []
                if len(cm_rows) >= batch_rows:
                    cm_parts.append(_comment_table(cm_rows))
                    cm_rows = []
            cs_parts.append(_changeset_table(cs_rows))
            cm_parts.append(_comment_table(cm_rows))
            cs_tbl = pa.concat_tables(cs_parts)
            cm_tbl = pa.concat_tables(cm_parts)
            for tbl, d in ((cs_tbl, cs_dir), (cm_tbl, cm_dir)):
                tmp = os.path.join(d, stem + ".parquet.tmp")
                pq.write_table(tbl, tmp)
                os.replace(tmp, os.path.join(d, stem + ".parquet"))
            out["file"].append(stem)
            out["changesets"].append(len(cs_tbl))
            out["comments"].append(len(cm_tbl))
        return pa.table(
            {
                "file": pa.array(out["file"], pa.string()),
                "changesets": pa.array(out["changesets"], pa.int64()),
                "comments": pa.array(out["comments"], pa.int64()),
            }
        )

    counts = (
        _paths_ds(paths)
        .map_batches(load_one, batch_format="pyarrow", batch_size=1)
        .take_all()
    )  # bounded by the input file count
    # take_all block order is not deterministic across parallel tasks
    # (preserve_order is off) — sort so the manifest is stable run-to-run
    counts.sort(key=lambda r: r["file"])
    return pa.table(
        {
            "file": pa.array([r["file"] for r in counts], pa.string()),
            "changesets": pa.array([r["changesets"] for r in counts], pa.int64()),
            "comments": pa.array([r["comments"] for r in counts], pa.int64()),
        }
    )
