"""WARC source — the real Common-Crawl container behind the
input_hint pages table.

Common Crawl ships crawls as WARC/1.0 files (ISO 28500): a sequence of
records, each a header block (``WARC/1.0\\r\\n`` + ``Name: value``
lines + blank line) followed by ``Content-Length`` payload bytes and a
``\\r\\n\\r\\n`` trailer. ``response`` records carry a full HTTP
response (status line + headers + body); ``conversion`` records (WET)
carry extracted text. CC compresses one gzip MEMBER per record —
stdlib ``gzip`` streams multi-member files transparently, so the same
parser covers ``.warc`` and ``.warc.gz``.

This module parses both record types into the engine's pages schema
(``url, warc_ts, html``) with the same generator-UDF shape as the OSM
XML source (one FILE = one read task, Arrow batches every
``batch_rows`` records, executor backpressure between yields):

- :func:`iter_warc_records` — streaming record parser, bounded memory
  (one record at a time; a ``max_payload`` guard fails fast on
  corrupt/hostile length fields instead of ballooning the heap);
- :func:`read_warc_pages` — Dataset of ``(url, warc_ts, html)`` from
  ``response``/``resource`` records (HTTP headers stripped — the body
  is the ``html`` payload; chunked transfer-encoding de-chunked);
- :func:`read_wet_text` — Dataset of ``(url, warc_ts, text)`` from
  ``conversion`` records (WET extracts, utf-8 with replacement).

Writing side: :func:`warc_record` / :func:`write_warc` build spec-valid
files — used by the tests for round-trip parity and available as a
fixture generator (no network in this sandbox, so real crawl files
can't be fetched; the format logic is what's exercised).
"""

from __future__ import annotations

import gzip
import io
import os
from datetime import datetime

import pyarrow as pa

PAGES_WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)

_CRLF = b"\r\n"


def _open_warc(path: str):
    return gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")


def _warc_ts(v: str | None):
    """WARC-Date is ISO-8601 Zulu (seconds or with fraction)."""
    if not v:
        return None
    v = v.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(v, fmt)
        except ValueError:
            continue
    return None


def _read_headers(f) -> dict[str, str] | None:
    """One CRLF-terminated header block → {lower-name: value}; None at
    EOF. Skips inter-record blank lines (the record trailer)."""
    line = f.readline()
    while line in (_CRLF, b"\n"):
        line = f.readline()
    if not line:
        return None
    headers: dict[str, str] = {}
    first = line.rstrip(b"\r\n")
    headers["__version__"] = first.decode("ascii", "replace")
    while True:
        line = f.readline()
        if not line:
            raise ValueError("truncated WARC header block")
        if line in (_CRLF, b"\n"):
            return headers
        if line[0] in b" \t":  # obs-fold continuation
            continue
        name, _, value = line.rstrip(b"\r\n").partition(b":")
        headers[name.strip().lower().decode("ascii", "replace")] = (
            value.strip().decode("utf-8", "replace"))


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer-encoding (hex-size lines)."""
    out = io.BytesIO()
    buf = io.BytesIO(body)
    while True:
        size_line = buf.readline()
        if not size_line:
            break
        try:
            size = int(size_line.split(b";", 1)[0].strip() or b"0", 16)
        except ValueError:
            break
        if size == 0:
            break
        out.write(buf.read(size))
        buf.readline()  # chunk trailer CRLF
    return out.getvalue()


def _strip_http(payload: bytes) -> bytes:
    """HTTP response → body (headers cut at the first blank line;
    chunked bodies de-chunked). Non-HTTP payloads pass through."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    off = 4
    if sep < 0:
        sep = payload.find(b"\n\n")
        off = 2
        if sep < 0:
            return b""
    head = payload[:sep].lower()
    body = payload[sep + off:]
    if b"transfer-encoding:" in head and b"chunked" in head:
        body = _dechunk(body)
    return body


def iter_warc_records(path: str, *, max_payload: int = 1 << 30):
    """Yield ``(headers, payload)`` per record, streaming. ``headers``
    is the lower-cased WARC header dict; ``payload`` the raw
    Content-Length bytes."""
    with _open_warc(path) as f:
        while True:
            headers = _read_headers(f)
            if headers is None:
                return
            if not headers["__version__"].startswith("WARC/"):
                raise ValueError(
                    f"{path}: expected WARC/1.x record header, got "
                    f"{headers['__version__']!r}")
            try:
                length = int(headers.get("content-length", ""))
            except ValueError as e:
                raise ValueError(f"{path}: missing/invalid Content-Length") from e
            if not 0 <= length <= max_payload:
                raise ValueError(
                    f"{path}: Content-Length {length} outside [0, {max_payload}]")
            payload = f.read(length)
            if len(payload) != length:
                raise ValueError(f"{path}: truncated record payload")
            yield headers, payload


def _paths_ds(paths: list[str]):
    import ray.data

    if not paths:
        raise ValueError("no WARC paths given")
    return ray.data.from_items([{"path": p} for p in paths])


def read_warc_pages(paths: list[str], *, batch_rows: int = 256,
                    max_payload: int = 1 << 30):
    """Dataset ``(url, warc_ts, html)`` over ``response``/``resource``
    records — the input_hint pages table, minus the derived columns the
    extract stage adds. One file = one read task."""

    def parse(batch: pa.Table):
        for path in batch["path"].to_pylist():
            rows: list[tuple] = []
            for h, payload in iter_warc_records(path, max_payload=max_payload):
                if h.get("warc-type") not in ("response", "resource"):
                    continue
                rows.append((h.get("warc-target-uri"),
                             _warc_ts(h.get("warc-date")),
                             _strip_http(payload)))
                if len(rows) >= batch_rows:
                    yield _pages_table(rows)
                    rows = []
            if rows:
                yield _pages_table(rows)

    return _paths_ds(paths).map_batches(parse, batch_format="pyarrow",
                                        batch_size=1)


def _pages_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )


def read_wet_text(paths: list[str], *, batch_rows: int = 256,
                  max_payload: int = 1 << 30):
    """Dataset ``(url, warc_ts, text)`` over WET ``conversion``
    records."""

    def parse(batch: pa.Table):
        for path in batch["path"].to_pylist():
            rows: list[tuple] = []
            for h, payload in iter_warc_records(path, max_payload=max_payload):
                if h.get("warc-type") != "conversion":
                    continue
                rows.append((h.get("warc-target-uri"),
                             _warc_ts(h.get("warc-date")),
                             payload.decode("utf-8", "replace")))
                if len(rows) >= batch_rows:
                    yield _wet_table(rows)
                    rows = []
            if rows:
                yield _wet_table(rows)

    return _paths_ds(paths).map_batches(parse, batch_format="pyarrow",
                                        batch_size=1)


def _wet_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


# ------------------------------------------------------------- writing


def warc_record(warc_type: str, url: str | None, date: str,
                payload: bytes, *, extra: dict | None = None) -> bytes:
    """One spec-valid WARC/1.0 record (header block + payload +
    trailer)."""
    lines = [b"WARC/1.0",
             f"WARC-Type: {warc_type}".encode()]
    if url is not None:
        lines.append(f"WARC-Target-URI: {url}".encode())
    lines.append(f"WARC-Date: {date}".encode())
    for k, v in (extra or {}).items():
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _CRLF * 2 + payload + _CRLF * 2


def http_response(body: bytes, *, content_type: str = "text/html",
                  chunked: bool = False) -> bytes:
    """Minimal HTTP/1.1 200 wrapper for ``response`` record payloads."""
    if chunked:
        wire = (f"{len(body):x}".encode() + _CRLF + body + _CRLF
                + b"0" + _CRLF * 2)
        head = (b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type.encode()
                + b"\r\nTransfer-Encoding: chunked\r\n\r\n")
        return head + wire
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type.encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)


def write_warc(path: str, records: list[bytes]) -> None:
    """Write records to ``path``; ``.gz`` → one gzip member per record
    (the Common-Crawl layout, seekable per record)."""
    tmp = path + ".tmp"
    if path.endswith(".gz"):
        with open(tmp, "wb") as f:
            for r in records:
                f.write(gzip.compress(r))
    else:
        with open(tmp, "wb") as f:
            for r in records:
                f.write(r)
    os.replace(tmp, path)
