"""WARC source tests (sources/warc.py): record parse round-trip, gzip
multi-member layout, HTTP header strip + de-chunking, WET conversion
records, corrupt-input failure modes, and the pages-schema contract
feeding the extract stage."""

import gzip
import os

import pyarrow as pa
import pytest

import ray
from changesetmd_ray.sources.warc import (
    PAGES_WARC_SCHEMA,
    http_response,
    iter_warc_records,
    read_warc_pages,
    read_wet_text,
    warc_record,
    write_warc,
)

DATE = "2024-03-01T12:00:00Z"


def _mk_warc(tmp_path, name="f.warc", gz=False, n=6):
    recs = [warc_record("warcinfo", None, DATE, b"software: test\r\n")]
    for i in range(n):
        body = f"<html><body>page {i}</body></html>".encode()
        recs.append(warc_record(
            "response", f"http://ex.com/p{i}", DATE,
            http_response(body, chunked=(i % 3 == 2)),
        ))
        if i % 2 == 0:
            recs.append(warc_record(
                "request", f"http://ex.com/p{i}", DATE,
                b"GET /p%d HTTP/1.1\r\n\r\n" % i))
    p = os.path.join(tmp_path, name + (".gz" if gz else ""))
    write_warc(str(p), recs)
    return str(p)


def test_iter_warc_records_roundtrip(tmp_path):
    p = _mk_warc(tmp_path)
    recs = list(iter_warc_records(p))
    types = [h["warc-type"] for h, _ in recs]
    assert types.count("response") == 6
    assert types.count("request") == 3
    assert types[0] == "warcinfo"
    h, payload = recs[1]
    assert h["warc-target-uri"] == "http://ex.com/p0"
    assert payload.startswith(b"HTTP/1.1 200 OK")


@pytest.mark.parametrize("gz", [False, True])
def test_read_warc_pages(tmp_path, ray_session, gz):
    p = _mk_warc(tmp_path, gz=gz)
    out = read_warc_pages([p]).take_all()
    assert len(out) == 6
    by_url = {r["url"]: r for r in out}
    for i in range(6):
        r = by_url[f"http://ex.com/p{i}"]
        # headers stripped, chunked bodies de-chunked: body is exact
        assert bytes(r["html"]) == f"<html><body>page {i}</body></html>".encode()
        assert r["warc_ts"].year == 2024


def test_read_wet_text(tmp_path, ray_session):
    recs = [warc_record("conversion", f"http://ex.com/p{i}", DATE,
                        f"extracted text {i} é".encode())
            for i in range(4)]
    p = os.path.join(tmp_path, "f.wet.warc.gz")
    write_warc(str(p), recs)
    out = read_wet_text([str(p)]).take_all()
    assert sorted(r["text"] for r in out) == [
        f"extracted text {i} é" for i in range(4)]


def test_multi_file_parallel_read(tmp_path, ray_session):
    paths = [_mk_warc(tmp_path, name=f"f{j}.warc", gz=j % 2 == 0, n=4)
             for j in range(3)]
    ds = read_warc_pages(paths, batch_rows=2)
    assert ds.count() == 12
    assert [f.name for f in ds.schema().base_schema] == [
        f.name for f in PAGES_WARC_SCHEMA]


def test_corrupt_inputs_fail_fast(tmp_path):
    bad1 = os.path.join(tmp_path, "bad1.warc")
    with open(bad1, "wb") as f:
        f.write(b"NOT A WARC\r\n\r\n")
    with pytest.raises(ValueError, match="WARC/1.x"):
        list(iter_warc_records(str(bad1)))

    bad2 = os.path.join(tmp_path, "bad2.warc")
    with open(bad2, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: 100\r\n\r\nshort")
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(str(bad2)))

    big = os.path.join(tmp_path, "big.warc")
    with open(big, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: 9999999999\r\n\r\n")
    with pytest.raises(ValueError, match="outside"):
        list(iter_warc_records(str(big), max_payload=1 << 20))


def test_warc_feeds_extract_stage(tmp_path, ray_session):
    """End-to-end: WARC file → pages dataset → the flagship's
    GeoExtractor consumes it (url+html are what it needs; byte-exact
    text passthrough is its own pinned invariant)."""
    from changesetmd_ray.stages.extract import GeoExtractor

    html = (b"<html><head><meta name=\"geo.position\" "
            b"content=\"52.5163;13.3777\"></head>"
            b"<body>Brandenburger Tor</body></html>")
    recs = [warc_record("response", "http://ex.com/geo", DATE,
                        http_response(html))]
    p = os.path.join(tmp_path, "geo.warc")
    write_warc(str(p), recs)

    ds = read_warc_pages([str(p)])

    def extract(batch: pa.Table) -> pa.Table:
        st = GeoExtractor()
        cols = {"url": batch["url"],
                "html": pa.compute.cast(batch["html"], pa.string()),
                "warc_ts": batch["warc_ts"],
                "text": pa.array([""] * len(batch), pa.string()),
                "lang": pa.array(["en"] * len(batch), pa.string())}
        return st(pa.table(cols))

    out = extract(pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]))
    assert out.num_rows == 1
