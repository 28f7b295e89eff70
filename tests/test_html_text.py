"""HTML→text extraction tests (stages/html_text.py) + the WARC →
pages → flagship end-to-end path."""

import os

import pyarrow as pa
import pytest

import ray
from changesetmd_ray.stages.html_text import (
    html_to_text,
    html_to_text_array,
    warc_to_pages,
)


def _x(html: str, **kw) -> str:
    return html_to_text_array(pa.array([html], pa.string()), **kw)[0].as_py()


def test_tags_scripts_styles_comments():
    html = ("<html><head><title>T</title><style>p{color:red}</style>"
            "<script>var x = '<p>not text</p>';</script></head>"
            "<body><!-- hidden --><p>Hello <b>world</b></p>"
            "<noscript>enable js</noscript></body></html>")
    assert _x(html) == "T\nHello world"


def test_block_tags_become_newlines_inline_do_not():
    html = "<div>one</div><div>two</div><p>a <span>b</span> c</p>"
    assert _x(html) == "one\ntwo\na b c"


def test_entities_common_and_fallback():
    assert _x("a &amp; b &lt;c&gt; &nbsp;d&#39;s") == "a & b <c> d's"
    # numeric + uncommon named entities take the html.unescape fallback
    assert _x("caf&#233; &eacute;clair &#x41;") == "café éclair A"


def test_whitespace_and_paragraphs():
    html = "<p>first   para</p>\n\n\n<p>second</p>"
    assert _x(html) == "first para\n\nsecond"
    assert _x(html, paragraphs=False) == "first para\nsecond"


def test_binary_input_and_nulls():
    arr = pa.array([b"<p>bin</p>", None], pa.binary())
    got = html_to_text_array(arr).to_pylist()
    assert got == ["bin", None]


def test_html_to_text_dataset(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "html": pa.array(["<p>alpha</p>", "<div>beta</div>"], pa.string()),
        }
    )
    out = html_to_text(ray.data.from_arrow(t)).take_all()
    assert {r["doc_id"]: r["text"] for r in out} == {1: "alpha", 2: "beta"}


def test_warc_to_flagship_end_to_end(tmp_path, ray_session):
    """The real-crawl path: WARC file → pages table (html/text/lang
    derived) → run_flagship → both resumable output tables."""
    from changesetmd_ray.pipelines.flagship import read_output, run_flagship
    from changesetmd_ray.sources.warc import (
        http_response,
        warc_record,
        write_warc,
    )

    recs = []
    for i in range(8):
        body = (
            f"<html><head><meta name=\"geo.position\" "
            f"content=\"{50 + i}.5;{8 + i}.25\"></head>"
            f"<body><p>The old harbor town number {i} keeps detailed "
            f"records of every winter storm and the repairs that "
            f"followed through the years.</p></body></html>"
        ).encode()
        recs.append(warc_record(
            "response", f"http://ex{i}.com/page", f"2024-03-0{i % 9 + 1}T12:00:00Z",
            http_response(body, chunked=(i % 3 == 0))))
    p = os.path.join(tmp_path, "crawl.warc.gz")
    write_warc(str(p), recs)

    pages = warc_to_pages([str(p)])
    rows = pages.take_all()
    assert len(rows) == 8
    assert all(r["lang"] == "en" for r in rows)
    assert "harbor town number 3" in [r for r in rows
                                      if r["url"] == "http://ex3.com/page"][0]["text"]

    # stage to columnar shards first — run_flagship's resume grain is
    # one parquet file per partition (the ingest → staging → pipeline
    # shape a real crawl run uses)
    staged = os.path.join(tmp_path, "staged")
    warc_to_pages([str(p)]).write_parquet(staged)
    files = sorted(
        os.path.join(staged, f) for f in os.listdir(staged)
        if f.endswith(".parquet"))
    out_dir = os.path.join(tmp_path, "flagship_out")
    run_flagship(files, str(out_dir), concurrency=(1, 2))
    data = read_output(str(out_dir)).take_all()
    assert len(data) == 8
    got = {r["url"]: r for r in data}
    # the geo.position meta tag became the page's point/bbox
    assert abs(got["http://ex0.com/page"]["min_lat"] - 50.5) < 1e-9
    assert abs(got["http://ex7.com/page"]["min_lon"] - 15.25) < 1e-9


def test_cli_warc_input(tmp_path, ray_session):
    """python -m changesetmd_ray --files crawl.warc.gz --out ...:
    WARC staging + the resumable flagship, flag-for-flag."""
    import json

    from changesetmd_ray.cli import main
    from changesetmd_ray.sources.warc import (
        http_response,
        warc_record,
        write_warc,
    )

    recs = []
    for i in range(4):
        body = (f"<html><head><meta name=\"geo.position\" "
                f"content=\"4{i}.5;7.25\"></head>"
                f"<body><p>harbor records {i}</p></body></html>").encode()
        recs.append(warc_record(
            "response", f"http://w{i}.com/p", "2024-03-01T12:00:00Z",
            http_response(body)))
    p = os.path.join(tmp_path, "crawl.warc.gz")
    write_warc(str(p), recs)

    out = os.path.join(tmp_path, "out")
    assert main(["--files", str(p), "--out", out]) == 0
    from changesetmd_ray.pipelines.flagship import read_output

    rows = read_output(out).take_all()
    assert len(rows) == 4
    assert {r["url"] for r in rows} == {f"http://w{i}.com/p" for i in range(4)}
    # rerun resumes (staging + manifest both idempotent)
    assert main(["--files", str(p), "--out", out]) == 0
    assert read_output(out).count() == 4
    # range flags are parquet-part concepts
    assert main(["--files", str(p), "--out", out, "--from-part", "1"]) == 2


def test_warc_to_pages_default_lang(tmp_path, ray_session):
    from changesetmd_ray.sources.warc import (
        http_response,
        warc_record,
        write_warc,
    )

    p = os.path.join(tmp_path, "one.warc")
    write_warc(str(p), [warc_record(
        "response", "http://x.com/", "2024-01-01T00:00:00Z",
        http_response(b"<p>hola mundo</p>"))])
    rows = warc_to_pages([str(p)], default_lang="es").take_all()
    assert rows[0]["lang"] == "es" and rows[0]["text"] == "hola mundo"


def test_entities_single_decode_semantics():
    """Double-encoded entities decode exactly once: the '&' an &amp;
    produces is data, not markup (the double-decode trap)."""
    assert _x("a &amp;lt; b") == "a &lt; b"
    assert _x("a &amp;amp; b") == "a &amp; b"
    assert _x("mixed &amp;lt; and real &eacute; here") == "mixed &lt; and real é here"
    assert _x("&amp;#65;") == "&#65;"
