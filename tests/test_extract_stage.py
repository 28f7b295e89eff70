"""GeoExtractor buffer-scan edge cases: boundary-straddle re-scan and
large_binary (int64 offsets) inputs."""

import numpy as np
import pyarrow as pa

from changesetmd_ray.stages.extract import GeoExtractor


def _table(htmls, html_type=pa.binary()):
    n = len(htmls)
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)]),
            "warc_ts": pa.array(
                np.arange(n).astype("datetime64[us]"), pa.timestamp("us")
            ),
            "html": pa.array(htmls, html_type),
            "text": pa.array(["t"] * n),
            "lang": pa.array(["en"] * n),
        }
    )


def _points(out, i):
    return {(p["lon"], p["lat"]) for p in out["points"][i].as_py()}


def test_straddle_match_triggers_exact_rescan():
    """A match spanning two documents' boundary must be rejected AND
    must not hide matches in either document (the concatenated-buffer
    finditer consumes the straddled span; the stage re-scans per row)."""
    # doc0 ends with a prefix of a data-lat/lon pair whose data-lon
    # lands in doc1 — the concatenated scan sees a full (straddling)
    # match; doc1's own real match must still be found
    doc0 = b'<p>x</p>data-lat="1.0" data-lon="2'
    doc1 = b'.0" data-lat="9.0" data-lon="8.0"<p>tail</p>'
    doc2 = b'data-lat="5.5" data-lon="6.5"'
    out = GeoExtractor()(_table([doc0, doc1, doc2]))
    assert _points(out, 0) == set()  # straddle rejected, no points
    assert _points(out, 1) == {(8.0, 9.0)}
    assert _points(out, 2) == {(6.5, 5.5)}
    assert out["n_points"].to_pylist() == [0, 1, 1]


def test_large_binary_offsets_parse_correctly():
    """large_binary uses int64 offsets — reading them as int32 would
    garble the row mapping."""
    htmls = [
        b'<meta name="geo.position" content="10.5;20.5">',
        b"<p>no geo</p>",
        b'data-lat="-3.25" data-lon="7.75"',
    ]
    small = GeoExtractor()(_table(htmls, pa.binary()))
    large = GeoExtractor()(_table(htmls, pa.large_binary()))
    assert small["points"].to_pylist() == large["points"].to_pylist()
    assert _points(large, 0) == {(20.5, 10.5)}
    assert _points(large, 2) == {(7.75, -3.25)}
    assert large["n_points"].to_pylist() == [1, 0, 1]


def test_sliced_column_offsets_respected():
    """A sliced Arrow column (non-zero offset) must map matches to the
    right rows."""
    htmls = [b'data-lat="1.0" data-lon="1.5"', b'data-lat="2.0" data-lon="2.5"',
             b'data-lat="3.0" data-lon="3.5"']
    t = _table(htmls).slice(1, 2)
    out = GeoExtractor()(t)
    assert _points(out, 0) == {(2.5, 2.0)}
    assert _points(out, 1) == {(3.5, 3.0)}
