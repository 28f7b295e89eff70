"""Text normalization stage (text/normalize.py): NFC cross-checked
against DuckDB, control/zero-width stripping, line/space collapsing,
and the curation wiring."""
import unicodedata

import pyarrow as pa
import ray

from changesetmd_ray.text.normalize import normalize_batch, normalize_text


def test_nfc_matches_duckdb():
    import duckdb

    texts = [
        "café und münchen",      # NFD combining marks
        "already café münchen",
        "ﬁne ﬂow ﬁ",                    # ligatures (NFC keeps them)
        "mixed à́ marks",
    ]
    got = normalize_batch(
        pa.array(texts), strip_control=False, collapse_lines=False,
        trim=False).to_pylist()
    for t, g in zip(texts, got):
        (exp,) = duckdb.sql("select nfc_normalize(?)", params=[t]).fetchone()
        assert g == exp == unicodedata.normalize("NFC", t)


def test_control_and_zero_width_stripped():
    t = "a\x00b​c‏d﻿e\x7ff keep\tthis\nand\r\nthat"
    (got,) = normalize_batch(pa.array([t]), collapse_lines=False,
                             trim=False).to_pylist()
    assert got == "abcdef keep\tthis\nand\r\nthat"  # \t \n \r survive


def test_collapse_lines_and_spaces():
    t = "para one\n\n\n\n\npara two   with\t\tgaps"
    (got,) = normalize_batch(pa.array([t]), collapse_spaces=True).to_pylist()
    assert got == "para one\n\npara two with gaps"
    (kept,) = normalize_batch(pa.array([t])).to_pylist()
    assert "   with" in kept  # collapse_spaces off by default


def test_trim_and_nulls():
    got = normalize_batch(pa.array(["  x  ", None, ""])).to_pylist()
    assert got == ["x", None, ""]


def test_normalize_text_dataset(ray_session):
    docs = [{"doc_id": 0, "text": "café​  \n\n\n\nx  "},
            {"doc_id": 1, "text": "plain"}]
    out = sorted(normalize_text(ray.data.from_items(docs)).take_all(),
                 key=lambda r: r["doc_id"])
    assert out[0]["text"] == "café  \n\nx"
    assert out[1]["text"] == "plain"


def test_curation_normalize_stage(ray_session):
    """normalize_text=True makes NFD/NFC variants exact duplicates, so
    exact_dedup collapses them."""
    from changesetmd_ray.pipelines.curation import CurationConfig, curate

    base = ("the study found that analysis of the data shows clear results "
            "and the method was described in café detail carefully")
    docs = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("café", "café")},
    ]
    cfg = CurationConfig(
        normalize_text=True, quality_rule=False, repetition=False,
        minhash=False, pii_scrub=False, langs=None,
    )
    res = curate(ray.data.from_items(docs), config=cfg, report=True)
    assert [r["doc_id"] for r in res.dataset.take_all()] == [0]
    assert "normalize" in res.report
    # without normalization the NFD/NFC variants hash apart
    cfg2 = CurationConfig(
        quality_rule=False, repetition=False, minhash=False,
        pii_scrub=False, langs=None,
    )
    res2 = curate(ray.data.from_items(docs), config=cfg2)
    assert len(res2.dataset.take_all()) == 2
