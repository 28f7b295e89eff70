"""Cross-document line/paragraph dedup (text/linedup.py): both policy
modes, both regimes (broadcast and forced-distributed), pinned to a
pure-Python reference on a seeded corpus with planted boilerplate."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from changesetmd_ray.text.linedup import _norm, duplicated_units, line_dedup


def _ref_line_dedup(docs, *, sep="\n", min_count=2, min_chars=1,
                    normalize=True, keep="none"):
    """Driver-side reference: count normalized units corpus-wide, then
    rebuild each doc dropping over-threshold units (keep='first'
    retains the minimal (doc_id, seq) occurrence)."""
    from collections import defaultdict

    occ = defaultdict(list)  # norm_unit -> [(doc_id, seq)]
    for d in docs:
        for seq, u in enumerate(d["text"].split(sep)):
            nu = _norm(u, normalize)
            if len(nu) >= min_chars:
                occ[nu].append((d["doc_id"], seq))
    dup = {u: min(o) for u, o in occ.items() if len(o) >= min_count}
    out = []
    for d in docs:
        kept = []
        for seq, u in enumerate(d["text"].split(sep)):
            nu = _norm(u, normalize)
            if len(nu) >= min_chars and nu in dup:
                if keep == "first" and dup[nu] == (d["doc_id"], seq):
                    kept.append(u)
                continue
            kept.append(u)
        out.append({**d, "text": sep.join(kept)})
    return out


def _corpus(n_docs=40, seed=3):
    rng = np.random.default_rng(seed)
    boiler = [
        "Subscribe to our newsletter!",
        "© 2026 Example Corp. All rights reserved.",
        "Home | About | Contact",
    ]
    docs = []
    for i in range(n_docs):
        lines = [f"unique prose {i} alpha {rng.integers(1 << 30)}"]
        for b in boiler:
            if rng.random() < 0.6:
                lines.append(b)
        lines.append("")  # blank line: exempt, must survive
        lines.append(f"unique prose {i} beta {rng.integers(1 << 30)}")
        if rng.random() < 0.3:  # shared line with messy whitespace
            lines.append("  shared   CLOSING line ")
        else:
            lines.append("shared closing line")
        rng.shuffle(lines)
        docs.append({"doc_id": i, "text": "\n".join(lines),
                     "lang": "en" if i % 2 else "de"})
    return docs


def _rows(ds):
    return sorted(
        ({k: r[k] for k in ("doc_id", "text", "lang")} for r in ds.take_all()),
        key=lambda r: r["doc_id"],
    )


@pytest.mark.parametrize("keep", ["none", "first"])
@pytest.mark.parametrize("limit", [10**9, 0])  # broadcast / distributed
def test_line_dedup_matches_reference(ray_session, keep, limit):
    docs = _corpus()
    expected = sorted(_ref_line_dedup(docs, keep=keep),
                      key=lambda r: r["doc_id"])
    ds = ray.data.from_items(docs).repartition(7)
    out = line_dedup(ds, keep=keep, broadcast_limit=limit, num_buckets=8)
    assert _rows(out) == expected


def test_boilerplate_removed_unique_kept(ray_session):
    docs = _corpus()
    out = _rows(line_dedup(ray.data.from_items(docs), num_buckets=8))
    joined = "\n".join(r["text"] for r in out)
    assert "Subscribe to our newsletter!" not in joined
    assert "shared closing line" not in joined.lower()
    for r in out:
        assert f"unique prose {r['doc_id']} alpha" in r["text"]
    # blank lines are exempt: every doc planted one and keeps it
    assert all("\n\n" in r["text"] or r["text"].startswith("\n")
               or r["text"].endswith("\n") for r in out)


def test_keep_first_retains_exactly_one(ray_session):
    docs = [
        {"doc_id": 2, "text": "boiler\nx2"},
        {"doc_id": 0, "text": "x0\nboiler"},
        {"doc_id": 1, "text": "boiler\nx1"},
    ]
    out = _rows2(line_dedup(ray.data.from_items(docs), keep="first",
                            num_buckets=8))
    # global first occurrence = (doc_id=0, seq=1)
    assert out == [
        {"doc_id": 0, "text": "x0\nboiler"},
        {"doc_id": 1, "text": "x1"},
        {"doc_id": 2, "text": "x2"},
    ]


def _rows2(ds):
    return sorted(
        ({k: r[k] for k in ("doc_id", "text")} for r in ds.take_all()),
        key=lambda r: r["doc_id"],
    )


def test_normalization_and_exemption(ray_session):
    docs = [
        {"doc_id": 0, "text": "  Foo   BAR \n\nkeep zero"},
        {"doc_id": 1, "text": "foo bar\n\nkeep one"},
    ]
    out = _rows2(line_dedup(ray.data.from_items(docs), num_buckets=8))
    # whitespace/case variants hash equal -> both dropped; blank exempt
    assert out == [
        {"doc_id": 0, "text": "\nkeep zero"},
        {"doc_id": 1, "text": "\nkeep one"},
    ]
    # normalize=False: the variants differ, nothing is duplicated
    out2 = _rows2(line_dedup(ray.data.from_items(docs), normalize=False,
                             num_buckets=8))
    assert [r["text"] for r in out2] == [d["text"] for d in docs]


def test_min_count_threshold(ray_session):
    docs = [{"doc_id": i, "text": "twice\nthrice"} for i in range(2)]
    docs.append({"doc_id": 2, "text": "thrice\nsolo"})
    out = _rows2(line_dedup(ray.data.from_items(docs), min_count=3,
                            num_buckets=8))
    # only 'thrice' (3 occurrences) crosses min_count=3
    assert out == [
        {"doc_id": 0, "text": "twice"},
        {"doc_id": 1, "text": "twice"},
        {"doc_id": 2, "text": "solo"},
    ]


def test_stats_and_drop_empty(ray_session):
    docs = [
        {"doc_id": 0, "text": "dup"},
        {"doc_id": 1, "text": "dup"},
        {"doc_id": 2, "text": "solo\ndup"},
    ]
    out = line_dedup(ray.data.from_items(docs), with_stats=True,
                     drop_empty=True, num_buckets=8).take_all()
    rows = sorted(out, key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [2]  # 0/1 emptied and dropped
    assert rows[0]["n_units"] == 2 and rows[0]["n_dropped"] == 1


def test_duplicated_units_counts(ray_session):
    docs = [
        {"doc_id": 0, "text": "a\nb\na"},   # 'a' twice within one doc
        {"doc_id": 1, "text": "b\nc"},
    ]
    rows = duplicated_units(
        ray.data.from_items(docs), num_buckets=8).take_all()
    got = {r["n"]: (r["min_id"], r["min_seq"]) for r in rows}
    # 'a': 2 occurrences (0,0); 'b': 2 occurrences, first at (0,1)
    assert len(rows) == 2 and got[2] in {(0, 0), (0, 1)}
    by_first = sorted((r["min_id"], r["min_seq"]) for r in rows)
    assert by_first == [(0, 0), (0, 1)]
