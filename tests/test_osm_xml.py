"""OSM changeset XML source vs the reference's OWN test fixtures
(read-only inputs from /root/reference/test) — the literal-input
parity check: entity counts, attribute/tag/comment content, the uid
allow-list filter, bz2 transparency, and the one-pass two-table bulk
load (sources/osm_xml.py; reference changesetmd.py:203-271)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray

FIXTURE = "/root/reference/test/changesets_testfile.osm"
TAGS_FIXTURE = "/root/reference/test/planet/changesets-test-tags.osm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixtures not present"
)


def _all(ds) -> pa.Table:
    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def test_fixture_counts_and_schema(ray_session):
    from changesetmd_ray.sources.osm_xml import (
        CHANGESET_SCHEMA,
        read_changeset_comments_xml,
        read_changesets_xml,
    )

    cs = _all(read_changesets_xml([FIXTURE]))
    assert len(cs) == 1264  # grep -c '<changeset ' over the fixture
    assert cs.schema.equals(CHANGESET_SCHEMA)
    n_tags = sum(len(t) if t is not None else 0 for t in cs["tags"].to_pylist())
    assert n_tags == 6836  # grep -c '<tag '
    cm = _all(read_changeset_comments_xml([FIXTURE]))
    assert len(cm) == 40  # grep -c '<comment '


def test_known_changeset_attributes_and_comment_text(ray_session):
    from changesetmd_ray.sources.osm_xml import (
        read_changeset_comments_xml,
        read_changesets_xml,
    )

    cs = _all(read_changesets_xml([FIXTURE]))
    rows = {r["id"]: r for r in cs.to_pylist()}
    c = rows[15610060]  # the fixture's first changeset
    assert c["user_name"] == "Toliman" and c["user_id"] == 204045
    assert c["open"] is False and c["num_changes"] == 21
    assert c["min_lat"] == 51.6732511 and c["max_lon"] == 6.9989682
    assert dict(c["tags"])["created_by"] == "Potlatch 2"
    assert str(c["created_at"]) == "2013-04-04 16:39:12"

    cm = _all(read_changeset_comments_xml([FIXTURE])).to_pylist()
    mine = [r for r in cm if r["comment_changeset_id"] == 15610060]
    assert len(mine) == 2
    first = min(mine, key=lambda r: r["comment_date"])
    assert first["comment_user_name"] == "Reinhard12"
    # byte-identical text payload (the per-row invariant), unicode incl.
    assert first["comment_text"].startswith("Hallo Toliman,\n")
    assert "gelöscht" in first["comment_text"]


def test_bz2_transparent_and_contributor_filter(ray_session):
    from changesetmd_ray.sources.osm_xml import read_changesets_xml

    plain = _all(read_changesets_xml([FIXTURE])).sort_by("id")
    bz = _all(read_changesets_xml([FIXTURE + ".bz2"])).sort_by("id")
    assert plain.equals(bz)

    # the reference's uid allow-list (changesetmd.py:215-219)
    only = _all(read_changesets_xml([FIXTURE], contributors=["204045"]))
    assert len(only) >= 1
    assert set(only["user_id"].to_pylist()) == {204045}


def test_bulk_load_one_pass_two_tables(ray_session, tmp_path):
    import ray.data

    from changesetmd_ray.sources.osm_xml import load_changesets_xml

    out = str(tmp_path / "osm_out")
    counts = load_changesets_xml([FIXTURE, TAGS_FIXTURE], out)
    got = dict(zip(counts["file"].to_pylist(),
                   zip(counts["changesets"].to_pylist(),
                       counts["comments"].to_pylist())))
    assert got["changesets_testfile"] == (1264, 40)
    assert got["changesets-test-tags"] == (8, 7)
    assert ray.data.read_parquet(os.path.join(out, "changesets")).count() == 1272
    assert ray.data.read_parquet(os.path.join(out, "comments")).count() == 47
    # idempotent re-run (tmp+rename overwrite)
    counts2 = load_changesets_xml([FIXTURE, TAGS_FIXTURE], out)
    assert counts.equals(counts2)
    assert ray.data.read_parquet(os.path.join(out, "changesets")).count() == 1272
    # x.osm + x.osm.bz2 collapse onto one output stem: parallel tasks
    # would race on the same .tmp file — must refuse up front
    import pytest

    with pytest.raises(ValueError, match="both write"):
        load_changesets_xml([FIXTURE, FIXTURE + ".bz2"], out)


def test_parent_child_join_over_loaded_tables(ray_session, tmp_path):
    """The reference's documented query pattern (README.md:208-214):
    changesets joined to their comments — run through the engine's own
    hash join over the freshly loaded parquet tables."""
    import ray.data

    from changesetmd_ray.joins.equi import hash_join
    from changesetmd_ray.sources.osm_xml import load_changesets_xml

    out = str(tmp_path / "osm_out2")
    load_changesets_xml([FIXTURE], out)
    cs = ray.data.read_parquet(os.path.join(out, "changesets"),
                               columns=["id", "user_name"])
    cm = ray.data.read_parquet(os.path.join(out, "comments"),
                               columns=["comment_changeset_id", "comment_user_name"])
    j = hash_join(
        cm, cs,
        left_on="comment_changeset_id", right_on="id",
        left_cols=["comment_changeset_id", "comment_user_name"],
        right_cols=["id", "user_name"],
    ).take_all()
    assert len(j) == 40  # every comment has its parent changeset
    assert all(r["comment_changeset_id"] == r["id"] for r in j)


def test_cli_xml_input(ray_session, tmp_path):
    """Flag-for-flag reference parity: `-f changesets.osm[.bz2]` —
    the CLI detects XML inputs and runs the two-table bulk load, with
    --contributors as the literal -k uid filter."""
    import json

    from changesetmd_ray.cli import main

    out = str(tmp_path / "cli_osm")
    rc = main(["--input", FIXTURE, "--out", out])
    assert rc == 0
    import ray.data

    assert ray.data.read_parquet(os.path.join(out, "changesets")).count() == 1264

    out2 = str(tmp_path / "cli_osm_k")
    rc = main(["--files", FIXTURE, "--out", out2, "--contributors", "204045"])
    assert rc == 0
    t = ray.data.read_parquet(os.path.join(out2, "changesets")).take_all()
    assert {r["user_id"] for r in t} == {204045}
