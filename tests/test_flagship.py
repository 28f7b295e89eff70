"""End-to-end flagship slice: read → extract → encode → write, with
ground-truth extraction checks, the byte-identical text invariant, and
manifest resume/idempotency (SURVEY.md §5.2, §7.3)."""

import os

import numpy as np
import pytest

from changesetmd_ray import fixtures
from changesetmd_ray.geo.envelope import normalize_bbox
from changesetmd_ray.pipelines.flagship import read_output, run_flagship
from changesetmd_ray.state.manifest import Manifest, ManifestLockedError


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    fixtures.write_pages_dir(str(d), n_shards=4, rows_per_shard=120, seed=7)
    return str(d)


@pytest.fixture(scope="module")
def flagship_out(ray_session, pages_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flag_out"))
    files = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir))
    stats = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    return out, stats


def truth_frames(pages_dir):
    frames = {}
    for s in range(4):
        _, truth = fixtures.make_pages_shard(s, 120, seed=7, with_truth=True)
        frames[f"part-{s:05d}"] = truth
    return frames


def test_runs_and_counts(flagship_out):
    out, stats = flagship_out
    assert stats["partitions"] == 4 and stats["skipped"] == 0
    assert stats["rows"] == 480
    df = read_output(out).to_pandas()
    assert len(df) == 480
    assert set(df["shard_id"].unique()) == {f"part-{s:05d}" for s in range(4)}


def test_extracted_points_and_bbox_match_planted_truth(flagship_out, pages_dir):
    out, _ = flagship_out
    df = read_output(out).to_pandas()
    for sid, truth in truth_frames(pages_dir).items():
        # (url, warc_ts) is the unique key — urls repeat (dup edge row)
        tdf = truth.to_pandas().set_index(["url", "warc_ts"])
        sub = df[df["shard_id"] == sid]
        for _, row in sub.iterrows():
            t = tdf.loc[(row["url"], row["warc_ts"])]
            got = {(p["lon"], p["lat"]) for p in row["points"]}
            want = {(p["lon"], p["lat"]) for p in t["true_points"]}
            assert got == want, row["url"]
            if len(want) == 0:
                assert np.isnan(row["min_lon"]) and row["n_points"] == 0
            else:
                lo_x, lo_y, hi_x, hi_y, _g = normalize_bbox(
                    np.array([t["true_min_lon"]]),
                    np.array([t["true_min_lat"]]),
                    np.array([t["true_max_lon"]]),
                    np.array([t["true_max_lat"]]),
                )
                assert row["min_lon"] == lo_x[0] and row["max_lon"] == hi_x[0]
                assert row["min_lat"] == lo_y[0] and row["max_lat"] == hi_y[0]


def test_text_byte_identical_per_url(flagship_out, pages_dir):
    out, _ = flagship_out
    # output text joined back to input must be byte-equal (north_rule
    # invariant); key is (url, warc_ts) because urls repeat
    out_df = read_output(out, columns=["shard_id", "url", "warc_ts", "text"]).to_pandas()
    for s in range(4):
        src = fixtures.make_pages_shard(s, 120, seed=7)
        sub = out_df[out_df["shard_id"] == f"part-{s:05d}"]
        assert len(sub) == 120
        src_map = {
            (u, t): x
            for u, t, x in zip(
                src["url"].to_pylist(), src["warc_ts"].to_pylist(), src["text"].to_pylist()
            )
        }
        for _, row in sub.iterrows():
            want = src_map[(row["url"], row["warc_ts"].to_pydatetime())]
            assert row["text"] == want
            assert row["text"].encode("utf-8") == want.encode("utf-8")


def test_edge_rows(flagship_out):
    out, _ = flagship_out
    df = read_output(out).to_pandas()
    s0 = df[df["shard_id"] == "part-00000"].sort_values("url")
    # out-of-range lat was clamped to 90 (reference README.md:187-188)
    assert (df["max_lat"].dropna() <= 90.0).all()
    assert (df["min_lat"].dropna() >= -90.0).all()
    # no-geo rows have null cells
    nog = df[df["n_points"] == 0]
    assert len(nog) > 0 and nog["s2_cell"].isna().all()
    # geo rows have all three index columns
    geo = df[df["n_points"] > 0]
    assert geo["s2_cell"].notna().all() and geo["hex_cell"].notna().all()
    _ = s0


def test_child_points_table_matches_parent(flagship_out, pages_dir):
    """S7 child-table sink: the flattened points table must agree with
    the parent's points lists row-for-row (count per parent, coords,
    document order) — the reference's changesets+comments layout."""
    from changesetmd_ray.pipelines.flagship import read_points_output

    out, _ = flagship_out
    parent = read_output(out).to_pandas()
    child = read_points_output(out).to_pandas()
    assert set(child.columns) >= {"url", "warc_ts", "seq", "lon", "lat", "shard_id"}
    assert len(child) == int(parent["n_points"].sum())
    counts = child.groupby(["url", "warc_ts"]).size()
    for _, row in parent.iterrows():
        got = counts.get((row["url"], row["warc_ts"]), 0)
        assert got == row["n_points"], row["url"]
        want = [(p["lon"], p["lat"]) for p in row["points"]]
        sub = child[(child["url"] == row["url"]) & (child["warc_ts"] == row["warc_ts"])]
        sub = sub.sort_values("seq")
        assert list(sub["seq"]) == list(range(len(want)))
        assert list(zip(sub["lon"], sub["lat"])) == want


def test_resume_skips_done_and_repairs_missing(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "resume_out")
    files = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir))
    s1 = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    assert s1["partitions"] == 4
    before = read_output(out).to_pandas().sort_values(["shard_id", "url"]).reset_index(drop=True)

    # all done → rerun is a no-op
    s2 = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    assert s2["partitions"] == 0 and s2["skipped"] == 4

    # invalidate one partition (simulate crash after partial write):
    # delete its manifest line AND corrupt its data dir
    m = Manifest(os.path.join(out, "_manifest"))
    m.invalidate("part-00002")
    import shutil

    shutil.rmtree(os.path.join(out, "data", "shard_id=part-00002"))
    s3 = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    assert s3["partitions"] == 1 and s3["skipped"] == 3

    after = read_output(out).to_pandas().sort_values(["shard_id", "url"]).reset_index(drop=True)
    # identical output after repair — idempotent partition overwrite
    assert before["url"].equals(after["url"])
    assert before["text"].equals(after["text"])
    assert np.array_equal(
        before["s2_cell"].fillna(0).to_numpy(), after["s2_cell"].fillna(0).to_numpy()
    )
    # the child table was rewritten with the wave and still lines up
    from changesetmd_ray.pipelines.flagship import read_points_output

    child = read_points_output(out).to_pandas()
    assert len(child) == int(after["n_points"].sum())
    assert set(child["shard_id"].unique()) == set(after["shard_id"].unique())

    # a missing CHILD dir alone (manifest still says done, parent
    # intact) must also repair on resume — e.g. an out_dir written by a
    # build without the child sink
    shutil.rmtree(os.path.join(out, "points", "shard_id=part-00001"))
    s4 = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    assert s4["partitions"] == 1 and s4["skipped"] == 3
    child2 = read_points_output(out).to_pandas()
    assert len(child2) == len(child)


def test_lock_prevents_concurrent_runs(tmp_path):
    m = Manifest(str(tmp_path / "m"))
    m.acquire_lock()
    m2 = Manifest(str(tmp_path / "m"))
    with pytest.raises(ManifestLockedError):
        m2.acquire_lock()
    m.release_lock()
    m2.acquire_lock()  # now fine
    m2.release_lock()


def test_stale_lock_is_broken(tmp_path):
    import json

    m = Manifest(str(tmp_path / "m"))
    with open(os.path.join(str(tmp_path / "m"), "LOCK"), "w") as f:
        json.dump({"pid": 99999999, "ts": 0}, f)  # dead pid + ancient ts
    m.acquire_lock()  # breaks the stale lock instead of raising
    m.release_lock()


def test_cli_end_to_end(ray_session, pages_dir, tmp_path):
    """CLI surface: fresh run, resume, partial range, lang filter."""
    import json as _json

    from changesetmd_ray.cli import main
    from changesetmd_ray.pipelines.flagship import read_output

    out = str(tmp_path / "cli_out")
    rc = main(["--input", pages_dir, "--out", out, "--fresh"])
    assert rc == 0
    total = read_output(out).count()
    assert total > 0

    # resume: everything already done → 0 new partitions
    rc = main(["--input", pages_dir, "--out", out])
    assert rc == 0
    assert read_output(out).count() == total

    # lang allow-list filters rows
    out2 = str(tmp_path / "cli_lang")
    rc = main(["--input", pages_dir, "--out", out2, "--langs", "en"])
    assert rc == 0
    sub = read_output(out2, columns=["lang"])
    langs = {r["lang"] for r in sub.take_all()}
    assert langs <= {"en"}

    # partial range processes a strict subset of partitions
    out3 = str(tmp_path / "cli_part")
    rc = main(["--input", pages_dir, "--out", out3, "--from-part", "0", "--to-part", "0"])
    assert rc == 0
    assert read_output(out3).count() < total


def test_empty_wave_marks_done(ray_session, pages_dir, tmp_path):
    """A lang filter matching nothing must mark partitions done with
    zero rows, not crash the read-back (and resume must skip them)."""
    from changesetmd_ray.pipelines.flagship import run_flagship
    from changesetmd_ray.sources.pages import discover_partitions
    from changesetmd_ray.state.manifest import Manifest

    files = list(discover_partitions(pages_dir).values())
    out = str(tmp_path / "empty_wave")
    m1 = run_flagship(files, out, langs=["zz"])  # matches nothing
    assert m1["rows"] == 0
    manifest = Manifest(out + "/_manifest")
    assert len(manifest.completed()) == len(files)
    m2 = run_flagship(files, out, langs=["zz"])  # resume: all skipped
    assert m2["partitions"] == 0 and m2["skipped"] == len(files)


def test_duplicate_and_bad_shard_names_rejected(ray_session, tmp_path):
    from changesetmd_ray.pipelines.flagship import run_flagship

    with pytest.raises(ValueError, match="duplicate shard basenames"):
        run_flagship(["/a/part-1.parquet", "/b/part-1.parquet"], str(tmp_path / "x"))
    with pytest.raises(ValueError, match="must end in .parquet"):
        run_flagship(["/a/data.snappy.pq"], str(tmp_path / "y"))


def test_manifest_lock_never_half_written(tmp_path):
    """The lock is created atomically WITH content (tmp + link), so a
    concurrent reader can never see an empty lock file and misjudge a
    live lock as stale; breaking a stale lock happens at most once."""
    import json
    import os

    from changesetmd_ray.state.manifest import Manifest, ManifestLockedError

    m = Manifest(str(tmp_path / "m"))
    m.acquire_lock()
    with open(os.path.join(str(tmp_path / "m"), "LOCK")) as f:
        info = json.load(f)  # readable immediately — never empty
    assert info["pid"] == os.getpid()
    m2 = Manifest(str(tmp_path / "m"))
    with pytest.raises(ManifestLockedError):
        m2.acquire_lock()
    m.release_lock()


def test_child_sink_retry_idempotent(tmp_path):
    """A Ray task retry re-runs _child_sink on the same block; the
    deterministic content-derived filename must overwrite, not append a
    duplicate child file (round-3 ADVICE, flagship.py _child_sink)."""
    import glob

    import pyarrow as pa

    from changesetmd_ray.pipelines.flagship import _child_sink

    batch = pa.table(
        {
            "url": ["https://a.example/x", "https://b.example/y"],
            "warc_ts": pa.array([1_700_000_000_000, 1_700_000_100_000], pa.int64()),
            "points": pa.array(
                [
                    [{"lon": 1.0, "lat": 2.0}, {"lon": 3.0, "lat": 4.0}],
                    [{"lon": 5.0, "lat": 6.0}],
                ],
                pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())])),
            ),
            "shard_id": ["s0", "s0"],
        }
    )
    d = str(tmp_path / "points")
    _child_sink(batch, d)
    _child_sink(batch, d)  # simulated retry of the same block
    files = glob.glob(os.path.join(d, "shard_id=s0", "part-*.parquet"))
    assert len(files) == 1  # overwritten, not duplicated
    assert not glob.glob(os.path.join(d, "shard_id=s0", "*.tmp"))


def test_child_sink_distinct_blocks_never_collide(tmp_path):
    """Two DIFFERENT blocks sharing boundary rows and row count (the
    duplicate-parent-key edge) must write two distinct child files —
    a boundary-only name would collide and silently clobber one
    block's rows (round-4 review finding)."""
    import glob

    import pyarrow as pa

    from changesetmd_ray.pipelines.flagship import _child_sink

    pt = pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))

    def block(mid_url: str) -> pa.Table:
        return pa.table(
            {
                # same first row, same last row, same length — only the
                # middle row differs between the two blocks
                "url": ["https://a.example/x", mid_url, "https://z.example/w"],
                "warc_ts": pa.array([1, 2, 3], pa.int64()),
                "points": pa.array(
                    [[{"lon": 1.0, "lat": 2.0}]] * 3, pt
                ),
                "shard_id": ["s0", "s0", "s0"],
            }
        )

    d = str(tmp_path / "points")
    _child_sink(block("https://m1.example/a"), d)
    _child_sink(block("https://m2.example/b"), d)
    files = glob.glob(os.path.join(d, "shard_id=s0", "part-*.parquet"))
    assert len(files) == 2  # distinct content -> distinct names
    import pyarrow.parquet as pq

    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 6  # no block's rows were clobbered


def test_replication_loop_new_partitions(ray_session, tmp_path):
    """The reference's continuous-replication mode (changesetmd.py:
    290-300: poll state, fetch NEW sequence files, apply): new shards
    appearing between runs are the only work the next run does, and the
    incrementally-built output is identical to a fresh full run."""
    import shutil

    import pandas as pd

    from changesetmd_ray import fixtures
    from changesetmd_ray.pipelines.flagship import read_points_output
    from changesetmd_ray.sources.pages import discover_partitions, source_watermark

    src = str(tmp_path / "incoming")
    fixtures.write_pages_dir(src, n_shards=3, rows_per_shard=80, seed=21)
    out = str(tmp_path / "repl_out")

    files = list(discover_partitions(src).values())
    s1 = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    assert s1["partitions"] == 3
    wm1 = source_watermark(src)

    # two new sequence files arrive (ids continue past the watermark)
    more = str(tmp_path / "more")
    fixtures.write_pages_dir(more, n_shards=5, rows_per_shard=80, seed=21)
    for s in (3, 4):
        shutil.copy(
            os.path.join(more, f"part-{s:05d}.parquet"),
            os.path.join(src, f"part-{s:05d}.parquet"),
        )
    assert source_watermark(src) > wm1

    files = list(discover_partitions(src).values())
    s2 = run_flagship(files, out, batch_size=64, concurrency=2, wave_size=2)
    assert s2["partitions"] == 2 and s2["skipped"] == 3  # only the new work

    # incremental result == fresh full run over all 5 shards
    fresh_out = str(tmp_path / "fresh_out")
    run_flagship(
        [os.path.join(more, f) for f in sorted(os.listdir(more))],
        fresh_out, batch_size=64, concurrency=2, wave_size=2,
    )

    def canon(df):
        return df.sort_values(["shard_id", "url"]).reset_index(drop=True)

    inc = canon(read_output(out).to_pandas())
    full = canon(read_output(fresh_out).to_pandas())
    pd.testing.assert_frame_equal(inc, full)
    inc_pts = read_points_output(out).to_pandas().sort_values(
        ["shard_id", "url", "seq"]).reset_index(drop=True)
    full_pts = read_points_output(fresh_out).to_pandas().sort_values(
        ["shard_id", "url", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(inc_pts, full_pts)
