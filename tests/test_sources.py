"""Sources layer: partition discovery, watermark, schema contract,
incremental (replication-diff) reads."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from changesetmd_ray.sources.pages import (
    PAGES_SCHEMA,
    discover_partitions,
    partition_path,
    read_pages,
    read_pages_incremental,
    source_watermark,
    validate_schema,
)
from changesetmd_ray.state.manifest import Manifest


def _write_shard(path, n, start=0):
    base = np.datetime64("2021-01-01T00:00:00", "us")
    t = pa.table(
        {
            "url": pa.array([f"https://x/d{start + i}" for i in range(n)]),
            "warc_ts": pa.array([base + np.timedelta64(i, "s") for i in range(n)], pa.timestamp("us")),
            "html": pa.array([b"<html></html>"] * n, pa.binary()),
            "text": pa.array(["t"] * n),
            "lang": pa.array(["en"] * n),
        }
    )
    pq.write_table(t, path)


@pytest.fixture()
def root(tmp_path):
    for i in (0, 1, 3):  # gap at 2 on purpose
        _write_shard(partition_path(str(tmp_path), i), 5, start=i * 5)
    (tmp_path / "not-a-part.txt").write_text("x")
    return str(tmp_path)


def test_discover_and_watermark(root):
    parts = discover_partitions(root)
    assert list(parts) == ["part-00000", "part-00001", "part-00003"]
    assert source_watermark(root) == 3


def test_schema_contract(root, tmp_path):
    validate_schema(partition_path(root, 0))
    bad = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"url": pa.array([1], pa.int64())}), bad)
    with pytest.raises(ValueError, match="missing required column"):
        validate_schema(bad, ["warc_ts"])
    with pytest.raises(ValueError, match="contract says"):
        validate_schema(bad, ["url"])


def test_read_pages_prunes_and_counts(ray_session, root):
    ds = read_pages(root, columns=["url", "lang"])
    assert ds.count() == 15
    assert set(ds.schema().names) == {"url", "lang"}
    with pytest.raises(ValueError, match="no partitions"):
        read_pages([], columns=["url"])


def test_incremental_diff(ray_session, root, tmp_path):
    manifest = Manifest(str(tmp_path / "_manifest"))
    ds, pending = read_pages_incremental(root, manifest, columns=["url"])
    assert pending == ["part-00000", "part-00001", "part-00003"]
    assert ds.count() == 15
    manifest.mark_done("part-00001", {"rows": 5})
    ds2, pending2 = read_pages_incremental(root, manifest, columns=["url"])
    assert pending2 == ["part-00000", "part-00003"]
    assert ds2.count() == 10
    for p in pending2:
        manifest.mark_done(p, {"rows": 5})
    ds3, pending3 = read_pages_incremental(root, manifest)
    assert ds3 is None and pending3 == []
