"""Transient-failure tolerance — the property a 256-node 100-TB run
leans on continuously.

Two real failure shapes:

- WORKER DEATH (OOM-kill / spot preemption): the UDF ``os._exit``\\ s
  its worker process mid-task. Ray treats this as a system failure and
  retries the task by default; output must still be exactly correct.
- USER-CODE EXCEPTION (flaky downstream dependency): NOT retried by
  default (it propagates — correct, bugs shouldn't loop); opting a
  stage in via ``ray_remote_args(retry_exceptions=[...])`` makes the
  pipeline self-heal, including through a multi-stage engine operator.

The poison is filesystem-keyed so exactly the first attempt per marker
fails, whichever worker runs the retry; callables are defined inside
the tests so cloudpickle ships them by value (test modules are not
importable inside Ray workers)."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray


def _poison_once(marker_dir: str, lo: int) -> bool:
    """True exactly once per (marker_dir, lo) across all processes."""
    try:
        fd = os.open(os.path.join(marker_dir, f"blk-{lo}"),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    os.close(fd)
    return True


def test_map_batches_survives_worker_death(ray_session):
    """First attempt per block hard-exits its worker (the OOM/preempt
    shape); Ray's default task retry must deliver exact output."""
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        n = 4_000

        def square(batch: pa.Table) -> pa.Table:
            import os as _os

            lo = int(pa.compute.min(batch["id"]).as_py())
            try:
                fd = _os.open(_os.path.join(d, f"blk-{lo}"),
                              _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                _os.close(fd)
                _os._exit(1)  # simulated OOM-kill mid-task
            except FileExistsError:
                pass
            ids = batch["id"].to_numpy(zero_copy_only=False)
            return pa.table({"id": batch["id"],
                             "sq": pa.array((ids * ids).astype(np.int64))})

        out = (
            ray.data.range(n, override_num_blocks=4)
            .map_batches(square, batch_format="pyarrow", batch_size=1000)
            .take_all()
        )
        got = sorted((r["id"], r["sq"]) for r in out)
        assert got == [(i, i * i) for i in range(n)]
        assert len(os.listdir(d)) == 4  # every block died once


def test_user_exception_retry_through_engine_operator(ray_session):
    """User-code exceptions propagate by default; with
    ``retry_exceptions`` the stage self-heals, and a multi-stage engine
    operator (exact_dedup) downstream stays value-correct — retries
    must not double-count or drop rows through the thin-key exchange."""
    from changesetmd_ray.text.dedup import exact_dedup

    with tempfile.TemporaryDirectory(dir="/tmp") as d:

        def derive(batch: pa.Table) -> pa.Table:
            import os as _os

            lo = int(pa.compute.min(batch["id"]).as_py())
            try:
                fd = _os.open(_os.path.join(d, f"blk-{lo}"),
                              _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                _os.close(fd)
                raise RuntimeError(f"injected transient failure at {lo}")
            except FileExistsError:
                pass
            ids = batch["id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": batch["id"],
                    "text": pa.array([f"t{int(i) % 40}" for i in ids], pa.string()),
                }
            )

        ds = ray.data.range(400, override_num_blocks=4).map_batches(
            derive, batch_format="pyarrow",
            retry_exceptions=[RuntimeError],  # **ray_remote_args passthrough
        )
        out = exact_dedup(ds, key_col="text", id_col="doc_id").take_all()
        # keep='first': the surviving doc_id per text class is the min
        assert sorted(r["doc_id"] for r in out) == list(range(40))
        assert len(os.listdir(d)) >= 1  # the poison really fired


def test_user_exception_propagates_without_optin(ray_session):
    """Without retry_exceptions a user-code failure must surface, not
    silently drop data."""
    def boom(batch: pa.Table) -> pa.Table:
        raise ValueError("permanent user bug")

    with pytest.raises(Exception, match="permanent user bug"):
        ray.data.range(100, override_num_blocks=2).map_batches(
            boom, batch_format="pyarrow").take_all()
