"""Per-partition checkpoint manifest — the Ray-native replacement for the
reference's single-row ``osm_changeset_state`` table + mutex
(``queries.py:28-32``, ``changesetmd.py:302-334,383-399,411-413``).

Reference semantics mapped (SURVEY.md §2.8, §4.3.4):

- ``last_sequence`` cursor            → one JSON file per *completed*
  partition under ``<dir>/``; the completed set replaces the cursor so
  partitions are independently resumable and order-free.
- re-applying an old diff is safe     → partition output files have
  deterministic names and are overwritten whole; a partition is "done"
  iff its manifest file exists (written only AFTER the data files).
- ``update_in_progress`` mutex        → ``LOCK`` file carrying pid +
  timestamp. The reference leaks the mutex if it crashes between
  setting and clearing it (``changesetmd.py:327-329`` vs ``411-413``);
  here a lock whose pid is dead (or which exceeded ``stale_sec``) is
  broken automatically on acquire.

Each manifest entry records lineage + metrics: input files, row count,
extracted-point count, max watermark timestamp, duration — mirroring
``last_timestamp`` tracking at ``changesetmd.py:255-256,383-399``.
"""

from __future__ import annotations

import json
import os
import time


class ManifestLockedError(RuntimeError):
    pass


class Manifest:
    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"{partition_id}.json")

    def completed(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.dir)
            if f.endswith(".json") and not f.startswith(".lock-")
        }

    def pending(self, all_partitions: list[str]) -> list[str]:
        done = self.completed()
        return [p for p in all_partitions if p not in done]

    def read(self, partition_id: str) -> dict:
        with open(self._path(partition_id)) as f:
            return json.load(f)

    def mark_done(self, partition_id: str, entry: dict) -> None:
        """Atomic write: tmp file + rename, so a crash can never leave a
        half-written 'done' marker (a partition is done iff this file
        exists in full)."""
        entry = dict(entry)
        entry.setdefault("partition_id", partition_id)
        entry.setdefault("completed_at", time.time())
        tmp = self._path(partition_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(partition_id))

    def invalidate(self, partition_id: str) -> None:
        try:
            os.remove(self._path(partition_id))
        except FileNotFoundError:
            pass

    # ---------------------------------------------------------- run lock

    @property
    def _lock_path(self) -> str:
        return os.path.join(self.dir, "LOCK")

    def acquire_lock(self, stale_sec: float = 24 * 3600.0) -> None:
        """NOWAIT lock like the reference's ``LOCK TABLE ... NOWAIT``
        (``changesetmd.py:308-313``) but with stale-lock recovery."""
        # atomic create-WITH-content: write a private tmp file, then
        # os.link it into place — the lock never exists half-written, so
        # a concurrent reader can't misjudge a live lock as stale
        tmp = os.path.join(self.dir, f".lock-{os.getpid()}-{time.monotonic_ns()}")
        with open(tmp, "w") as f:
            json.dump({"pid": os.getpid(), "ts": time.time()}, f)
        tried_break = False
        try:
            while True:
                try:
                    os.link(tmp, self._lock_path)
                    return
                except FileExistsError:
                    if not tried_break and self._lock_is_stale(stale_sec):
                        # break the stale lock ONCE; if another process
                        # wins the re-acquire race we raise rather than
                        # remove its fresh lock
                        tried_break = True
                        try:
                            os.remove(self._lock_path)
                        except FileNotFoundError:
                            pass
                        continue
                    raise ManifestLockedError(
                        f"another run holds {self._lock_path}; remove it if stale"
                    )
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass

    def _lock_is_stale(self, stale_sec: float) -> bool:
        try:
            with open(self._lock_path) as f:
                info = json.load(f)
        except (OSError, json.JSONDecodeError):
            return True  # unreadable/half-written lock = stale
        if time.time() - float(info.get("ts", 0)) > stale_sec:
            return True
        pid = int(info.get("pid", -1))
        if pid <= 0:
            return True
        try:
            os.kill(pid, 0)  # signal 0: existence check only
            return False
        except ProcessLookupError:
            return True
        except PermissionError:
            return False

    def release_lock(self) -> None:
        try:
            os.remove(self._lock_path)
        except FileNotFoundError:
            pass
