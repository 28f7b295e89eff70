"""Host paging workaround (see BASELINE.md): this sandbox demand-pages
fresh memory at ~10-30 MB/s, and glibc's default M_MMAP_THRESHOLD
returns every >128 KB allocation to the kernel on free — so each large
kernel temporary re-faults.

Two knobs, both needed:
- env vars (``MALLOC_MMAP_THRESHOLD_`` / ``MALLOC_TRIM_THRESHOLD_``)
  only take effect at process STARTUP — they cover child processes
  (Ray workers spawned after the vars are set) but not the process
  that sets them;
- ``mallopt(3)`` via ctypes covers the CURRENT process (driver-side
  take_all/aggregation allocations).
"""

from __future__ import annotations

import os

_ONE_GIB = 1 << 30
# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_malloc(threshold: int = _ONE_GIB) -> None:
    """Keep large allocations in the main arena and never trim it —
    pages stay resident after first touch. Sets the env vars for future
    children AND calls mallopt for the current process. Safe no-op on
    non-glibc platforms."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(threshold))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(threshold))
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, threshold)
        libc.mallopt(_M_TRIM_THRESHOLD, threshold)
    except (OSError, AttributeError):
        pass
