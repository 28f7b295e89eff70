"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (input_hint pages → geo extract →
cell encode → resumable partitioned parquet) on sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
training-data additions) as ``sf_dir → result`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names; see
``changesetmd_ray/pipelines/queries.py`` for the float-parity rules).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive input_hint
    pages, run the resumable extract+encode pipeline (manifest +
    partitioned parquet under /tmp), return the output Dataset."""
    from changesetmd_ray.pipelines.flagship import read_output, run_flagship
    from changesetmd_ray.pipelines.queries import pages_from_docs

    pages = pages_from_docs("/root/testdata/sf0.001", "/tmp/changesetmd_pages_v2_sf0.001")
    out_dir = "/tmp/changesetmd_entry_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    run_flagship(pages, out_dir, concurrency=(1, 4))
    return read_output(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from changesetmd_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query (50/50 —
    value-exact; ann_lsh via in-query recall assertions against the
    exact top-k, media via the real BMP/JPEG/PNG/GIF/WAV/VID1/MP4
    codecs over planted payloads — including cross-format perceptual-
    hash near-dup recall rows and closed-form Nyquist-tone spectral
    features; see queries.py for the float-parity rules)."""
    from changesetmd_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
