"""Command-line entry point — the reference's CLI surface
(``changesetmd.py:499-527``) re-expressed for the Ray engine, so a
reference user can switch flag-for-flag:

| reference flag | here |
|---|---|
| ``-f/--file`` (bulk load)            | ``--input`` shard dir (or explicit ``--files``); ``.osm``/``.osm.bz2`` inputs load through the XML source exactly like the reference; ``.warc``/``.warc.gz`` inputs stage through the real-crawl ingest (sources/warc.py + HTML→text + LangId) then run the flagship |
| ``-c/--create`` + ``-t/--truncate``  | ``--fresh`` (clear output data + manifest first) |
| ``-r/--replicate`` (incremental)     | the DEFAULT: resume via the manifest diff |
| ``-F --fromseq --toseq`` (partial)   | ``--from-part/--to-part`` (explicit range, manifest still written) |
| ``-g/--geometry``                    | ``--s2-level/--hex-res/--grid-zoom`` (index columns are always on; these pick resolutions) |
| ``-b/--bulkrows``                    | ``--batch-size`` |
| ``-k/--kid`` (contributor allow-list)| ``--langs en,de`` (allow-list on the pages table's ``lang``) |

Usage::

    python -m changesetmd_ray --input /data/pages --out /data/out
    python -m changesetmd_ray --input ... --out ... --fresh --langs en
    python -m changesetmd_ray --input ... --out ... --from-part 3 --to-part 7

Owns the Ray session (guarded init — reuses one if already running).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="changesetmd_ray", description=__doc__.split("\n\n")[0])
    ap.add_argument("--input", help="directory of part-*.parquet page shards")
    ap.add_argument("--files", nargs="*", help="explicit shard files (overrides --input)")
    ap.add_argument("--out", required=True, help="output root (data/ + _manifest/)")
    ap.add_argument("--fresh", action="store_true",
                    help="clear output data + manifest first (reference -t/--truncate)")
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess every partition even if marked done")
    ap.add_argument("--from-part", type=int, default=None)
    ap.add_argument("--to-part", type=int, default=None)
    ap.add_argument("--s2-level", type=int, default=12)
    ap.add_argument("--hex-res", type=int, default=9)
    ap.add_argument("--grid-zoom", type=int, default=7)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="rows per extract batch, or rows per in-flight XML "
                         "chunk on .osm inputs (reference --bulkrows; "
                         "defaults: 2048 extract / 100000 XML)")
    ap.add_argument("--langs", default=None,
                    help="comma-separated lang allow-list (reference -k shape)")
    ap.add_argument("--contributors", default=None,
                    help="comma-separated uid allow-list for .osm inputs "
                         "(the reference -k/--kid filter, literally)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus when starting a fresh session")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from changesetmd_ray.sources.pages import discover_partitions

    # resolve + validate inputs BEFORE paying Ray session startup
    if args.files:
        files = list(args.files)
    elif args.input:
        import glob as _glob
        import os as _os

        xml = sorted(
            _glob.glob(_os.path.join(args.input, "*.osm"))
            + _glob.glob(_os.path.join(args.input, "*.osm.bz2"))
        ) if _os.path.isdir(args.input) else []
        if _os.path.isfile(args.input) or xml:
            files = xml or [args.input]
        else:
            files = list(discover_partitions(args.input).values())
    else:
        print("error: provide --input or --files", file=sys.stderr)
        return 2

    if files and all(f.endswith((".osm", ".osm.bz2")) for f in files):
        # the reference's literal bulk load: changeset XML → the
        # two-table parquet layout (one parse pass per file)
        if args.from_part is not None or args.to_part is not None:
            print("error: --from-part/--to-part select parquet part ids; "
                  "pass --files to pick specific .osm inputs", file=sys.stderr)
            return 2
        if args.langs:
            print("error: --langs applies to the pages table; .osm inputs "
                  "take --contributors (reference -k/--kid)", file=sys.stderr)
            return 2
        # x.osm + x.osm.bz2 twins (the reference fixture dir ships both)
        # would load the same data twice into one output stem — keep the
        # uncompressed copy, which parses without the bz2 layer
        import os as _os

        def _stem(p):
            b = _os.path.basename(p)
            for ext in (".bz2", ".osm", ".xml"):
                b = b[: -len(ext)] if b.endswith(ext) else b
            return b

        plain = {_stem(p) for p in files if not p.endswith(".bz2")}
        files = [p for p in files if not (p.endswith(".bz2") and _stem(p) in plain)]
        from changesetmd_ray.malloc_tuning import tune_malloc

        tune_malloc()
        import ray

        if not ray.is_initialized():
            kwargs = {"include_dashboard": False}
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
            ray.init(address="local", **kwargs)
        from changesetmd_ray.sources.osm_xml import load_changesets_xml

        if args.fresh:
            shutil.rmtree(args.out, ignore_errors=True)
        counts = load_changesets_xml(
            files, args.out,
            contributors=args.contributors.split(",") if args.contributors else None,
            batch_rows=args.batch_size or 100_000,
        )
        print(json.dumps(
            {
                "files": len(counts),
                "changesets": int(sum(counts["changesets"].to_pylist())),
                "comments": int(sum(counts["comments"].to_pylist())),
                "out_dir": args.out,
            }
        ))
        return 0

    if files and all(f.endswith((".warc", ".warc.gz")) for f in files):
        # real-crawl ingest: WARC → pages staging (url/warc_ts/html +
        # derived text/lang) → fall through to the resumable flagship
        # over the staged shards. Staging is idempotent: an existing
        # staged/ dir is reused unless --fresh.
        if args.from_part is not None or args.to_part is not None:
            print("error: --from-part/--to-part select parquet part ids; "
                  "pass --files to pick specific .warc inputs",
                  file=sys.stderr)
            return 2
        import glob as _glob
        import os as _os

        from changesetmd_ray.malloc_tuning import tune_malloc

        tune_malloc()
        import ray

        if not ray.is_initialized():
            kwargs = {"include_dashboard": False}
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
            ray.init(address="local", **kwargs)
        if args.fresh:
            shutil.rmtree(args.out, ignore_errors=True)
        staged = _os.path.join(args.out, "staged")
        if not _os.path.isdir(staged):
            from changesetmd_ray.stages.html_text import warc_to_pages

            warc_to_pages(files).write_parquet(staged)
        files = sorted(_glob.glob(_os.path.join(staged, "*.parquet")))
        args.fresh = False  # output already cleared above

    if args.from_part is not None or args.to_part is not None:
        # partial range (reference -F --fromseq --toseq): selected by the
        # part id PARSED FROM THE FILENAME, not list position — gaps or
        # offset numbering must not silently shift the window
        import re as _re

        def part_id(path):
            m = _re.search(r"part-(\d+)\.parquet$", path)
            return int(m.group(1)) if m else None

        lo = args.from_part if args.from_part is not None else float("-inf")
        hi = args.to_part if args.to_part is not None else float("inf")
        files = [p for p in files if (i := part_id(p)) is not None and lo <= i <= hi]

    # large allocations must stay in the malloc arena on this host —
    # fresh pages fault at ~10-30 MB/s (see changesetmd_ray/
    # malloc_tuning.py); env covers workers spawned by ray.init below,
    # mallopt covers this driver process
    from changesetmd_ray.malloc_tuning import tune_malloc

    tune_malloc()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from changesetmd_ray.pipelines.flagship import run_flagship

    if args.fresh:
        shutil.rmtree(args.out, ignore_errors=True)

    metrics = run_flagship(
        files,
        args.out,
        s2_level=args.s2_level,
        hex_res=args.hex_res,
        grid_zoom=args.grid_zoom,
        batch_size=args.batch_size or 2048,
        resume=not args.no_resume,
        langs=args.langs.split(",") if args.langs else None,
    )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
