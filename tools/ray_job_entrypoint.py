"""`ray job submit` entrypoint for a real multi-node cluster.

The north_rule runs the engine "via ray job submit on fixed-size
clusters at N and 4N nodes". This sandbox cannot host the Ray job
server (no dashboard allowed), so the per-round scaling evidence uses
fresh `ray.init(num_cpus=...)` processes instead (see BASELINE.md);
THIS file is the entrypoint a real deployment submits:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python tools/ray_job_entrypoint.py \
           --input 's3://bucket/pages/*.parquet' --out s3://bucket/out \
           [--resume] [--langs en,de] [--wave-size 2048]

Inside the job, `ray.init(address="auto")` attaches to the cluster the
job server placed us on; the flagship pipeline then runs with its
per-partition manifest, so a preempted job resubmitted with --resume
skips finished partitions. Runs identically on a laptop
(`RAY_ADDRESS=local`).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _expand_input(spec: str) -> list[str]:
    """Expand --input into shard paths. Local dirs go through
    discover_partitions, local globs through glob.glob; URI specs
    (s3://, gs://, hdfs://) are listed via pyarrow.fs — glob.glob
    would silently return [] for them — with fnmatch on the basename
    when the last path segment carries a wildcard."""
    from changesetmd_ray.sources.pages import discover_partitions

    if "://" in spec:
        import fnmatch

        from pyarrow import fs as pafs

        base, pattern = spec, "*.parquet"
        last = spec.rsplit("/", 1)[-1]
        if any(ch in last for ch in "*?["):
            base, pattern = spec.rsplit("/", 1)
        filesystem, root = pafs.FileSystem.from_uri(base)
        scheme = base.split("://", 1)[0]
        infos = filesystem.get_file_info(pafs.FileSelector(root, recursive=False))
        return sorted(
            f"{scheme}://{i.path}"
            for i in infos
            if i.type == pafs.FileType.File
            and fnmatch.fnmatch(i.path.rsplit("/", 1)[-1], pattern)
        )
    if os.path.isdir(spec):
        return list(discover_partitions(spec).values())
    return sorted(glob.glob(spec))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="input shard glob or directory of .parquet files")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions the manifest records as done")
    ap.add_argument("--langs", default=None, help="comma-separated lang allow-list")
    ap.add_argument("--wave-size", type=int, default=2048)
    ap.add_argument("--s2-level", type=int, default=12)
    ap.add_argument("--hex-res", type=int, default=9)
    ap.add_argument("--grid-zoom", type=int, default=7)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is set by the job server;
        # standalone runs with no cluster fall back to a local session
        # (address="auto" raises ConnectionError when nothing is up)
        addr = os.environ.get("RAY_ADDRESS")
        if addr:
            ray.init(address=addr, include_dashboard=False,
                     ignore_reinit_error=True)
        else:
            try:
                ray.init(address="auto", include_dashboard=False,
                         ignore_reinit_error=True)
            except ConnectionError:
                ray.init(address="local", include_dashboard=False,
                         ignore_reinit_error=True)

    from changesetmd_ray.pipelines.flagship import run_flagship

    files = _expand_input(args.input)
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2

    metrics = run_flagship(
        files,
        args.out,
        s2_level=args.s2_level,
        hex_res=args.hex_res,
        grid_zoom=args.grid_zoom,
        wave_size=args.wave_size,
        resume=args.resume,
        langs=args.langs.split(",") if args.langs else None,
        concurrency=None,
    )
    metrics.pop("last_wave_stats", None)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
