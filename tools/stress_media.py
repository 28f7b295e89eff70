"""Scale stress for the image perceptual-hash near-dup operator
(stages/media_fp.py, round 5).

Synthesizes ``--n`` photo-like images (deterministic multi-sinusoid
RGB, the mediafp_from_docs generator) written as real BMPs, with
``--dup-frac`` of them brightness-shifted JPEG-q90 recompressions of
earlier images (cross-format near-dups the operator must find through
real decode → pHash). The corpus is written to /tmp parquet shards and
read back so the stage streams file-backed like production.

Measures the two phases separately and end-to-end:

- decode + pHash (the compute-bound actor/task stage — the 100-TB cost
  driver; payload never leaves the map stage),
- the pigeonhole-banded Hamming pair exchange (thin (band, id, fp)
  rows only).

Usage:  python tools/stress_media.py [--n 20000] [--cpus 32]
        [--dup-frac 0.1] [--img 48x64]

Prints one JSON line with recall over the planted pairs and wall
seconds per phase.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _synth_shard(args: tuple) -> int:
    """One shard's rows (multiprocessing worker — top-level for
    pickling; deterministic per (shard, n, dup_frac, h, w))."""
    out_dir, s, lo, hi, dup_frac, h, w = args
    from changesetmd_ray.stages.codecs import bmp_encode
    from changesetmd_ray.stages.jpeg import jpeg_encode
    from changesetmd_ray.text.hashing import splitmix64

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def grad_img(d: int) -> np.ndarray:
        u = splitmix64(np.uint64(d * 131) + np.arange(12, dtype=np.uint64)).astype(
            np.float64) / 2**64
        img = np.zeros((h, w, 3))
        for c in range(3):
            fy, fx = 0.5 + 2.5 * u[4 * c], 0.5 + 2.5 * u[4 * c + 1]
            py, px = 2 * np.pi * u[4 * c + 2], 2 * np.pi * u[4 * c + 3]
            img[..., c] = 128 + 90 * np.sin(2 * np.pi * fy * yy / h + py) * np.cos(
                2 * np.pi * fx * xx / w + px)
        return np.clip(img, 0, 255).astype(np.uint8)

    k = max(2, int(round(1.0 / dup_frac))) if dup_frac > 0 else 0
    ids, payloads = [], []
    planted = 0
    for d in range(lo, hi):
        if k and d % k == k - 1:
            near = np.clip(grad_img(d - 1).astype(np.int16) + 12, 0, 255).astype(
                np.uint8)
            payloads.append(jpeg_encode(near, quality=90))
            planted += 1
        else:
            payloads.append(bmp_encode(grad_img(d)))
        ids.append(d)
    t = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, f"part-{s:05d}.parquet"))
    return planted


def synth_media(out_dir: str, n: int, dup_frac: float, h: int, w: int,
                n_shards: int = 32) -> int:
    """Write n images (BMP bases + interleaved JPEG near-dup copies —
    spreading the Python-heavy JPEG work evenly across read shards) to
    parquet, one multiprocessing worker per shard (the Python encoders
    dominate synth wall; measured 73 s → ~8 s at 80 k images)."""
    import multiprocessing as mp

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    per = (n + n_shards - 1) // n_shards
    jobs = []
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        if lo >= hi:
            break
        jobs.append((out_dir, s, lo, hi, dup_frac, h, w))
    with mp.get_context("fork").Pool(min(len(jobs), os.cpu_count() or 8)) as pool:
        return sum(pool.map(_synth_shard, jobs))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dup-frac", type=float, default=0.1)
    ap.add_argument("--img", default="48x64")
    ap.add_argument("--max-hamming", type=int, default=10)
    args = ap.parse_args()
    h, w = (int(x) for x in args.img.split("x"))

    out_dir = f"/tmp/changesetmd_stress_media_{args.n}_{args.img}"
    t0 = time.time()
    planted = synth_media(out_dir, args.n, args.dup_frac, h, w)
    synth_s = time.time() - t0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from changesetmd_ray.stages.media_fp import media_phash
    from changesetmd_ray.text.dedup import hamming_candidates

    paths = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    # one block per shard: Ray's default splitter shreds payload-heavy
    # tables into ~1 MB blocks, and the per-task fixed costs then
    # dominate the decode (measured 15-21 s vs 2.3 s at 20 k images —
    # see BASELINE.md round-5 media notes)
    ds = ray.data.read_parquet(
        paths, columns=["media_id", "media_type", "payload"],
        override_num_blocks=max(args.cpus, len(paths)),
    )

    # phase 1: decode + pHash (materialize the thin (id, fp) projection)
    t1 = time.time()
    fps = media_phash(ds).select_columns(["media_id", "phash"]).materialize()
    phash_s = time.time() - t1

    # phase 2: banded Hamming pair exchange over the thin projection
    t2 = time.time()
    pairs = hamming_candidates(
        fps, fp_col="phash", id_col="media_id", max_hamming=args.max_hamming
    ).take_all()
    pairs_s = time.time() - t2

    k = max(2, int(round(1.0 / args.dup_frac))) if args.dup_frac > 0 else 0
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    hit = sum(
        1 for d in range(args.n) if k and d % k == k - 1 and (d - 1, d) in found
    )
    # the operator's contract is CONNECTIVITY (the hot-group reduction
    # may route a planted pair through its identical-fp hub): a planted
    # pair counts as recalled when both sides share a component
    from changesetmd_ray.text.dedup import duplicate_clusters

    clusters = duplicate_clusters(pa.table(
        {"id_a": pa.array([p["id_a"] for p in pairs], pa.int64()),
         "id_b": pa.array([p["id_b"] for p in pairs], pa.int64())}
    ))
    rep = dict(zip(clusters["doc_id"].to_pylist(), clusters["rep_id"].to_pylist()))
    conn_hit = sum(
        1 for d in range(args.n)
        if k and d % k == k - 1 and rep.get(d - 1, d - 1) == rep.get(d, d)
    )
    print(json.dumps(
        {
            "n_images": args.n,
            "img": args.img,
            "planted_pairs": planted,
            "recall_direct_pair": round(hit / max(planted, 1), 4),
            "recall_connected": round(conn_hit / max(planted, 1), 4),
            "pairs_found": len(pairs),
            "synth_sec": round(synth_s, 2),
            "phash_sec": round(phash_s, 2),
            "pairs_sec": round(pairs_s, 2),
            "images_per_sec": round(args.n / phash_s, 1),
            "cpus": args.cpus,
        }
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
