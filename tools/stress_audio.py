"""Scale stress for the audio constellation near-dup operator
(stages/audio_fp.py).

Synthesizes ``--n`` two-second melody-like WAV clips (deterministic
random tone sequences) with ``--dup-frac`` of them time-shifted,
attenuated, noisy re-encodes of the previous clip — the re-encode
shape the alignment-verified matcher must catch. Corpus goes to /tmp
parquet and is read back so the stage streams file-backed.

Measures the fingerprint+pair phases end-to-end and reports recall
over the planted copies (direct pair presence — the constellation
scheme emits real pairs, no reduction).

Usage:  python tools/stress_audio.py [--n 2000] [--cpus 32]
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

RATE = 8000


def _clip(seed: int) -> np.ndarray:
    """CHORD clip with RANDOM segment lengths and phases — two
    failure modes this shape avoids, both measured: a fixed tone grid
    aligns every clip's landmarks at offset 0 (85 k spurious pairs at
    2 k clips), and SINGLE tones saturate the landmark space (~340
    usable bins → at 8 k clips every hash exceeds any occupancy cap:
    cap 64 = quadratic pair growth, cap 16 = recall 0). Three-tone
    chords give the flat landmark occupancy real audio has."""
    rng = np.random.default_rng(seed)
    n = 16000
    out = np.zeros(n)
    s = 0
    while s < n:
        seg = int(rng.uniform(0.08, 0.17) * RATE)
        t = np.arange(min(seg, n - s)) / RATE
        for _ in range(3):
            out[s:s + len(t)] += np.sin(
                2 * np.pi * rng.uniform(200, 3800) * t
                + rng.uniform(0, 2 * np.pi)) / 3.0
        s += seg
    return (12000 * out).astype(np.int16)


def _synth_shard(args: tuple) -> int:
    out_dir, s, lo, hi, dup_frac = args
    from changesetmd_ray.stages.codecs import wav_encode

    k = max(2, int(round(1.0 / dup_frac))) if dup_frac > 0 else 0
    ids, payloads = [], []
    planted = 0
    for d in range(lo, hi):
        if k and d % k == k - 1:
            rng = np.random.default_rng(d)  # per-row: shard-layout-free
            base = _clip(d - 1)
            shifted = np.concatenate(
                [np.zeros(RATE // 4, np.int16),
                 (0.7 * base + rng.normal(0, 120, len(base))).astype(np.int16)])
            payloads.append(wav_encode(shifted, RATE))
            planted += 1
        else:
            payloads.append(wav_encode(_clip(d), RATE))
        ids.append(d)
    pq.write_table(pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "media_type": pa.array(["audio"] * len(ids)),
         "payload": pa.array(payloads, pa.binary())}),
        os.path.join(out_dir, f"part-{s:05d}.parquet"))
    return planted


def synth(out_dir: str, n: int, dup_frac: float, n_shards: int = 32) -> int:
    import multiprocessing as mp

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    per = (n + n_shards - 1) // n_shards
    jobs = []
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        if lo >= hi:
            break
        jobs.append((out_dir, s, lo, hi, dup_frac))
    with mp.get_context("fork").Pool(min(len(jobs), os.cpu_count() or 8)) as pool:
        return sum(pool.map(_synth_shard, jobs))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dup-frac", type=float, default=0.1)
    ap.add_argument("--max-ids-per-hash", type=int, default=64)
    ap.add_argument("--arity", type=int, default=3,
                    help="landmark arity: 3 = the corpus-dedup scale path "
                         "(occupancy ~1 -> linear pair stage); 2 = the "
                         "query/lookup shape")
    ap.add_argument("--min-matches", type=int, default=200,
                    help="tone-like synthetic audio needs a far higher "
                         "threshold than real audio: measured planted min "
                         "838 vs spurious max 90 at 1k clips (see BASELINE)")
    args = ap.parse_args()

    out_dir = f"/tmp/changesetmd_stress_audio_{args.n}"
    t0 = time.time()
    planted = synth(out_dir, args.n, args.dup_frac)
    synth_s = time.time() - t0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from changesetmd_ray.stages.audio_fp import audio_neardup_candidates

    paths = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                   if f.endswith(".parquet"))
    ds = ray.data.read_parquet(
        paths, columns=["media_id", "media_type", "payload"],
        override_num_blocks=max(args.cpus, len(paths)))
    t1 = time.time()
    pairs = audio_neardup_candidates(
        ds, min_matches=args.min_matches, landmark_arity=args.arity,
        max_ids_per_hash=args.max_ids_per_hash).take_all()
    match_s = time.time() - t1

    k = max(2, int(round(1.0 / args.dup_frac))) if args.dup_frac > 0 else 0
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    hit = sum(1 for d in range(args.n)
              if k and d % k == k - 1 and (d - 1, d) in found)
    print(json.dumps(
        {
            "n_clips": args.n,
            "planted_pairs": planted,
            "recall": round(hit / max(planted, 1), 4),
            "pairs_found": len(pairs),
            "synth_sec": round(synth_s, 2),
            "match_sec": round(match_s, 2),
            "clips_per_sec": round(args.n / match_s, 1),
            "cpus": args.cpus,
        }
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
