"""Adversarial-skew stress for the curation recipe (VERDICT r4 item 7).

Synthesizes a corpus = sf0.1 documents replicated ``--mult`` times with
two planted pathologies a real web crawl exhibits:

- **one domain owns 50 % of rows** (``spam.example.com``) — stresses the
  domain_cap thin-projection groupby on a single hot key;
- **one near-duplicate cluster owns 10 % of the corpus** (a shared
  ~120-word passage + one per-row unique token, so exact dedup keeps
  every member and MinHash must resolve ONE corpus-sized component
  through the hot-band star guard and cluster propagation);
- **20 % of rows are tracking-param recrawls** (same canonical url
  as the previous row behind utm/gclid params, an uppercase scheme,
  the default port and a fragment) — `url_dedup=True` must collapse
  them up front through `url_normalize` + the loser-broadcast exact
  dedup, before any text stage touches them.

Every other replica gets a unique text tail so replication itself does
not create exact duplicates. The corpus is written to /tmp parquet and
read back so the pipeline streams file-backed like production (and the
size-aware snapshot rule sees a real on-disk estimate).

Usage:  python tools/stress_curation.py [--mult 32] [--cpus 32]
        [--also-mult 8]   # second leg for sublinearity evidence

Prints one JSON line per leg with rows in/out and wall seconds.
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

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

# varied natural-ish English so the planted cluster passes the language,
# quality and Gopher-repetition gates and dies ONLY to MinHash
PASSAGE = (
    "The survey covers harbor towns along the northern coast where "
    "fishing crews report seasonal changes in water temperature and "
    "catch volume. Local councils fund small research stations that "
    "log tide heights, salinity readings and bird migration counts "
    "each morning. Volunteers maintain the older lighthouses, repair "
    "wooden piers after winter storms and guide school visits through "
    "the maritime museum. Trade records from the archive describe "
    "cargo manifests, insurance claims and the gradual shift from "
    "sail to steam. Modern ferries follow the same channels, though "
    "satellite navigation has replaced the chain of coastal beacons "
    "that once guided captains between the shoals at night."
)


def synth_corpus(out_dir: str, mult: int) -> int:
    """Write the skewed corpus as one parquet shard per replica."""
    base = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "text", "lang"])
    n = base.num_rows
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    texts0 = base["text"].to_pylist()
    langs0 = base["lang"]
    ids0 = np.asarray(base["doc_id"], dtype=np.int64)
    for m in range(mult):
        ids = ids0 + m * n
        texts, urls = [], []
        for j in range(n):
            did = int(ids[j])
            if did % 10 == 0:  # the 10 % near-dup cluster
                texts.append(f"{PASSAGE} u{did}")
            else:              # unique tail: no accidental exact dups
                texts.append(f"{texts0[j]} r{m} u{did}")
            host = ("spam.example.com" if did % 2 == 0
                    else f"host{j}.example.org")
            # every 5th row is a tracking-param RECRAWL of the row
            # before it (same canonical url; text differs only by the
            # unique tail) — url_dedup must collapse it before the
            # text stages ever see it
            if did % 5 == 4:
                urls.append(
                    f"HTTPS://{host}:443/p/{did - 1}?utm_source=feed&gclid=g{did}#top")
            else:
                urls.append(f"https://{host}/p/{did}")
        tbl = pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(texts, pa.string()),
            "lang": langs0,
            "url": pa.array(urls, pa.string()),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{m:04d}.parquet"))
    return n * mult


def run_leg(corpus_dir: str, rows_in: int, num_cpus: int, mult: int,
            semdedup: bool = False) -> dict:
    import ray
    import ray.data

    from changesetmd_ray.pipelines.curation import CurationConfig, curate

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    ds = ray.data.read_parquet(corpus_dir)
    t0 = time.perf_counter()
    cfg_kwargs = dict(domain_cap=100, url_dedup=True)
    if semdedup:
        cfg_kwargs.update(semdedup_threshold=0.95,
                          semdedup_kwargs={"n_clusters": 64})
    res = curate(
        ds, lang_col="lang", url_col="url",
        config=CurationConfig(**cfg_kwargs),
    )
    rows_out = res.dataset.count()
    secs = time.perf_counter() - t0
    return {
        "stress": "curation_skew", "mult": mult, "semdedup": semdedup, "num_cpus": num_cpus,
        "rows_in": rows_in, "rows_out": rows_out,
        "secs": round(secs, 2),
        "rows_per_sec": round(rows_in / secs, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=32)
    ap.add_argument("--also-mult", type=int, default=None,
                    help="optional second leg (e.g. 8) for sublinearity")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--semdedup", action="store_true",
                    help="enable the opt-in SemDeDup stage (hashed-JL "
                         "embed + cluster-bucketed sweep) in the recipe")
    args = ap.parse_args()

    import ray

    legs = [m for m in (args.also_mult, args.mult) if m]
    for mult in legs:
        corpus = f"/tmp/stress_curation_x{mult}"
        rows_in = synth_corpus(corpus, mult)
        try:
            out = run_leg(corpus, rows_in, args.cpus, mult, args.semdedup)
            print(json.dumps(out))
        finally:
            shutil.rmtree(corpus, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
