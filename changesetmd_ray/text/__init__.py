"""Training-data text operators (north_rule additions; no reference
counterpart — the reference's analogue is its tags/PK machinery:
exact dedup ≙ the PK/upsert invariant, reference ``queries.py:41``,
``changesetmd.py:164-182``).

- :mod:`hashing`  — stable token/shingle/minhash/simhash kernels.
- :mod:`dedup`    — exact + MinHash-LSH + SimHash near-dup operators.
- :mod:`analysis` — language-ID, quality scoring, token counts,
  winnowing fingerprints.
- :mod:`ann`      — cosine top-k similarity search (brute-force exact +
  LSH-bucketed approximate).
- :mod:`semdedup` — SemDeDup cluster-bucketed semantic dedup.
- :mod:`classifier` — fastText-style hashed n-gram quality classifier
  (bounded driver-side training, broadcast weights, batched scoring).
- :mod:`domains`  — per-domain hygiene: host extraction, stats,
  suffix blocklist, per-domain cap.
- :mod:`bpe`      — BPE tokenizer: distributed word counts, driver
  training on the bounded frequency table, broadcast cached encode.
- :mod:`lm`       — byte-n-gram LM perplexity scoring (the CCNet
  quality signal): exact distributed counting, broadcast scoring.
- :mod:`linedup`  — CCNet/Dolma cross-document line/paragraph dedup
  (thin combined counting exchange; broadcast or bucketed rebuild).
- :mod:`spandup`  — Lee-et-al exact-substring span dedup via winnowed
  rolling fingerprints (alignment-robust, char-offset cuts).
- :mod:`normalize` — unicode NFC/NFKC + control/zero-width stripping
  (Arrow kernels + is_ascii fast path).
"""

from changesetmd_ray.text.dedup import (  # noqa: F401
    exact_dedup,
    hamming_candidates,
    minhash_lsh_candidates,
    simhash_candidates,
)
from changesetmd_ray.text.ann import ann_cosine_topk  # noqa: F401
from changesetmd_ray.text.semdedup import semdedup, semdedup_decisions  # noqa: F401
from changesetmd_ray.text.linedup import line_dedup  # noqa: F401
from changesetmd_ray.text.spandup import span_dedup  # noqa: F401
from changesetmd_ray.text.normalize import normalize_text  # noqa: F401
from changesetmd_ray.text.embed import embed_documents  # noqa: F401
from changesetmd_ray.text.domains import url_dedup, url_normalize  # noqa: F401
