"""Stable, vectorized text-hashing kernels (no Ray).

Everything is deterministic across processes and machines (no Python
``hash``): token hashes are ``crc32`` (zlib, C speed) spread to 64 bits
with splitmix64; shingles combine consecutive token hashes with
rotate-xor; MinHash permutations are the classic ``(a·x + b) mod p``
universal family on a 61-bit Mersenne prime.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)

TOKEN_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish segmentation (GPT-2-style classes, stdlib-re approximation):
# contractions, letter runs, digit runs, other-symbol runs
BPE_RE = re.compile(r"'(?:s|d|m|t|ll|ve|re)\b|[^\W\d_]+|\d+|[^\w\s]+", re.UNICODE)


def splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        z = np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash_bytes64(data: bytes) -> int:
    """Stable 64-bit hash of a byte string (blake2b-8). An earlier
    build combined two salted crc32 halves, but crc32(b, s1) ^
    crc32(b, s2) is a constant that depends only on len(b) (crc is
    affine), so that construction had only 32-bit collision
    resistance between same-length inputs — a real digest instead."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8).digest(), "little")


def hash_bytes128(data: bytes) -> tuple[int, int]:
    """Stable 128-bit hash as two int64 halves (blake2b) — the exact-
    dedup content key: collision probability ~N²/2^129, negligible at
    any corpus size this engine targets."""
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little", signed=True)
    h2 = int.from_bytes(d[8:], "little", signed=True)
    return h1, h2


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (crc32 → splitmix spread)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    raw = np.fromiter((zlib.crc32(t.encode("utf-8")) for t in tokens), np.uint64, len(tokens))
    return splitmix64(raw)


def token_hashes64(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token with FULL 64-bit collision resistance
    (blake2b-8 per distinct token, np.unique-cached). For operators
    that DELETE content on equality of hashes built from token hashes
    (span dedup): crc32→splitmix keeps only 32 bits of entropy per
    token (splitmix64 is a bijection), so two windows identical except
    one crc-colliding token pair would spuriously share a fingerprint
    — thousands of such pairs exist at web-scale vocabulary. Signal
    uses (MinHash/SimHash similarity estimates) keep the cheaper crc
    chain in :func:`token_hashes`."""
    import hashlib

    if not tokens:
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    uh = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            for t in uniq
        ),
        np.uint64,
        len(uniq),
    )
    return uh[inv]


def md5_token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token: the high 64 bits of md5 — the SQL-
    expressible token hash (DuckDB: ``('0x'||substr(md5(t),1,16))::ubigint``),
    used by the oracled SimHash configuration so the fingerprints —
    and therefore the exact Hamming-≤-t pair set — reproduce in pure
    SQL. Slower than crc32+splitmix (one digest per distinct token,
    cached via np.unique), so it is opt-in, not the default."""
    import hashlib

    if not tokens:
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    uh = np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in uniq),
        np.uint64, len(uniq),
    )
    return uh[inv]


def shingle_hashes(tok_h: np.ndarray, w: int = 3) -> np.ndarray:
    """uint64 hash per w-token shingle (rotate-xor combine, then mix).
    Docs shorter than ``w`` tokens hash their full token sequence as the
    single shingle (so short docs still dedup)."""
    n = len(tok_h)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < w:
        acc = np.uint64(0)
        for i, h in enumerate(tok_h):
            acc ^= np.uint64(h) << np.uint64((i * 7) % 57)
        return splitmix64(np.array([acc], dtype=np.uint64))
    acc = tok_h[: n - w + 1].copy()
    for j in range(1, w):
        part = tok_h[j : n - w + 1 + j]
        shift = np.uint64((j * 7) % 57)
        acc = acc ^ ((part << shift) | (part >> (np.uint64(64) - shift)))
    return splitmix64(acc)


def char_ngram_hashes(text: str, n: int = 5) -> np.ndarray:
    """uint64 hash per char n-gram of the lowercased text (for n-gram
    Jaccard). Short texts yield a single whole-text gram."""
    b = text.lower().encode("utf-8")
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(b) <= n:
        return splitmix64(np.array([zlib.crc32(b)], dtype=np.uint64))
    raw = np.fromiter(
        (zlib.crc32(b[i : i + n]) for i in range(len(b) - n + 1)), np.uint64, len(b) - n + 1
    )
    return splitmix64(raw)


def minhash_params(n_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), n_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (len = n_perm). Empty input → all-max sentinel.

    ``(a·x + b) mod (2^61−1)`` computed in uint64: the product is taken
    mod 2^64 which is NOT the Mersenne mod — but it is a fixed
    deterministic universal-ish mix applied identically to both docs, so
    collision statistics (what MinHash needs) are preserved; this is the
    standard fast-path trade-off.
    """
    n_perm = len(a)
    if len(hashes) == 0:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.unique(hashes)  # set semantics
    with np.errstate(over="ignore"):
        v = (x[None, :] * a[:, None] + b[:, None]) & _MERSENNE
    return v.min(axis=1)


def band_keys(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """LSH band hash per band: uint64 key mixing the band index in, so
    the same values in different bands never collide."""
    r = len(sig) // n_bands
    bands = sig[: n_bands * r].reshape(n_bands, r)
    acc = np.zeros(n_bands, dtype=np.uint64)
    for j in range(r):
        acc = splitmix64(acc ^ bands[:, j])
    return splitmix64(acc ^ (np.arange(n_bands, dtype=np.uint64) << np.uint64(56)))


def band_keys_matrix(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(m × n_bands) band keys for a signature MATRIX (m × n_perm) —
    the whole-bucket vectorized form of :func:`band_keys` (identical
    values, r fused passes instead of one call per row)."""
    m, n_perm = sigs.shape
    r = n_perm // n_bands
    bands = sigs[:, : n_bands * r].reshape(m, n_bands, r)
    acc = np.zeros((m, n_bands), dtype=np.uint64)
    for j in range(r):
        acc = splitmix64(acc ^ bands[:, :, j])
    return splitmix64(acc ^ (np.arange(n_bands, dtype=np.uint64) << np.uint64(56)))


def simhash64(tok_h: np.ndarray) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if len(tok_h) == 0:
        return 0
    bits = ((tok_h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    score = bits.sum(axis=0) * 2 - len(tok_h)
    fp = np.bitwise_or.reduce(
        (score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
    )
    return int(fp)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays (SWAR
    popcount — uint64-sized temporaries only; the byte-unpack form
    allocates 8× the input, which faults slowly at pair-kernel sizes)."""
    x = np.bitwise_xor(np.atleast_1d(a).astype(np.uint64), np.atleast_1d(b).astype(np.uint64))
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Boundary indices of equal-key runs in a SORTED key array:
    ``[0, …run starts…, len]`` — segment ``g`` is
    ``sorted_keys[out[g]:out[g+1]]``. The ONE segment-boundary idiom
    (five hand-rolled copies before this helper)."""
    if len(sorted_keys) == 0:
        return np.zeros(1, dtype=np.int64)
    return np.concatenate(
        [[0], np.nonzero(sorted_keys[1:] != sorted_keys[:-1])[0] + 1, [len(sorted_keys)]]
    ).astype(np.int64)


def hash_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """int64 bucket id in ``[0, num_buckets)`` for integer keys — the
    ONE splitmix-mask bucket-tag idiom (``num_buckets`` must be a power
    of two; validate once with :func:`check_pow2` at operator entry)."""
    return (
        splitmix64(np.asarray(keys).astype(np.uint64)) & np.uint64(num_buckets - 1)
    ).astype(np.int64)


def check_pow2(n: int, name: str = "num_buckets") -> None:
    """Guard for ``& (n-1)`` bucket masks: a non-power-of-two silently
    collapses part of the bucket space (correct results, skewed groups)."""
    if n <= 0 or n & (n - 1):
        raise ValueError(f"{name} must be a power of two (got {n}): the bucket "
                         f"mask `& ({name}-1)` silently collapses other values")


def eq_count_pairs(matT: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Per-pair count of equal columns between rows ``px`` and ``py`` of
    the matrix whose TRANSPOSE is ``matT`` (shape ``(n_cols, m)``,
    C-contiguous — transpose ONCE per bucket, not per pair block).
    Column-at-a-time so temporaries stay at ``len(px) × 8`` bytes (a
    single 2-D row-gather allocates ``len(px) × n_cols × 8``, which
    page-faults ~30× slower at multi-GB sizes)."""
    cnt = np.zeros(len(px), dtype=np.uint16)
    for col in matT:
        cnt += col[px] == col[py]
    return cnt


def any_eq_pairs(matT: np.ndarray, px: np.ndarray, py: np.ndarray, n_cols: int) -> np.ndarray:
    """Per-pair OR of column equality over the first ``n_cols`` columns
    of the matrix whose transpose is ``matT`` (same transpose-once and
    column-at-a-time rationale as :func:`eq_count_pairs`)."""
    out = np.zeros(len(px), dtype=bool)
    for col in matT[:n_cols]:
        out |= col[px] == col[py]
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two uint64 hash sets."""
    ua, ub = np.unique(a), np.unique(b)
    if len(ua) == 0 and len(ub) == 0:
        return 1.0
    inter = len(np.intersect1d(ua, ub, assume_unique=True))
    return inter / (len(ua) + len(ub) - inter)
