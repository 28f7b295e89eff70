"""Text analysis stages: language-ID, quality scoring, token counting,
winnowing fingerprints (north_rule training-data operators).

All are batch UDFs over Arrow string columns. The quality/token kernels
are written so their oracle-checkable parts reproduce exactly in ANSI
SQL (DuckDB): whitespace token counts, char counts and integer ratios
use the same definitions on both sides (see ``__ray_entry__.py``).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from changesetmd_ray.text.hashing import BPE_RE, hash_bytes64, splitmix64, tokenize

# Tiny per-language stopword marker sets — a deterministic n-gram/stopword
# heuristic (not a model; the container has no ML libs). Order matters:
# scores tie-break by list order.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es": ("el", "la", "los", "las", "es", "que", "para", "con", "una", "por"),
    "pl": ("nie", "jest", "się", "na", "do", "i", "z", "że", "po", "jak"),
    "pt": ("não", "uma", "que", "para", "com", "os", "as", "do", "da", "em"),
    "it": ("il", "che", "di", "è", "per", "con", "una", "non", "sono", "della"),
    "nl": ("de", "het", "een", "en", "van", "is", "dat", "niet", "met", "op"),
    "ru": ("и", "в", "не", "на", "что", "это", "как", "по", "но", "из"),
    "ja": ("の", "に", "は", "を", "た", "が", "で", "て", "と", "です"),
}


class LangId:
    """Actor stage: appends ``lang_pred`` + ``lang_score``. Marker sets
    are folded into frozensets once per actor (T2 pattern)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.markers = {lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        preds, scores = [], []
        for t in texts:
            toks = tokenize(t or "")
            if not toks:
                # CJK has no \w-delimited tokens in some snippets: fall
                # back to character containment
                chars = set(t or "")
                best, bs = "und", 0.0
                for lang, ws in self.markers.items():
                    s = sum(1 for w in ws if len(w) == 1 and w in chars)
                    if s > bs:
                        best, bs = lang, float(s)
                preds.append(best if bs > 0 else "und")
                scores.append(bs)
                continue
            best, bs = "und", 0.0
            for lang, ws in self.markers.items():
                hits = sum(1 for w in toks if w in ws)
                s = hits / len(toks)
                if s > bs:
                    best, bs = lang, s
            preds.append(best if bs > 0 else "und")
            scores.append(bs)
        return batch.append_column(self.out_col, pa.array(preds, pa.string())).append_column(
            self.out_col + "_score", pa.array(scores, pa.float64())
        )


def quality_features(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Vectorized quality features (Arrow kernels, SQL-reproducible):

    - ``n_chars``       — length(text)
    - ``n_tokens_ws``   — whitespace-delimited token count
    - ``n_punct``       — count of ``.,;:!?`` characters
    - ``n_digits``      — count of 0-9 characters
    - ``quality_ok``    — the Gopher-style keep rule used here:
      50 ≤ n_chars AND n_tokens_ws ≥ 10 AND punct ratio ≤ 0.1
    """
    col = batch[text_col]
    n_chars = pc.utf8_length(col)
    # whitespace token count = count of space-runs in trimmed text + 1 (0 for empty)
    # trim SPACES only — the SQL oracle's trim() (DuckDB) removes only
    # ' ' while Arrow's utf8_trim_whitespace strips all Unicode
    # whitespace, which diverges on texts with edge tabs/newlines
    trimmed = pc.utf8_trim(col, characters=" ")
    runs = pc.count_substring_regex(trimmed, r"\s+")
    nonempty = pc.not_equal(pc.utf8_length(trimmed), 0)
    n_tokens = pc.if_else(nonempty, pc.add(runs, 1), 0)
    n_punct = pc.count_substring_regex(col, r"[.,;:!?]")
    n_digits = pc.count_substring_regex(col, r"[0-9]")
    ok = pc.and_(
        pc.and_(pc.greater_equal(n_chars, 50), pc.greater_equal(n_tokens, 10)),
        pc.less_equal(
            pc.cast(n_punct, pa.float64()),
            pc.multiply(pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()), 0.1),
        ),
    )
    for name, arr in (
        ("n_chars", pc.cast(n_chars, pa.int64())),
        ("n_tokens_ws", pc.cast(n_tokens, pa.int64())),
        ("n_punct", pc.cast(n_punct, pa.int64())),
        ("n_digits", pc.cast(n_digits, pa.int64())),
        ("quality_ok", ok),
    ):
        # input tables may already carry a column of the same name
        # (e.g. the testdata documents table has n_chars): replace it
        idx = batch.schema.get_field_index(name)
        batch = batch.set_column(idx, name, arr) if idx != -1 else batch.append_column(name, arr)
    return batch


class TokenCount:
    """Actor stage: appends ``n_tokens_bpe`` (BPE-ish regex segmentation,
    compiled once per actor) next to the vectorized whitespace count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pattern = BPE_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts = np.fromiter(
            (len(self.pattern.findall(t or "")) for t in texts), np.int64, len(texts)
        )
        return batch.append_column("n_tokens_bpe", pa.array(counts, pa.int64()))


class Fingerprint:
    """Winnowing document fingerprint (Schleimer et al., MOSS): k-gram
    rolling hashes, min per sliding window of w, xor-folded to one
    uint64 per document → ``fingerprint`` column. Whitespace-normalized
    lowercased text so reformatting doesn't change the fingerprint."""

    def __init__(self, text_col: str = "text", k: int = 8, w: int = 4,
                 gram_hash: str = "crc32"):
        if gram_hash not in ("crc32", "md5"):
            raise ValueError(f"gram_hash must be 'crc32' or 'md5', got {gram_hash!r}")
        self.text_col = text_col
        self.k = k
        self.w = w
        # "md5": high-64 md5 per gram — the SQL-reproducible
        # configuration (DuckDB substr+md5 per position); "crc32" is
        # the fast default (crc32 → splitmix spread)
        self.gram_hash = gram_hash

    def _md5_grams(self, norm: bytes) -> np.ndarray:
        import hashlib

        n = len(norm) - self.k + 1
        grams = [norm[j : j + self.k] for j in range(n)]
        uniq, inv = np.unique(np.asarray(grams, dtype=object), return_inverse=True)
        uh = np.fromiter(
            (int(hashlib.md5(g).hexdigest()[:16], 16) for g in uniq),
            np.uint64, len(uniq),
        )
        return uh[inv]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        texts = batch[self.text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            norm = " ".join((t or "").lower().split()).encode("utf-8")
            if len(norm) < self.k:
                out[i] = (
                    np.uint64(int(hashlib.md5(norm).hexdigest()[:16], 16))
                    if self.gram_hash == "md5"
                    else np.uint64(hash_bytes64(norm))
                )
                continue

            if self.gram_hash == "md5":
                grams = self._md5_grams(norm)
            else:
                grams = np.fromiter(
                    (zlib.crc32(norm[j : j + self.k]) for j in range(len(norm) - self.k + 1)),
                    np.uint64,
                    len(norm) - self.k + 1,
                )
                grams = splitmix64(grams)
            if len(grams) >= self.w:
                idx = np.arange(len(grams) - self.w + 1)[:, None] + np.arange(self.w)[None, :]
                mins = grams[idx].min(axis=1)
            else:
                mins = grams
            out[i] = np.bitwise_xor.reduce(np.unique(mins))
        return batch.append_column("fingerprint", pa.array(out.astype(np.int64), pa.int64()))
