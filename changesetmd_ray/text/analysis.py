"""Text analysis stages: language-ID, quality scoring, token counting,
winnowing fingerprints (north_rule training-data operators).

All are batch UDFs over Arrow string columns. The quality/token kernels
are written so their oracle-checkable parts reproduce exactly in ANSI
SQL (DuckDB): whitespace token counts, char counts and integer ratios
use the same definitions on both sides (see ``__ray_entry__.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from changesetmd_ray.text.hashing import BPE_RE, hash_bytes64, splitmix64

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
    are folded once per actor (T2 pattern) into a union vocabulary +
    (word x lang) membership matrix so the batch path is one Arrow
    regex split + one ``index_in`` + cumsum arithmetic — no per-doc
    Python. Output is bit-identical to the original per-doc loop
    (verified over sf0.1 + unicode probes; the RE2 class
    ``[^\\p{L}\\p{N}_]+`` splits exactly where Python ``\\w+`` finds
    token boundaries on these corpora); measured ~1.5-2x the loop at
    5 k docs / 1.5 MB. Docs with zero regex tokens (CJK snippets,
    empty/null) take the original character-containment fallback."""

    # RE2 complement of Python re's \w (utf8): letters, numbers, underscore
    SPLIT_PATTERN = r"[^\p{L}\p{N}_]+"

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.markers = {lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items()}
        self.langs = list(_LANG_MARKERS)
        vocab: list[str] = []
        w2i: dict[str, int] = {}
        rows: list[np.ndarray] = []
        for li, lang in enumerate(self.langs):
            for w in _LANG_MARKERS[lang]:
                if w not in w2i:
                    w2i[w] = len(vocab)
                    vocab.append(w)
                    rows.append(np.zeros(len(self.langs), np.int64))
                rows[w2i[w]][li] = 1
        # last row = miss (index_in null -> len(vocab))
        self.memb = np.vstack(rows + [np.zeros(len(self.langs), np.int64)])
        self.vocab = pa.array(vocab, pa.string())
        self.lang_arr = np.array(self.langs)

    def _fallback(self, t: str | None) -> tuple[str, float]:
        # CJK has no \w-delimited tokens in some snippets: fall back
        # to character containment over the single-char markers
        chars = set(t or "")
        best, bs = "und", 0.0
        for lang, ws in self.markers.items():
            s = sum(1 for w in ws if len(w) == 1 and w in chars)
            if s > bs:
                best, bs = lang, float(s)
        return (best if bs > 0 else "und"), bs

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col].combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(col), pattern=self.SPLIT_PATTERN)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = np.asarray(lists.offsets, dtype=np.int64)
        vals = lists.values
        nonempty = pc.not_equal(vals, "").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = (
            pc.index_in(vals, value_set=self.vocab)
            .fill_null(len(self.vocab))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        hits = self.memb[idx]                      # (n_vals, n_langs)
        c_tok = np.concatenate([[0], np.cumsum(nonempty)])
        c_hits = np.vstack([np.zeros(len(self.langs), np.int64),
                            np.cumsum(hits, axis=0)])
        lo, hi = offs[:-1], offs[1:]
        n_tok = c_tok[hi] - c_tok[lo]
        doc_hits = c_hits[hi] - c_hits[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            sc = doc_hits / n_tok[:, None]
        best = np.argmax(sc, axis=1)               # ties -> first = list order
        bs = sc[np.arange(len(n_tok)), best]
        preds = np.where(bs > 0, self.lang_arr[best], "und").astype(object)
        scores = np.where(bs > 0, bs, 0.0)
        empties = np.nonzero(n_tok == 0)[0]
        if len(empties):
            texts = col.take(pa.array(empties)).to_pylist()
            for pos, t in zip(empties, texts):
                preds[pos], scores[pos] = self._fallback(t)
        return batch.append_column(
            self.out_col, pa.array(preds, pa.string())
        ).append_column(self.out_col + "_score", pa.array(scores, pa.float64()))


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
    """Actor stage: appends ``n_tokens_bpe`` (BPE-ish regex
    segmentation) next to the vectorized whitespace count. One Arrow
    ``count_substring_regex`` pass — RE2, the SAME engine the DuckDB
    oracle's ``regexp_extract_all`` uses, so engine ≡ oracle on ALL
    inputs by construction. Semantics note: RE2's ``\\w`` is ASCII, so
    on non-ASCII words this counts letter-runs-plus-symbol-runs where
    Python ``re`` counted one Unicode word ("não" = 3 vs 1); identical
    on ASCII text (verified equal to ``re.findall`` over sf0.1 +
    contraction/dash probes, ~2.5x faster). The RE2 side is chosen
    deliberately — the count is a heuristic and the oracle is the
    authoritative comparator."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pattern = BPE_RE.pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = pc.fill_null(  # null texts count 0 (loop treated None as "")
            pc.cast(pc.count_substring_regex(
                batch[self.text_col], pattern=self.pattern), pa.int64()),
            0,
        )
        return batch.append_column("n_tokens_bpe", counts)


def _crc32_table() -> np.ndarray:
    table = np.empty(256, np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table[i] = c
    return table


_CRC32_TABLE = _crc32_table()


def crc32_windows(data: bytes, k: int) -> np.ndarray:
    """zlib.crc32 of every k-byte sliding window of ``data`` in ONE
    vectorized pass (k table-lookup steps over the window array
    instead of one Python zlib call per window — bit-identical,
    unit-tested against zlib, ~5-8x faster at fingerprint sizes)."""
    a = np.frombuffer(data, np.uint8)
    n = len(a) - k + 1
    crc = np.full(n, 0xFFFFFFFF, np.uint32)
    for j in range(k):
        crc = (crc >> np.uint32(8)) ^ _CRC32_TABLE[(crc ^ a[j:j + n]) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


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
        norms = [" ".join((t or "").lower().split()).encode("utf-8") for t in texts]
        out = np.empty(len(texts), dtype=np.uint64)

        if self.gram_hash == "md5":
            # per-doc path: the SQL-reproducible oracle configuration —
            # md5-per-unique-gram dominates, batching the window math
            # around it wouldn't move the wall
            for i, norm in enumerate(norms):
                if len(norm) < self.k:
                    out[i] = np.uint64(int(hashlib.md5(norm).hexdigest()[:16], 16))
                    continue
                grams = self._md5_grams(norm)
                if len(grams) >= self.w:
                    idx = (np.arange(len(grams) - self.w + 1)[:, None]
                           + np.arange(self.w)[None, :])
                    mins = grams[idx].min(axis=1)
                else:
                    mins = grams
                out[i] = np.bitwise_xor.reduce(np.unique(mins))
            return batch.append_column(
                "fingerprint", pa.array(out.astype(np.int64), pa.int64()))

        # crc32 mode (the production default): batch-vectorized — ONE
        # crc pass over the concatenated batch, ONE global sliding-min,
        # per-doc unique+xor via lexsort/reduceat. Bit-identical to the
        # per-doc loop (unit-pinned); ~4x at 5 k docs / 1.5 MB, and the
        # per-doc numpy call overhead no longer scales with doc count.
        k, w = self.k, self.w
        long_idx = np.array(
            [i for i, nb in enumerate(norms) if len(nb) >= k], np.int64)
        for i, nb in enumerate(norms):
            if len(nb) < k:
                out[i] = np.uint64(hash_bytes64(nb))
        if len(long_idx):
            lens = np.array([len(norms[i]) for i in long_idx], np.int64)
            buf = b"".join(norms[i] for i in long_idx)
            ends = np.cumsum(lens)
            starts = ends - lens
            # cross-doc windows exist in `grams` but are never selected:
            # doc d's grams are global positions [starts[d], starts[d]+ngrams[d])
            grams = splitmix64(crc32_windows(buf, k).astype(np.uint64))
            ngrams = lens - k + 1
            vals_parts, owner_parts = [], []
            windowed = np.nonzero(ngrams >= w)[0]
            if len(windowed) and len(grams) >= w:
                sw_min = np.lib.stride_tricks.sliding_window_view(
                    grams, w).min(axis=1)
                counts = ngrams[windowed] - w + 1
                total = int(counts.sum())
                coff = np.concatenate([[0], np.cumsum(counts)[:-1]])
                base = np.repeat(starts[windowed], counts)
                intra = np.arange(total) - np.repeat(coff, counts)
                vals_parts.append(sw_min[base + intra])
                owner_parts.append(np.repeat(windowed, counts))
            for d in np.nonzero(ngrams < w)[0]:  # rare: < k+w-1 bytes
                vals_parts.append(grams[starts[d]:starts[d] + ngrams[d]])
                owner_parts.append(np.full(ngrams[d], d, np.int64))
            vals = np.concatenate(vals_parts)
            owner = np.concatenate(owner_parts)
            order = np.lexsort((vals, owner))
            v, o = vals[order], owner[order]
            keep = np.ones(len(v), bool)
            keep[1:] = (o[1:] != o[:-1]) | (v[1:] != v[:-1])
            v, o = v[keep], o[keep]
            seg = np.concatenate([[0], np.nonzero(o[1:] != o[:-1])[0] + 1])
            out[long_idx[o[seg]]] = np.bitwise_xor.reduceat(v, seg)
        return batch.append_column(
            "fingerprint", pa.array(out.astype(np.int64), pa.int64()))
