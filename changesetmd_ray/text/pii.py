"""PII detection + redaction — the privacy-scrub step of a web-scale
training-data pipeline (Dolma ships the same design: regex detectors
for email / phone / IP with ``|||EMAIL_ADDRESS|||``-style replacement
tokens; CCNet and RefinedWeb apply equivalent scrubs before training).

Reference analogue: none (training-data layer addition).

Scale shape: a pure per-batch map with NO Python row loop — detection
and replacement run entirely in Arrow's compiled re2 kernels
(``pc.count_substring_regex`` / ``pc.replace_substring_regex``), so
the stage is zero-copy in, vectorized through, and embarrassingly
parallel over 100 TB. No shuffle, no state.

Detectors are deliberately conservative (precision over recall — a
false positive mangles good training text):

- ``email``: RFC-ish local@domain.tld with a 2+ letter TLD.
- ``phone``: international/US shapes with ≥ 9 digits total
  (``+1 555 123 4567``, ``(555) 123-4567``, ``555-123-4567``) —
  anchored on separators so plain big numbers don't match.
- ``ipv4``: dotted quad with 0-255 octets, word-bounded.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# NOTE: Arrow's regex engine is re2 — no backreferences/lookbehind;
# patterns below stay inside re2's supported syntax.
PII_PATTERNS: dict[str, str] = {
    "email": r"\b[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}\b",
    # three explicit shapes (re2 has no lookahead to enforce a total
    # digit count): parenthesized area code, +country prefix, and the
    # bare NNN-NNN-NNNN form
    "phone": (
        r"(\+\d{1,3}[ .\-]?)?\(\d{2,4}\)[ .\-]?\d{3,4}([ .\-]\d{3,4}){1,2}\b"
        r"|\+\d{1,3}[ .\-]?\d{2,4}([ .\-]\d{3,4}){1,3}\b"
        r"|\b\d{3}[ .\-]\d{3}[ .\-]\d{4}\b"
    ),
    "ipv4": (
        r"\b(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
        r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}\b"
    ),
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "|||EMAIL_ADDRESS|||",
    "phone": "|||PHONE_NUMBER|||",
    "ipv4": "|||IP_ADDRESS|||",
}


def pii_features(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append ``n_<kind>`` match counts + ``has_pii`` (vectorized)."""
    col = batch[text_col]
    any_hits = None
    for kind, pattern in PII_PATTERNS.items():
        n = pc.cast(pc.count_substring_regex(col, pattern), pa.int64())
        name = f"n_{kind}"
        idx = batch.schema.get_field_index(name)
        batch = (
            batch.set_column(idx, name, n) if idx != -1
            else batch.append_column(name, n)
        )
        hit = pc.greater(n, 0)
        any_hits = hit if any_hits is None else pc.or_(any_hits, hit)
    idx = batch.schema.get_field_index("has_pii")
    batch = (
        batch.set_column(idx, "has_pii", any_hits) if idx != -1
        else batch.append_column("has_pii", any_hits)
    )
    return batch


def scrub_pii_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Replace every PII match in ``text_col`` with its redaction
    token, in place (kept order: email → phone → ipv4; an email's
    digits can't re-match phone AFTER redaction, so order only matters
    for overlapping raw spans, where first-listed wins)."""
    col = batch[text_col]
    for kind, pattern in PII_PATTERNS.items():
        col = pc.replace_substring_regex(
            col, pattern, REDACTION_TOKENS[kind]
        )
    idx = batch.schema.get_field_index(text_col)
    return batch.set_column(idx, text_col, col)


def scrub_pii(ds, *, text_col: str = "text"):
    """Dataset → Dataset with PII redacted (vectorized map, no state)."""
    return ds.map_batches(
        lambda b: scrub_pii_batch(b, text_col=text_col), batch_format="pyarrow"
    )
