"""Text normalization — the first text-touching stage of every web
pipeline (C4/CCNet/FineWeb all run a variant before anything hashes
or filters): canonicalize unicode so later exact/near-dup hashing
sees "café" and "café" (NFC vs NFD) as the same bytes, and strip the
control/zero-width characters HTML extraction leaves behind.

The regex stages are COMPILED Arrow kernels
(``pc.replace_substring_regex``). Unicode normalization can NOT use
``pc.utf8_normalize``: pyarrow 16.1's kernel decomposes but never
recomposes (its "NFC" emits NFD, "NFKC" emits NFKD — verified), so
composition runs through ``unicodedata.normalize`` behind a
vectorized ``pc.string_is_ascii`` fast path — ASCII strings (the bulk
of web text) never leave Arrow, and only the non-ASCII minority pays
the C-accelerated Python call. The reference (an XML loader)
has no counterpart; this is a training-data-layer operator.

Knobs mirror the common recipes:

- ``form``: unicode normalization form (NFC default; NFKC folds
  compatibility characters — ligatures, full-width forms — the
  aggressive choice some tokenizers want).
- ``strip_control``: remove C0/C1 controls (except ``\\t \\n \\r``),
  DEL, zero-width (ZWSP/ZWNJ/ZWJ/BOM) and bidi-mark characters.
- ``collapse_lines``: cap runs of 3+ newlines at 2 (paragraph breaks
  survive, vertical noise doesn't).
- ``collapse_spaces``: fold runs of spaces/tabs to one space.
- ``trim``: strip leading/trailing whitespace.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

def _unicode_normalize(col, form: str):
    """unicodedata.normalize with an is_ascii fast path (ASCII is
    invariant under every normalization form)."""
    import unicodedata

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ascii_mask = pc.string_is_ascii(arr)
    if pc.all(ascii_mask).as_py():
        return arr
    vals = arr.to_pylist()
    mask = ascii_mask.to_pylist()
    out = [
        v if v is None or a else unicodedata.normalize(form, v)
        for v, a in zip(vals, mask)
    ]
    return pa.array(out, pa.string())


# C0 (minus \t\n\r), DEL + C1, zero-width + bidi marks + BOM
# (RE2 syntax: unicode escapes are \x{...}, not \uXXXX)
_CONTROL_RE = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x{009f}"
    "\\x{200b}-\\x{200f}\\x{feff}]"
)


def normalize_batch(
    col: pa.ChunkedArray | pa.Array,
    *,
    form: str = "NFC",
    strip_control: bool = True,
    collapse_lines: bool = True,
    collapse_spaces: bool = False,
    trim: bool = True,
):
    """Normalization of one string column (nulls pass through
    untouched). See the module docstring for the ASCII fast path."""
    out = _unicode_normalize(col, form)
    if strip_control:
        out = pc.replace_substring_regex(
            out, pattern=_CONTROL_RE, replacement="")
    if collapse_lines:
        out = pc.replace_substring_regex(
            out, pattern="\\n{3,}", replacement="\n\n")
    if collapse_spaces:
        out = pc.replace_substring_regex(
            out, pattern="[ \\t]+", replacement=" ")
    if trim:
        out = pc.utf8_trim_whitespace(out)
    return out


def normalize_text(
    ds,
    *,
    text_col: str = "text",
    form: str = "NFC",
    strip_control: bool = True,
    collapse_lines: bool = True,
    collapse_spaces: bool = False,
    trim: bool = True,
):
    """Corpus → corpus with ``text_col`` normalized in place. Pure
    map stage: fuses, streams, never shuffles."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index(text_col),
            text_col,
            normalize_batch(
                batch[text_col], form=form, strip_control=strip_control,
                collapse_lines=collapse_lines,
                collapse_spaces=collapse_spaces, trim=trim,
            ),
        )

    return ds.map_batches(fn, batch_format="pyarrow")
