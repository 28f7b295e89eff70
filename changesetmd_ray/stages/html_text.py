"""HTML → text extraction — the first stage of every web-curation
pipeline (trafilatura/jusText's role, reduced to a dependency-free
vectorized core).

Extraction convention (pinned by tests/test_html_text.py):

1. ``<script>`` / ``<style>`` / ``<noscript>`` elements removed with
   their CONTENT (case-insensitive, ``(?s)`` non-greedy), comments
   (``<!-- -->``) and CDATA blocks removed;
2. block-level closing/opening tags (``p, div, br, li, tr, h1-h6,
   table, section, article, blockquote``) become newlines so visual
   line structure survives for the line-dedup stage;
3. every remaining tag stripped;
4. the five XML core entities + common web entities (``&nbsp; &amp;
   &lt; &gt; &quot; &#39; &apos; &mdash; &ndash; &hellip; &copy;``)
   decoded with Arrow kernels; rows still containing entity syntax
   (numeric ``&#…;`` or other named) take a narrow Python
   ``html.unescape`` pass — only those rows pay;
5. whitespace normalized: runs of blank collapse to one space, ≥2
   newlines collapse to exactly two (paragraph break), lines trimmed.

Everything except step 4's fallback runs as compiled RE2 Arrow kernels
over the column — no Python row loop on the hot path. This is a
LAYOUT-text extractor, not a boilerplate classifier: readability
scoring / main-content detection belongs to the quality stages
downstream (text/analysis.py, text/classifier.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# element content that must vanish entirely
_CONTENT_ELEMENTS = ("script", "style", "noscript")

# tags whose boundary implies a line break
_BLOCK_TAGS = ("p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4",
               "h5", "h6", "table", "section", "article", "blockquote",
               "ul", "ol", "header", "footer", "pre")

_NAMED_ENTITIES = (
    # &amp; decodes to the \x03 SENTINEL, restored to "&" only after
    # the html.unescape fallback — single-decode semantics: a
    # double-encoded "&amp;lt;" must yield the literal text "&lt;",
    # never "<" (the ampersand an &amp; produces is DATA, not markup)
    ("&nbsp;", " "), ("&amp;", "\x03"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&mdash;", "—"),
    ("&ndash;", "–"), ("&hellip;", "…"), ("&copy;", "©"),
)


def html_to_text_array(html, *, paragraphs: bool = True) -> pa.Array:
    """Extract display text per row (see module docstring). ``html``
    may be a string or binary array (binary is cast with utf-8
    replacement semantics via cast-to-string)."""
    s = html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = pc.cast(s, pa.string())
    # raw control bytes that collide with the internal sentinels are
    # crawl noise — drop them so they can't inject breaks or ampersands
    s = pc.replace_substring_regex(s, pattern="[\x01\x02\x03]+", replacement=" ")
    for el in _CONTENT_ELEMENTS:
        s = pc.replace_substring_regex(
            s, pattern=rf"(?is)<{el}\b[^>]*>.*?</{el}\s*>", replacement=" ")
    s = pc.replace_substring_regex(
        s, pattern=r"(?s)<!--.*?-->", replacement=" ")
    s = pc.replace_substring_regex(
        s, pattern=r"(?s)<!\[CDATA\[.*?\]\]>", replacement=" ")
    # break semantics via sentinels (true-HTML whitespace model: SOURCE
    # newlines render as spaces; only tag boundaries make line breaks).
    # \x02 = paragraph break (closing </p>), \x01 = line break (any
    # other block-tag boundary); runs collapse so </div><div> is ONE
    # line break and any run touching a </p> is one paragraph break.
    s = pc.replace_substring_regex(
        s, pattern=r"(?i)</p\s*>", replacement="\x02")
    block = "|".join(_BLOCK_TAGS)
    s = pc.replace_substring_regex(
        s, pattern=rf"(?i)</?(?:{block})\b[^>]*>", replacement="\x01")
    s = pc.replace_substring_regex(s, pattern=r"(?s)<[^>]*>", replacement=" ")
    for ent, rep in _NAMED_ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=rep)
    # narrow fallback: rows that STILL carry entity syntax go through
    # html.unescape — dictionary-style, only matching rows pay Python
    leftover = pc.match_substring_regex(s, r"&(?:#[0-9xX]|[A-Za-z]+;)")
    if pc.any(leftover).as_py():
        import html as _html

        import numpy as np

        vals = s.to_pylist()
        mask = leftover.to_numpy(zero_copy_only=False)
        idx = np.nonzero(np.asarray(mask, bool))[0]
        for i in idx:
            if vals[i] is not None:
                vals[i] = _html.unescape(vals[i])
        s = pa.array(vals, pa.string())
    s = pc.replace_substring(s, pattern="\x03", replacement="&")
    # whitespace normalization: all source whitespace (incl. newlines)
    # is a single space; sentinel runs collapse, \x02 dominates
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.replace_substring_regex(
        s, pattern=r"[ \x01\x02]*\x02[ \x01\x02]*", replacement="\x02")
    s = pc.replace_substring_regex(
        s, pattern=r"[ ]*\x01[ \x01]*", replacement="\x01")
    s = pc.replace_substring(
        s, pattern="\x02", replacement="\n\n" if paragraphs else "\n")
    s = pc.replace_substring(s, pattern="\x01", replacement="\n")
    s = pc.replace_substring_regex(
        s, pattern=r"^[\s]+|[\s]+$", replacement="")
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def html_to_text(ds, *, html_col: str = "html", out_col: str = "text",
                 paragraphs: bool = True):
    """Append the extracted-text column."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, html_to_text_array(batch[html_col], paragraphs=paragraphs))
    return ds.map_batches(fn, batch_format="pyarrow")


def warc_to_pages(paths: list[str], *, batch_rows: int = 256,
                  default_lang: str | None = None):
    """Real-crawl glue: WARC files → the full input_hint pages table
    ``(url, warc_ts, html, text, lang)`` — html cast to string, text
    via :func:`html_to_text_array`, lang predicted by the n-gram LangId
    stage (or fixed with ``default_lang``). The result feeds
    ``run_flagship`` / ``curate`` directly."""
    from changesetmd_ray.sources.warc import read_warc_pages

    def derive(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch["html"], pa.string())
        text = html_to_text_array(html)
        out = pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "html": html,
                "text": text,
            }
        )
        if default_lang is not None:
            return out.append_column(
                "lang", pa.array([default_lang] * len(out), pa.string()))
        from changesetmd_ray.text.analysis import LangId

        lang = LangId(text_col="text", out_col="lang")(out)["lang"]
        return out.append_column("lang", lang)

    return read_warc_pages(paths, batch_rows=batch_rows).map_batches(
        derive, batch_format="pyarrow")
