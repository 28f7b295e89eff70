"""Per-domain corpus hygiene (C4 / RefinedWeb-style URL machinery,
north_rule addition): vectorized host extraction, combiner-first
per-domain statistics, blocklist filtering with subdomain-suffix
semantics, and a per-domain document cap.

All four compose from existing engine primitives:

- :func:`url_host` — pure Arrow-kernel host extraction (no Python
  row loop): scheme/userinfo strip → cut at ``/:?#`` → lowercase →
  optional ``www.`` strip. Appended as a scalar column, so any
  groupby/filter downstream reuses it.
- :func:`domain_stats` — per-block ``pa.Table.group_by`` partials
  (rows shrink to distinct-hosts-per-block BEFORE the exchange — the
  combiner-first rule, same as the engine's other wide aggregates),
  then one groupby over partials.
- :func:`blocklist_filter` — blocked set ``ray.put`` once; a host
  matches if it equals a blocked entry OR ends with ``"." + entry``
  (subdomain suffix, the C4 blocklist convention). The per-batch probe
  dictionary-encodes hosts so the Python suffix walk touches DISTINCT
  hosts only, and each distinct host probes the sorted blocked array
  with ``searchsorted`` per dot-suffix (≤ label-count probes, no scan).
- :func:`domain_cap` — anti-spam cap: at most ``max_per_host`` docs
  per host, survivors chosen deterministically by the engine's
  multiplicative key hash (layout-invariant). Two-phase so the full
  payload never shuffles: a THIN (host, key) projection groups per
  host and emits only the keys to DROP; the payload then anti-joins
  them through the size-gated membership join (broadcast below the
  limit, bucketed shuffle above).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
_USERINFO_RE = r"^[^/]*@"  # greedy: userinfo ends at the LAST @ before the path


def host_array(urls, *, strip_www: bool = True) -> pa.Array:
    """Host per url (Arrow kernels only). The host must be
    domain-shaped — dot-separated ``[A-Za-z0-9-]`` labels (covers
    IPv4 too) up to a ``/:?#`` delimiter or end — anything else
    (null, free text, single-label hosts, IPv6 brackets) → null.
    Fully anchored so RE2 needs no lookahead."""
    s = pc.replace_substring_regex(urls, pattern=_SCHEME_RE, replacement="")
    s = pc.replace_substring_regex(s, pattern=_USERINFO_RE, replacement="")
    ex = pc.extract_regex(
        s,
        pattern=r"^(?P<h>[A-Za-z0-9\-]+(?:\.[A-Za-z0-9\-]+)+)(?:[/:?#].*)?$",
    )
    h = pc.utf8_lower(pc.struct_field(ex, "h"))
    if strip_www:
        h = pc.replace_substring_regex(h, pattern=r"^www\.", replacement="")
    return h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h


def url_host(ds, *, url_col: str = "url", out_col: str = "host",
             strip_www: bool = True):
    """Append ``out_col`` with the lowercased host of ``url_col``."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, host_array(batch[url_col], strip_www=strip_www)
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def domain_stats(ds, *, url_col: str = "url", text_col: str | None = None,
                 strip_www: bool = True):
    """Per-host corpus stats → Dataset ``(host, n_docs[, total_chars])``.
    Hostless rows aggregate under null. Combiner-first: the exchange
    carries one row per (block, distinct host), never per document."""
    with_chars = text_col is not None

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"host": host_array(batch[url_col], strip_www=strip_www)}
        if with_chars:
            cols["chars"] = pc.cast(pc.utf8_length(batch[text_col]), pa.int64())
        t = pa.table(cols)
        aggs = [([], "count_all")] + ([("chars", "sum")] if with_chars else [])
        g = t.group_by("host", use_threads=False).aggregate(aggs)
        # Ray's sort exchange cannot compare null string keys: hostless
        # rows ride as "" (never a legal host — the extractor requires
        # a dot) and map back to null on output
        out = {"host": g["host"].combine_chunks().fill_null(""),
               "n_docs": g["count_all"]}
        if with_chars:
            out["total_chars"] = g["chars_sum"]
        return pa.table(out)

    def combine(group: pa.Table) -> pa.Table:
        h = group["host"][:1]
        if h[0].as_py() == "":
            h = pa.array([None], pa.string())
        out = {"host": h,
               "n_docs": pa.array([pc.sum(group["n_docs"]).as_py()], pa.int64())}
        if with_chars:
            out["total_chars"] = pa.array(
                [pc.sum(group["total_chars"]).as_py() or 0], pa.int64()
            )
        return pa.table(out)

    return (
        ds.select_columns([c for c in {url_col, text_col} if c])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .map_groups(combine, batch_format="pyarrow")
    )


def _blocked_probe(hosts_dict: list, blocked_sorted: np.ndarray) -> np.ndarray:
    """For each distinct host: blocked iff the host or any of its
    dot-suffixes is in the sorted blocked array."""
    out = np.zeros(len(hosts_dict), dtype=bool)
    for i, h in enumerate(hosts_dict):
        if h is None:
            continue
        probe = h
        while True:
            j = np.searchsorted(blocked_sorted, probe)
            if j < len(blocked_sorted) and blocked_sorted[j] == probe:
                out[i] = True
                break
            dot = probe.find(".")
            if dot < 0:
                break
            probe = probe[dot + 1 :]
    return out


def blocklist_filter(ds, blocked_hosts, *, url_col: str = "url",
                     strip_www: bool = True, invert: bool = False):
    """Drop rows whose host matches the blocklist (exact host or any
    parent domain: ``ads.example.com`` matches entry ``example.com``).
    ``invert=True`` keeps ONLY matches (audit mode). Hostless rows are
    kept (nothing to match — same null semantics as the anti joins).
    The blocklist is normalized+sorted once and ``ray.put`` once."""
    arr = np.unique(np.asarray(
        [h.lower().lstrip(".").removeprefix("www.") if strip_www else h.lower().lstrip(".")
         for h in blocked_hosts], dtype=object
    ))
    ref = ray.put(arr)

    def fn(batch: pa.Table) -> pa.Table:
        blocked = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        hosts = host_array(batch[url_col], strip_www=strip_www)
        enc = hosts.dictionary_encode()
        by_code = _blocked_probe(enc.dictionary.to_pylist(), blocked)
        codes = np.asarray(enc.indices.fill_null(0))
        hit = np.where(np.asarray(enc.indices.is_valid()), by_code[codes], False)
        return batch.filter(pa.array(hit if invert else ~hit))

    return ds.map_batches(fn, batch_format="pyarrow")


def domain_cap(ds, *, key_col: str, url_col: str = "url",
               max_per_host: int, strip_www: bool = True,
               broadcast_limit: int = 16_000_000):
    """Keep at most ``max_per_host`` rows per host, chosen
    deterministically (lowest multiplicative key-hash wins, key asc on
    ties — layout-invariant). Hostless rows are never capped.

    Scale shape: only the thin (host, hash, key) projection shuffles;
    the survivors' full rows come back through the size-gated
    anti-join against the DROPPED key set (empty for every host under
    the cap, so the small side is bounded by the actual excess)."""
    if max_per_host < 1:
        raise ValueError(f"max_per_host must be ≥ 1, got {max_per_host}")
    from changesetmd_ray.joins.broadcast import anti_join
    from changesetmd_ray.stages.sample import _key_hash32

    def thin(batch: pa.Table) -> pa.Table:
        h, valid = _key_hash32(batch, key_col)
        t = pa.table(
            {
                "host": host_array(batch[url_col], strip_www=strip_www),
                "__h32": pa.array(h.astype(np.int64)),
                key_col: batch[key_col],
            }
        )
        hv = np.asarray(pc.is_valid(t["host"]).combine_chunks())
        return t.filter(pa.array(valid & hv))

    def losers(group: pa.Table) -> pa.Table:
        k = group[key_col].to_numpy(zero_copy_only=False)
        h = group["__h32"].to_numpy(zero_copy_only=False)
        if len(k) <= max_per_host:
            return pa.table({key_col: pa.array([], pa.int64())})
        order = np.lexsort((k, h))
        return pa.table({key_col: pa.array(k[order][max_per_host:], pa.int64())})

    dropped = (
        ds.select_columns([key_col, url_col])
        .map_batches(thin, batch_format="pyarrow")
        .groupby("host")
        .map_groups(losers, batch_format="pyarrow")
    )
    return anti_join(ds, dropped, big_on=key_col, small_on=key_col,
                     broadcast_limit=broadcast_limit)


# --------------------------------------------------- URL canonicalization

# query params that never identify content (C4/RefinedWeb-style crawl
# hygiene): tracking and click-attribution keys
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "fbclid", "msclkid", "mc_eid", "mc_cid", "igshid",
    "ref", "ref_src", "spm",
)


def url_normalize_array(urls, *, drop_params=TRACKING_PARAMS) -> pa.Array:
    """Canonical URL per input (the URL-dedup key). Convention, pinned
    by tests/test_domains.py (DuckDB-cross-checked):

    1. fragment stripped (``#...``);
    2. userinfo stripped (``user:pw@`` — never identifies content);
    3. scheme + host lowercased (path/query case preserved);
    4. default ports stripped (``http://…:80``, ``https://…:443``);
    5. tracking query params in ``drop_params`` dropped, the remaining
       params sorted bytewise, ``?`` dropped when nothing is left;
    6. a bare root slash stripped (``http://a.com/`` ≡ ``http://a.com``).

    Inputs without a ``scheme://host`` shape pass through unchanged
    (relative links aren't canonicalizable without a base). The hot
    path is all RE2/Arrow kernels; only DISTINCT query strings take the
    Python param-sort (dictionary-encoded, and most URLs carry no
    query at all)."""
    u = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    # split scheme://[userinfo@]host[:port] from the rest; non-URLs get
    # a null pre and are passed through at the end
    ex = pc.extract_regex(
        u, pattern=r"^(?P<pre>[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)(?P<rest>.*)$"
    )
    pre = pc.struct_field(ex, "pre")
    rest = pc.struct_field(ex, "rest")
    pre = pc.replace_substring_regex(pre, pattern=r"://[^/]*@", replacement="://")
    pre = pc.utf8_lower(pre)
    pre = pc.replace_substring_regex(pre, pattern=r"^(http://[^/:]*):80$",
                                     replacement=r"\1")
    pre = pc.replace_substring_regex(pre, pattern=r"^(https://[^/:]*):443$",
                                     replacement=r"\1")
    rx = pc.extract_regex(rest, pattern=r"^(?P<path>[^?]*)(?:\?(?P<q>.*))?$")
    path = pc.struct_field(rx, "path")
    path = pc.replace_substring_regex(path, pattern=r"^/$", replacement="")
    q = pc.struct_field(rx, "q")

    # param drop + bytewise sort on DISTINCT query strings only
    drop = frozenset(drop_params)
    enc = q.dictionary_encode()
    dict_vals = enc.dictionary.to_pylist() if len(enc.dictionary) else []
    cleaned = []
    for qs in dict_vals:
        if qs is None:
            cleaned.append(None)
            continue
        parts = [p for p in qs.split("&")
                 if p and p.split("=", 1)[0] not in drop]
        parts.sort()
        cleaned.append("&".join(parts) if parts else None)
    q_clean = (
        pa.DictionaryArray.from_arrays(enc.indices,
                                       pa.array(cleaned, pa.string()))
        .cast(pa.string())
        if dict_vals else pa.nulls(len(u), pa.string())
    )
    out = pc.binary_join_element_wise(
        pre, path,
        pc.if_else(pc.is_valid(q_clean),
                   pc.binary_join_element_wise("?", q_clean, ""), ""),
        "",
    )
    # rows that never matched the URL shape pass through unchanged
    return pc.if_else(pc.is_valid(pre), out, u)


def url_normalize(ds, *, url_col: str = "url", out_col: str = "url_norm",
                  drop_params=TRACKING_PARAMS):
    """Append the canonical-URL column (see
    :func:`url_normalize_array`)."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, url_normalize_array(batch[url_col],
                                         drop_params=drop_params))
    return ds.map_batches(fn, batch_format="pyarrow")


def url_dedup(ds, *, url_col: str = "url", id_col: str = "doc_id",
              keep: str = "first", drop_params=TRACKING_PARAMS, **dedup_kwargs):
    """One row per CANONICAL url — catches recrawls that differ only by
    tracking params, fragments, default ports or param order. Composes
    :func:`url_normalize` with the engine's payload-never-shuffles
    exact dedup (``text/dedup.py::exact_dedup`` keyed on the normalized
    column); the helper column is dropped from the survivors."""
    from changesetmd_ray.text.dedup import exact_dedup

    normed = url_normalize(ds, url_col=url_col, out_col="__url_norm",
                           drop_params=drop_params)
    out = exact_dedup(normed, key_col="__url_norm", id_col=id_col,
                      keep=keep, **dedup_kwargs)
    return out.drop_columns(["__url_norm"])
