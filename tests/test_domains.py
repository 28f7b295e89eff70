"""Per-domain hygiene ops (text/domains.py): host extraction edges,
combiner-first stats vs DuckDB, suffix-blocklist semantics, cap."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from changesetmd_ray.text.domains import (
    blocklist_filter,
    domain_cap,
    domain_stats,
    host_array,
    url_host,
)


def test_host_extraction_edges():
    urls = pa.array(
        [
            "https://www.Example.COM/path?q=1",
            "http://sub.example.com:8080/x",
            "https://user:pw@secret.example.org/a",
            "ftp://files.example.net",
            "example.com/no-scheme",
            "https://example.com",
            "https://",
            "",
            None,
        ]
    )
    got = host_array(urls).to_pylist()
    assert got == [
        "example.com",
        "sub.example.com",
        "secret.example.org",
        "files.example.net",
        "example.com",
        "example.com",
        None,
        None,
        None,
    ]
    keep_www = host_array(urls, strip_www=False).to_pylist()
    assert keep_www[0] == "www.example.com"


def _pages_table(n=600):
    hosts = ["a.com", "b.org", "c.net", "spam.biz", "sub.a.com", None]
    urls, texts = [], []
    for i in range(n):
        h = hosts[i % len(hosts)]
        urls.append(f"https://{h}/doc/{i}" if h else f"not a url {i}")
        texts.append("x" * (10 + i % 7))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_domain_stats_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    t = _pages_table()
    got = domain_stats(
        ray.data.from_arrow(t).repartition(7), text_col="text"
    ).take_all()
    got = {r["host"]: (r["n_docs"], r["total_chars"]) for r in got}
    con = duckdb.connect()
    con.register("pages", t.to_pandas())
    sql = con.sql(
        """
        with h as (select
          lower(regexp_extract(regexp_replace(regexp_replace(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/@]*@', ''),
            '^([A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+)([/:?#].*)?$', 1)) as raw,
          length(text) as c from pages)
        select case when raw = '' then null
                    else regexp_replace(raw, '^www\\.', '') end as host,
               count(*) as n, sum(c) as tc
        from h group by 1
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in sql}
    assert got == want
    assert got["a.com"][0] == 100 and None in got  # hostless bucket exists


def test_url_host_column(ray_session):
    import ray.data

    t = _pages_table(60)
    out = url_host(ray.data.from_arrow(t)).take_all()
    assert all(
        (r["host"] is None) == r["url"].startswith("not ") for r in out
    )


def test_blocklist_suffix_semantics(ray_session):
    import ray.data

    urls = [
        "https://ads.example.com/x",   # subdomain of blocked
        "https://example.com/y",       # exact blocked
        "https://notexample.com/z",    # NOT a suffix match
        "https://good.org/a",
        "https://www.tracker.net/b",   # www-strip then exact
        "no host here",
    ]
    t = pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                  "url": pa.array(urls, pa.string())})
    ds = ray.data.from_arrow(t).repartition(2)
    kept = sorted(r["doc_id"] for r in blocklist_filter(
        ds, ["example.com", "Tracker.net"]).take_all())
    assert kept == [2, 3, 5]  # notexample.com + good.org + hostless survive
    hits = sorted(r["doc_id"] for r in blocklist_filter(
        ds, ["example.com", "Tracker.net"], invert=True).take_all())
    assert hits == [0, 1, 4]


def test_domain_cap_exact_and_layout_invariant(ray_session):
    import ray.data

    t = _pages_table(600)
    a = domain_cap(ray.data.from_arrow(t).repartition(3),
                   key_col="doc_id", max_per_host=10).take_all()
    b = domain_cap(ray.data.from_arrow(t).repartition(13),
                   key_col="doc_id", max_per_host=10).take_all()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    from collections import Counter

    per_host = Counter()
    for r in a:
        h = host_array(pa.array([r["url"]])).to_pylist()[0]
        per_host[h] += 1
    assert all(v == 10 for h, v in per_host.items() if h is not None)
    assert per_host[None] == 100  # hostless rows never capped
    # forced bucketed anti-join path agrees
    c = domain_cap(ray.data.from_arrow(t).repartition(3), key_col="doc_id",
                   max_per_host=10, broadcast_limit=0).take_all()
    assert sorted(r["doc_id"] for r in c) == sorted(r["doc_id"] for r in a)
    with pytest.raises(ValueError):
        domain_cap(ray.data.from_arrow(t), key_col="doc_id", max_per_host=0)


# --------------------------------------------------- URL canonicalization


def _norm(urls):
    from changesetmd_ray.text.domains import url_normalize_array

    return url_normalize_array(pa.array(urls, pa.string())).to_pylist()


def test_url_normalize_conventions():
    assert _norm([
        "HTTP://WWW.Example.COM:80/Path/?b=2&a=1#frag",
        "https://user:pw@Site.org:443/x",
        "http://a.com/",
        "http://a.com/?utm_source=x&utm_medium=y",
        "http://a.com/p?gclid=1&q=term&fbclid=2",
        "relative/link.html",
        None,
    ]) == [
        "http://www.example.com/Path/?a=1&b=2",
        "https://site.org/x",
        "http://a.com",
        "http://a.com",
        "http://a.com/p?q=term",
        "relative/link.html",
        None,
    ]


def test_url_normalize_idempotent():
    urls = [
        "HTTP://X.com:80/A?z=9&y=8&utm_id=t#f",
        "https://y.org:443/?a=1",
        "http://z.net/only/path",
        "ftp://files.example.com:21/pub",
        "http://h.com:8080/keep-port?b&a",
    ]
    once = _norm(urls)
    assert _norm(once) == once


def test_url_normalize_matches_duckdb():
    """Cross-check the full convention against an independent DuckDB
    implementation over generated urls."""
    import duckdb

    rng = np.random.default_rng(5)
    hosts = ["Example.com", "WWW.site.ORG", "a.b.co", "x.io"]
    paths = ["/", "/p/q", "/Article-7", ""]
    queries = ["", "b=2&a=1", "utm_source=t&q=1", "gclid=9", "a=1&utm_medium=m&c=3"]
    urls = []
    for _ in range(400):
        h = hosts[rng.integers(len(hosts))]
        scheme, port = (("http", ":80") if rng.random() < 0.5 else ("https", ":443"))
        url = f"{scheme.upper() if rng.random() < 0.3 else scheme}://{h}"
        if rng.random() < 0.4:
            url += port
        url += paths[rng.integers(len(paths))]
        q = queries[rng.integers(len(queries))]
        if q:
            url += "?" + q
        if rng.random() < 0.2:
            url += "#sec"
        urls.append(url)

    got = _norm(urls)
    con = duckdb.connect()
    con.register("u", pa.table({"url": pa.array(urls, pa.string())}))
    want = [r[0] for r in con.execute("""
      with s as (
        select regexp_replace(url, '#.*$', '') as u from u
      ), p as (
        select regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1) as pre0,
               regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) as rest
        from s
      ), n as (
        select regexp_replace(regexp_replace(
                 lower(regexp_replace(pre0, '://[^/]*@', '://')),
                 '^(http://[^/:]*):80$', '\\1'), '^(https://[^/:]*):443$', '\\1') as pre,
               regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '^/$', '') as path,
               case when rest like '%?%' then regexp_extract(rest, '^[^?]*\\?(.*)$', 1) end as q
        from p
      ), qn as (
        select pre, path,
               array_to_string(list_sort(list_filter(string_split(q, '&'),
                 x -> x <> '' and not list_contains(
                   ['utm_source','utm_medium','utm_campaign','utm_term','utm_content',
                    'utm_id','gclid','fbclid','msclkid','mc_eid','mc_cid','igshid',
                    'ref','ref_src','spm'], string_split(x, '=')[1]))), '&') as qs
        from n
      )
      select pre || path || case when qs is not null and qs <> ''
                                 then '?' || qs else '' end
      from qn
    """).fetchall()]
    assert got == want


def test_url_dedup_collapses_recrawls(ray_session):
    from changesetmd_ray.text.domains import url_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "url": pa.array([
                "http://a.com/p?x=1&y=2",
                "HTTP://A.com:80/p?y=2&x=1&utm_source=mail#top",  # recrawl of 1
                "http://a.com/p?x=1&y=3",                          # different
                "https://b.org/",
                "https://b.org",                                   # recrawl of 4
            ]),
        }
    )
    out = url_dedup(ray.data.from_arrow(t).repartition(2)).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 3, 4]
    assert all(set(r) == {"doc_id", "url"} for r in out)
