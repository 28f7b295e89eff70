"""Per-domain hygiene ops (text/domains.py): host extraction edges,
combiner-first stats vs DuckDB, suffix-blocklist semantics, cap."""

import numpy as np
import pyarrow as pa
import pytest

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
