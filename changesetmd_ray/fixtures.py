"""Deterministic synthetic fixtures (seeded, shardable, no external data).

Generates the `input_hint` web-page table — `(url, warc_ts, html, text,
lang)` — with geo signals *planted* in the HTML so extraction correctness
is checked against generator ground truth, not against a second parser.
Content characteristics mirror the reference's fixture files (SURVEY.md
§5.1: ~3% rows without geo, UTF-8 German/Polish text with quotes and
multi-line comments as in ``/root/reference/test/changesets_testfile.osm``,
nullable fields as in ``changesets-test-tags.osm``).

Sharded determinism: ``make_pages_shard(shard_id, n, seed)`` depends only
on its arguments, so any shard can be (re)generated independently —
the property the resumable-partition layer relies on (SURVEY.md §4.3.4)
and the reason bench data generation parallelizes over Ray tasks.

Coordinates are quantized to 1e-7 degrees (the reference stores
``numeric(10,7)``, ``queries.py:10-13``) and embedded as ``%.7f`` text,
which round-trips bit-exactly through float64 parsing — so planted
ground-truth floats equal extracted floats exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = ["en", "de", "pl", "fr", "es", "ru", "ja", "pt", "it", "nl"]
LANG_WEIGHTS = np.array([0.38, 0.14, 0.08, 0.09, 0.09, 0.06, 0.05, 0.05, 0.03, 0.03])

_TEXT_SNIPPETS = [
    "Die Karte wurde aktualisiert – vielen Dank!",
    'He said "quote me on that" and left.',
    "Zmieniono granice parku narodowego\nw dwóch liniach",
    "plain ascii paragraph about map edits and tiles",
    "unicode check: café, naïve, 北京, Łódź, 🌍🗺️",
    "multi\nline\ntext block with trailing space ",
    "",  # empty text edge row material
    "numbers 12.5, -7.25 inside text that are not coordinates",
]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

TRUTH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),  # (url, warc_ts) is unique; url alone is not
        ("true_points", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
        ("true_min_lon", pa.float64()),
        ("true_min_lat", pa.float64()),
        ("true_max_lon", pa.float64()),
        ("true_max_lat", pa.float64()),
    ]
)


def _quant(rng: np.random.Generator, lo: float, hi: float, n: int) -> np.ndarray:
    """Uniform coords quantized to 1e-7 deg (reference numeric(10,7))."""
    return rng.integers(int(lo * 1e7), int(hi * 1e7), n, endpoint=True) / 1e7


def make_pages_shard(
    shard_id: int, n: int, seed: int = 42, with_truth: bool = False
) -> pa.Table | tuple[pa.Table, pa.Table]:
    """One deterministic shard of the pages table (plus ground truth).

    Edge rows at fixed positions within every shard (mirroring
    FIXTURES.md §1): index 0 = no geo signal; 1 = degenerate bbox
    (single point); 2 = bbox touching lon ±180; 3 = lat exactly ±90;
    4 = out-of-range lat 90.000001 (reference ``README.md:187-188``);
    5 = empty text; 6 = duplicate of url 7 with later warc_ts
    (keep-latest dedup); ~3% of remaining rows carry no geo signal.
    """
    rng = np.random.default_rng((seed, shard_id))
    host_ids = rng.zipf(1.6, n) % max(n // 50, 10)
    urls = [f"https://site{h}.example.org/s{shard_id}/p{i}" for i, h in enumerate(host_ids)]

    base_ts = np.datetime64("2020-01-01T00:00:00", "us")
    span_us = int(372 * 24 * 3600 * 1e6)  # window ends 2021-01-07, like ref tests
    ts = base_ts + rng.integers(0, span_us, n).astype("timedelta64[us]")

    langs = rng.choice(len(LANGS), n, p=LANG_WEIGHTS / LANG_WEIGHTS.sum())
    texts = [
        _TEXT_SNIPPETS[int(k)] + (f" #{shard_id}-{i}" if k != 6 else "")
        for i, k in enumerate(rng.integers(0, len(_TEXT_SNIPPETS), n))
    ]

    n_pts = rng.poisson(2.2, n) + 1
    no_geo = rng.random(n) < 0.03
    n_pts[no_geo] = 0
    if n > 0:
        n_pts[0] = 0  # edge: guaranteed no-geo row
    if n > 1:
        n_pts[1] = 1  # degenerate bbox
    total = int(n_pts.sum())
    lons = _quant(rng, -180, 180, total)
    lats = _quant(rng, -90, 90, total)
    offs = np.concatenate([[0], np.cumsum(n_pts)])

    # fixed edge coordinates
    def set_pts(i, pts):
        s = offs[i]
        for j, (lo, la) in enumerate(pts[: n_pts[i]]):
            lons[s + j] = lo
            lats[s + j] = la

    if n > 2 and n_pts[2] >= 2:
        set_pts(2, [(180.0, 10.0), (179.5, 11.0)])
    if n > 3 and n_pts[3] >= 2:
        set_pts(3, [(25.0, 90.0), (26.0, -90.0)])
    if n > 4 and n_pts[4] >= 1:
        set_pts(4, [(7.0, 90.000001)])  # out-of-range lat exists in real data
    if n > 5:
        texts[5] = ""
    if n > 7:
        urls[6] = urls[7]
        ts6 = max(ts[6], ts[7]) + np.timedelta64(1, "us")
        ts = ts.copy()
        ts[6] = ts6  # row 6 is the later duplicate

    # signal kind per point: 0=geo.position meta, 1=ICBM meta, 2=data-attr span
    kinds = rng.integers(0, 3, total)

    htmls: list[bytes] = []
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        head, body = [], []
        for p in range(s, e):
            la, lo = lats[p], lons[p]
            k = kinds[p]
            if k == 0:
                head.append(f'<meta name="geo.position" content="{la:.7f};{lo:.7f}">')
            elif k == 1:
                head.append(f'<meta name="ICBM" content="{la:.7f}, {lo:.7f}">')
            else:
                body.append(f'<span data-lat="{la:.7f}" data-lon="{lo:.7f}">poi</span>')
        html = (
            f'<html><head><meta charset="utf-8"><title>page {shard_id}/{i}</title>\n'
            + "\n".join(head)
            + f"</head>\n<body>\n<p>{texts[i]}</p>\n"
            + "\n".join(body)
            + "\n<p>decoy 12.5 -7.25 data-x=\"3.14\"</p></body></html>"
        )
        htmls.append(html.encode("utf-8"))

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[int(x)] for x in langs], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    if not with_truth:
        return pages

    pts_struct = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()),
        pa.StructArray.from_arrays(
            [pa.array(lons, pa.float64()), pa.array(lats, pa.float64())], ["lon", "lat"]
        ),
    )
    has = n_pts > 0
    mins = lambda a: [  # noqa: E731
        (np.min(a[offs[i] : offs[i + 1]]) if has[i] else None) for i in range(n)
    ]
    maxs = lambda a: [  # noqa: E731
        (np.max(a[offs[i] : offs[i + 1]]) if has[i] else None) for i in range(n)
    ]
    truth = pa.table(
        {
            "url": pages["url"],
            "warc_ts": pages["warc_ts"],
            "true_points": pts_struct,
            "true_min_lon": pa.array(mins(lons), pa.float64()),
            "true_min_lat": pa.array(mins(lats), pa.float64()),
            "true_max_lon": pa.array(maxs(lons), pa.float64()),
            "true_max_lat": pa.array(maxs(lats), pa.float64()),
        },
        schema=TRUTH_SCHEMA,
    )
    return pages, truth


def write_pages_dir(
    out_dir: str, n_shards: int, rows_per_shard: int, seed: int = 42
) -> list[str]:
    """Write a sharded pages dataset: one parquet file per shard,
    ``part-{shard:05d}.parquet`` — the partition layout the resumable
    pipeline consumes. Returns the file paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s in range(n_shards):
        p = os.path.join(out_dir, f"part-{s:05d}.parquet")
        if not os.path.exists(p):
            pq.write_table(make_pages_shard(s, rows_per_shard, seed), p)
        paths.append(p)
    return paths


# ------------------------------------------------------------- polygons

POLYGONS_SCHEMA = pa.schema(
    [
        ("poly_id", pa.int64()),
        ("kind", pa.string()),  # 'ring' | 'cap_n' | 'cap_s'
        ("ring", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
        ("lat_threshold", pa.float64()),
    ]
)


def make_polygons(n: int = 40, seed: int = 42) -> pa.Table:
    """Small probe-side polygon set (FIXTURES.md §4): axis-aligned
    envelopes (like the documented ``ST_MakeEnvelope`` geofilter,
    reference ``README.md:230-234``), convex and concave rings, a
    sliver, an antimeridian-crossing ring (unwrapped lon > 180), and
    two pole caps."""
    rng = np.random.default_rng((seed, 777))
    rows = []

    def ring_row(pid, xs, ys):
        rows.append(
            {
                "poly_id": pid,
                "kind": "ring",
                "ring": [{"lon": float(x), "lat": float(y)} for x, y in zip(xs, ys)],
                "lat_threshold": None,
            }
        )

    pid = 0
    # envelopes
    for _ in range(max(n - 8, 4)):
        lo_x = rng.uniform(-175, 160)
        lo_y = rng.uniform(-85, 70)
        w = rng.uniform(2, 25)
        h = rng.uniform(2, 20)
        ring_row(pid, [lo_x, lo_x + w, lo_x + w, lo_x], [lo_y, lo_y, lo_y + h, lo_y + h])
        pid += 1
    # convex pentagon
    ang = np.sort(rng.uniform(0, 2 * np.pi, 5))
    ring_row(pid, 20 + 8 * np.cos(ang), 40 + 6 * np.sin(ang))
    pid += 1
    # concave U
    ring_row(
        pid,
        [-60, -50, -50, -53, -53, -57, -57, -60],
        [0, 0, 10, 10, 3, 3, 10, 10],
    )
    pid += 1
    # sliver
    ring_row(pid, [100, 120, 120, 100], [5, 5.02, 5.1, 5.08])
    pid += 1
    # antimeridian-crossing (unwrapped)
    ring_row(pid, [172, 195, 195, 172], [-12, -12, 8, 8])
    pid += 1
    # pole caps
    rows.append({"poly_id": pid, "kind": "cap_n", "ring": None, "lat_threshold": 82.0})
    pid += 1
    rows.append({"poly_id": pid, "kind": "cap_s", "ring": None, "lat_threshold": -82.0})
    pid += 1
    return pa.Table.from_pylist(rows, schema=POLYGONS_SCHEMA)


# ------------------------------------------------------- changeset table

CHANGESETS_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("user_id", pa.int64()),
        ("created_at", pa.timestamp("us")),
        ("closed_at", pa.timestamp("us")),
        ("open", pa.bool_()),
        ("num_changes", pa.int32()),
        ("user_name", pa.string()),
        ("min_lat", pa.float64()),
        ("max_lat", pa.float64()),
        ("min_lon", pa.float64()),
        ("max_lon", pa.float64()),
        ("tags", pa.map_(pa.string(), pa.string())),
    ]
)


def make_changesets(n: int, seed: int = 42) -> pa.Table:
    """Reference-shaped changeset table (``queries.py:6-20``): ~3% rows
    without bbox, a few without user_id (``changesets-test-tags.osm``),
    open/closed mix, tags incl. the documented ``created_by`` LIKE
    'JOSM%' and ``comment`` keys (``README.md:218-228``), skewed
    continent-sized bboxes (``README.md:184-186``)."""
    rng = np.random.default_rng((seed, 123))
    ids = np.arange(1, n + 1, dtype=np.int64)
    base = np.datetime64("2020-01-01T00:00:00", "us")
    created = base + rng.integers(0, int(3.2e13), n).astype("timedelta64[us]")
    dur = rng.integers(1, int(8.6e10), n).astype("timedelta64[us]")
    open_flag = rng.random(n) < 0.04
    uid = rng.integers(1, max(n // 3, 5), n).astype(np.int64)

    cx = _quant(rng, -179, 179, n)
    cy = _quant(rng, -85, 85, n)
    # mostly small boxes, ~2% continent-sized (skew!)
    w = np.where(rng.random(n) < 0.02, rng.uniform(40, 120, n), rng.exponential(0.08, n))
    h = np.where(rng.random(n) < 0.02, rng.uniform(30, 80, n), rng.exponential(0.06, n))
    min_lon = np.maximum(cx - w / 2, -180.0)
    max_lon = np.minimum(cx + w / 2, 180.0)
    min_lat = np.maximum(cy - h / 2, -90.0)
    max_lat = np.minimum(cy + h / 2, 90.0)
    no_bbox = rng.random(n) < 0.03
    degenerate = rng.random(n) < 0.02  # point changesets exist in real dumps
    max_lon = np.where(degenerate, min_lon, max_lon)
    max_lat = np.where(degenerate, min_lat, max_lat)

    editors = ["JOSM/1.5.0", "JOSM/1.6.2", "iD 2.19", "StreetComplete 40.2", "Potlatch 2"]
    tag_rows = []
    for i in range(n):
        t = []
        if rng.random() > 0.01:  # ~1% tagless (self-closing rows in the ref fixture)
            t.append(("created_by", editors[int(rng.integers(0, len(editors)))]))
            if rng.random() < 0.55:
                t.append(("comment", f"edit batch {i} "))  # trailing space like ref
            if rng.random() < 0.2:
                t.append(("source", "survey"))
        tag_rows.append(t)

    def null_where(arr, mask, typ):
        return pa.array([None if m else v for v, m in zip(arr.tolist(), mask)], typ)

    anon_mask = rng.random(n) < 0.002  # anonymous rows lack BOTH uid and name
    return pa.table(
        {
            "id": pa.array(ids),
            "user_id": null_where(uid, anon_mask, pa.int64()),
            "created_at": pa.array(created, pa.timestamp("us")),
            "closed_at": pa.array(
                [None if o else (c + d) for c, d, o in zip(created, dur, open_flag)],
                pa.timestamp("us"),
            ),
            "open": pa.array(open_flag),
            "num_changes": pa.array(rng.integers(1, 500, n), pa.int32()),
            "user_name": pa.array(
                [None if a else f"user_{u}" for u, a in zip(uid, anon_mask)], pa.string()
            ),
            "min_lat": null_where(min_lat, no_bbox, pa.float64()),
            "max_lat": null_where(max_lat, no_bbox, pa.float64()),
            "min_lon": null_where(min_lon, no_bbox, pa.float64()),
            "max_lon": null_where(max_lon, no_bbox, pa.float64()),
            "tags": pa.array(tag_rows, pa.map_(pa.string(), pa.string())),
        },
        schema=CHANGESETS_SCHEMA,
    )


COMMENTS_SCHEMA = pa.schema(
    [
        ("comment_changeset_id", pa.int64()),
        ("comment_user_id", pa.int64()),
        ("comment_user_name", pa.string()),
        ("comment_date", pa.timestamp("us")),
        ("comment_text", pa.string()),
    ]
)


def make_comments(changesets: pa.Table, seed: int = 42) -> pa.Table:
    """Child comment rows, 0–4 per changeset, most 0 (FIXTURES.md §3;
    reference ``queries.py:21-27``)."""
    rng = np.random.default_rng((seed, 456))
    ids = changesets["id"].to_numpy()
    created = changesets["created_at"].to_numpy()
    cnt = np.maximum(rng.poisson(0.3, len(ids)), 0).clip(0, 4)
    rows = {k: [] for k in ["comment_changeset_id", "comment_user_id", "comment_user_name", "comment_date", "comment_text"]}
    for i, c in enumerate(cnt):
        for j in range(c):
            u = int(rng.integers(1, 500))
            rows["comment_changeset_id"].append(int(ids[i]))
            rows["comment_user_id"].append(u)
            rows["comment_user_name"].append(f"user_{u}")
            rows["comment_date"].append(created[i] + np.timedelta64(int(rng.integers(1, int(1e9))), "us"))
            rows["comment_text"].append(f"danke / dzięki «{i}.{j}»\nsecond line")
    return pa.table(rows, schema=COMMENTS_SCHEMA)
