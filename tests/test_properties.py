"""Hypothesis property tests over the pure-numpy kernels (no Ray).

These complement the seeded-random tests with adversarial shrinking:
invariants that must hold for EVERY input, not just sampled ones.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from changesetmd_ray.geo.cells import cell_from_latlng, parent
from changesetmd_ray.geo.grid import grid_dims, pack_tile, tile_xyz, unpack_cell
from changesetmd_ray.geo.pip import classify_points_ring, is_axis_rect
from changesetmd_ray.stages.reduce import sum_by_key
from changesetmd_ray.text.hashing import splitmix64

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lons, lats, st.integers(min_value=0, max_value=12))
def test_tile_pack_unpack_roundtrip(lon, lat, zoom):
    x, y = tile_xyz(np.array([lon]), np.array([lat]), zoom)
    n = 1 << zoom
    assert 0 <= x[0] < n and 0 <= y[0] < n
    z2, x2, y2 = unpack_cell(pack_tile(zoom, x, y))
    assert (z2[0], x2[0], y2[0]) == (zoom, x[0], y[0])


@settings(max_examples=200, deadline=None)
@given(lons, lats, st.integers(min_value=1, max_value=24))
def test_s2_parent_of_child_is_stable(lon, lat, level):
    child = cell_from_latlng(np.array([lat]), np.array([lon]), level)
    direct = cell_from_latlng(np.array([lat]), np.array([lon]), level - 1)
    assert parent(child, level - 1)[0] == direct[0]


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-179.0, max_value=178.0, allow_nan=False),
    st.floats(min_value=-84.0, max_value=83.0, allow_nan=False),
    st.floats(min_value=1e-6, max_value=1.0),
    st.floats(min_value=1e-6, max_value=1.0),
)
def test_rect_classify_consistency(lo_x, lo_y, w, h):
    """Center strictly inside, far point outside, corner on boundary —
    for every rectangle the ray-casting kernel must agree."""
    hi_x, hi_y = lo_x + w, lo_y + h
    rx = np.array([lo_x, hi_x, hi_x, lo_x])
    ry = np.array([lo_y, lo_y, hi_y, hi_y])
    assert is_axis_rect(rx, ry)
    cx, cy = (lo_x + hi_x) / 2, (lo_y + hi_y) / 2
    cls = classify_points_ring(
        np.array([cx, lo_x - 1.0, lo_x]), np.array([cy, lo_y - 1.0, lo_y]), rx, ry
    )
    assert list(cls) == [2, 0, 1]  # INTERIOR, OUTSIDE, BOUNDARY


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.integers(min_value=-50, max_value=50),
                       st.integers(min_value=-1000, max_value=1000)), max_size=200)
)
def test_sum_by_key_matches_dict(pairs):
    k = np.array([p[0] for p in pairs], dtype=np.int64)
    v = np.array([p[1] for p in pairs], dtype=np.int64)
    kk, vv = sum_by_key(k, v)
    exp: dict[int, int] = {}
    for a, b in pairs:
        exp[a] = exp.get(a, 0) + b
    assert dict(zip(kk.tolist(), vv.tolist())) == exp
    assert list(kk) == sorted(exp)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=100))
def test_splitmix64_deterministic_and_distinct_on_sequences(xs):
    a = splitmix64(np.array(xs, dtype=np.uint64))
    b = splitmix64(np.array(xs, dtype=np.uint64))
    assert (a == b).all()
    # splitmix64 is a bijection: distinct inputs → distinct outputs
    assert len(set(a.tolist())) == len(set(xs))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=11), lons, lats)
def test_tile_parenting_consistent_across_zooms(zoom, lon, lat):
    """The z+1 tile of a point is one of the 4 children of its z tile."""
    x1, y1 = tile_xyz(np.array([lon]), np.array([lat]), zoom)
    x2, y2 = tile_xyz(np.array([lon]), np.array([lat]), zoom + 1)
    assert x2[0] // 2 == x1[0] and y2[0] // 2 == y1[0]


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=200)
)
@settings(max_examples=50, deadline=None)
def test_segment_starts_partitions_sorted_array(keys):
    from changesetmd_ray.text.hashing import segment_starts

    arr = np.sort(np.asarray(keys, dtype=np.int64))
    starts = segment_starts(arr)
    assert starts[0] == 0 and starts[-1] == len(arr)
    # segments exactly cover the array with constant values per segment
    for s, e in zip(starts[:-1], starts[1:]):
        assert s < e
        assert (arr[s:e] == arr[s]).all()
    # adjacent segments have different values
    for i in range(1, len(starts) - 1):
        assert arr[starts[i]] != arr[starts[i] - 1]


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300),
    st.sampled_from([2, 8, 64, 256]),
)
@settings(max_examples=50, deadline=None)
def test_hash_bucket_range_and_determinism(keys, nb):
    from changesetmd_ray.text.hashing import hash_bucket

    a = np.asarray(keys, dtype=np.int64)
    b1 = hash_bucket(a, nb)
    b2 = hash_bucket(a, nb)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < nb
    # equal keys always land in the same bucket
    assert len({(k, v) for k, v in zip(keys, b1.tolist())}) == len(set(keys))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # user
            st.integers(min_value=0, max_value=10_000), # ts seconds
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=25, deadline=None)
def test_sessionize_invariants(ray_session, rows):
    """Structural invariants on arbitrary event sets: session event
    counts sum to the input size; session ordinals are 1..n per user;
    session windows don't overlap and gaps between consecutive sessions
    of a user exceed the threshold."""
    import pyarrow as pa
    import ray.data

    from changesetmd_ray.stages.sessionize import sessionize

    base = np.datetime64("2023-01-01", "us")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(r[1], "s") for r in rows], pa.timestamp("us")
            ),
        }
    )
    gap_us = 600 * 1_000_000  # 10 minutes
    out = sessionize(
        ray.data.from_arrow(tbl), gap_us=gap_us, num_buckets=8
    ).to_pandas().sort_values(["user_id", "session_n"])
    assert int(out["n_events"].sum()) == len(rows)
    for uid, grp in out.groupby("user_id"):
        assert list(grp["session_n"]) == list(range(1, len(grp) + 1))
        assert (grp["session_start"] <= grp["session_end"]).all()
        prev_end = None
        for _, r in grp.iterrows():
            if prev_end is not None:
                gap = (r["session_start"] - prev_end).value // 1000  # ns → us
                assert gap > gap_us
            prev_end = r["session_end"]


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    from changesetmd_ray.stages.codecs import bmp_decode, bmp_encode

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_nn_resize_matches_naive_property(sh, sw, th, tw, seed):
    from changesetmd_ray.stages.codecs import nn_resize

    src = np.random.default_rng(seed).integers(0, 256, (sh, sw, 3), dtype=np.uint8)
    got = nn_resize(src, tw, th)
    assert got.shape == (th, tw, 3)
    for y in (0, th // 2, th - 1):
        for x in (0, tw // 2, tw - 1):
            assert (got[y, x] == src[y * sh // th, x * sw // tw]).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=600),
)
def test_greedy_pack_cutpoints_property(lens_list, budget):
    """The per-shard greedy cut kernel (searchsorted form, as in
    packing.pack_sequences): every sequence fits the budget unless it
    is a singleton over-long doc, packing is tight (the next doc would
    overflow), and docs partition exactly."""
    lens = np.asarray(lens_list, dtype=np.int64)
    csum = np.cumsum(lens)
    n = len(lens)
    seq = np.empty(n, np.int64)
    i = s = 0
    while i < n:
        base = csum[i - 1] if i else 0
        j = int(np.searchsorted(csum, base + budget, side="right"))
        if j == i:
            j = i + 1
        seq[i:j] = s
        s += 1
        i = j
    assert (np.diff(seq) >= 0).all() and seq[0] == 0  # contiguous runs
    for g in range(seq.max() + 1):
        members = lens[seq == g]
        total = members.sum()
        assert total <= budget or len(members) == 1
        # tightness: adding the next doc (if any) would overflow
        last = np.nonzero(seq == g)[0][-1]
        if last + 1 < n and total <= budget:
            assert total + lens[last + 1] > budget


@given(
    core_n=st.integers(8, 60),
    pre_a=st.integers(0, 12),
    pre_b=st.integers(0, 12),
    k=st.integers(2, 8),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=60, deadline=None)
def test_winnowing_guarantee_property(core_n, pre_a, pre_b, k, seed):
    """Any shared token run of >= w + k - 1 tokens yields at least one
    COMMON winnowed fingerprint regardless of alignment (the MOSS
    guarantee span_dedup relies on)."""
    from changesetmd_ray.text.hashing import shingle_hashes
    from changesetmd_ray.text.spandup import _winnow

    w = 5
    if core_n < w + k - 1:
        core_n = w + k - 1
    rng = np.random.default_rng(seed)
    core = rng.integers(1, 1 << 60, core_n, dtype=np.uint64)

    def fps(pre):
        toks = np.concatenate(
            [rng.integers(1, 1 << 60, pre, dtype=np.uint64), core,
             rng.integers(1, 1 << 60, 3, dtype=np.uint64)])
        win = shingle_hashes(toks, w)
        return set(win[_winnow(win, k)].tolist())

    assert fps(pre_a) & fps(pre_b)


@given(
    text_n=st.integers(0, 60),
    ranges=st.lists(st.tuples(st.integers(0, 59), st.integers(1, 20)),
                    max_size=8),
)
@settings(max_examples=100, deadline=None)
def test_cut_spans_invariants(text_n, ranges):
    """len(out) == len(text) - chars_removed; kept chars appear in
    original order; no-range input is identity."""
    from changesetmd_ray.text.spandup import _cut_spans

    text = "".join(chr(ord("a") + i % 26) for i in range(text_n))
    rs = [(min(s, text_n), min(s + l, text_n)) for s, l in ranges]
    rs = [(s, e) for s, e in rs if s < e]
    starts = np.asarray([s for s, _ in rs], np.int64)
    ends = np.asarray([e for _, e in rs], np.int64)
    out, n_cuts, removed = _cut_spans(text, starts, ends)
    assert len(out) == len(text) - removed
    if not rs:
        assert out == text and n_cuts == 0 and removed == 0
        return
    # kept characters are exactly those outside the union of ranges,
    # in original order
    drop = np.zeros(text_n, bool)
    for s, e in rs:
        drop[s:e] = True
    assert out == "".join(c for c, d in zip(text, drop) if not d)
    assert removed == int(drop.sum())


@given(
    lines=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=8), min_size=1,
        max_size=12),
)
@settings(max_examples=60, deadline=None)
def test_norm_hash_units_properties(lines):
    """Exempt iff normalized length < min_chars; hashes depend only on
    the normalized form; whitespace variants collide, distinct
    normals don't."""
    from changesetmd_ray.text.linedup import _norm, _norm_hash_units

    h, exempt = _norm_hash_units(lines, True, 1)
    for i, u in enumerate(lines):
        assert exempt[i] == (len(_norm(u, True)) < 1)
    # doubling internal whitespace must not change any hash
    h2, _ = _norm_hash_units([u.replace(" ", "  ") for u in lines], True, 1)
    assert np.array_equal(h, h2)
    # distinct normalized forms get distinct hashes (64-bit digest)
    norms = [_norm(u, True) for u in lines]
    by_norm = {}
    for n, hv in zip(norms, h.tolist()):
        assert by_norm.setdefault(n, hv) == hv
    assert len(set(by_norm.values())) == len(by_norm)


@given(
    docs=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=60), min_size=1,
        max_size=10),
)
@settings(max_examples=60, deadline=None)
def test_repetition_features_batch_independence(docs):
    """The batch-vectorized kernel must give every row the features it
    would get alone — per-row salting may never leak counts across
    rows (regression: unsalted identical-token pairs collided
    batch-wide before the seeded chain fix)."""
    import pyarrow as pa

    from changesetmd_ray.text.repetition import repetition_features

    batched = repetition_features(pa.table({"text": pa.array(docs, pa.string())}))
    for i, d in enumerate(docs):
        single = repetition_features(pa.table({"text": pa.array([d], pa.string())}))
        for c in batched.schema.names:
            if c == "text":
                continue
            assert single[c][0].as_py() == batched[c][i].as_py(), (i, c, d)


_url_chars = st.text(
    alphabet="abAB09-._~%/?&=#@:;+!", min_size=0, max_size=40)


@given(
    st.lists(
        st.one_of(
            _url_chars,
            st.builds(
                lambda scheme, host, port, rest: f"{scheme}://{host}{port}{rest}",
                st.sampled_from(["http", "HTTP", "https", "ftp", "Https"]),
                st.sampled_from(["A.com", "www.Site.ORG", "x.y.z", "a-b.c9.io"]),
                st.sampled_from(["", ":80", ":443", ":8080"]),
                _url_chars,
            ),
        ),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=80, deadline=None)
def test_url_normalize_idempotent_property(urls):
    """normalize(normalize(u)) == normalize(u) for arbitrary URL-shaped
    and URL-unshaped strings (the dedup key must be a fixpoint), and
    the kernel never raises or nulls a non-null input."""
    import pyarrow as pa

    from changesetmd_ray.text.domains import url_normalize_array

    once = url_normalize_array(pa.array(urls, pa.string()))
    twice = url_normalize_array(once)
    assert twice.to_pylist() == once.to_pylist()
    assert not any(v is None for v in once.to_pylist())


@given(
    st.lists(
        st.text(alphabet="<>/abp div scr&#;=\"'\n\t\x01\x02\x03!-", min_size=0,
                max_size=80),
        min_size=1, max_size=16,
    )
)
@settings(max_examples=80, deadline=None)
def test_html_to_text_robustness_property(docs):
    """The extractor must never raise, never emit a tag or an internal
    break sentinel, and always strip outer whitespace — for arbitrary
    malformed tag soup including raw \\x01/\\x02 bytes in the input."""
    import pyarrow as pa

    from changesetmd_ray.stages.html_text import html_to_text_array

    out = html_to_text_array(pa.array(docs, pa.string())).to_pylist()
    for v in out:
        assert v is not None
        assert "\x01" not in v and "\x02" not in v
        assert v == v.strip()
