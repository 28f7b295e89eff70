"""Training-data text operators: dedup / analysis / ANN vs brute-force
expectations (SURVEY.md §5.2 oracle-diff style)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from changesetmd_ray.stages.multimodal import decode_media
from changesetmd_ray.text.analysis import Fingerprint, LangId, TokenCount, quality_features
from changesetmd_ray.text.ann import ann_cosine_topk, ann_lsh_topk
from changesetmd_ray.text.dedup import (
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_candidates,
    simhash_candidates,
)
from changesetmd_ray.text.hashing import (
    char_ngram_hashes,
    jaccard,
    shingle_hashes,
    token_hashes,
    tokenize,
)


def _docs():
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through the green field "
        "until the evening sun goes down behind the distant hills"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("green", "wide")),  # near dup
        (4, "completely different content about ray data pipelines and arrow tables"),
        (5, "another unrelated document mentioning tiles, joins and shuffles in passing"),
        (6, base.replace("quick", "fast").replace("lazy", "sleepy")),  # near dup
        (7, ""),
        (8, "short text"),
        (9, "short text"),  # exact dup of 8
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_exact_dedup_keep_first():
    docs = _docs()
    out = exact_dedup(ray.data.from_arrow(docs), key_col="text", id_col="doc_id").take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [1, 3, 4, 5, 6, 7, 8]  # 2 and 9 are dups of 1 and 8


def test_exact_dedup_duplicate_ids_raise_loudly():
    """The loser-filter path must REFUSE duplicated ids (dropping by id
    would delete the winner too — silent data loss); unique_ids=False is
    the documented escape hatch and must still dedup correctly."""
    docs = _docs()
    doubled = ray.data.from_arrow(docs).union(ray.data.from_arrow(docs))
    with pytest.raises(Exception, match="unique_ids=False"):
        exact_dedup(doubled, key_col="text", id_col="doc_id").take_all()
    out = exact_dedup(
        doubled, key_col="text", id_col="doc_id", unique_ids=False
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 3, 4, 5, 6, 7, 8]


def test_exact_dedup_keep_latest():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a", "a", "b"]),
            "ts": pa.array(
                np.array(["2020-01-01", "2021-01-01", "2020-01-01"], dtype="datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
    )
    out = exact_dedup(
        ray.data.from_arrow(t), key_col="text", id_col="doc_id", keep="latest", ts_col="ts"
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [2, 3]


def _brute_pairs(docs, threshold, char_ngrams=None, w=3):
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    hs = [
        char_ngram_hashes(t or "", char_ngrams)
        if char_ngrams
        else shingle_hashes(token_hashes(tokenize(t or "")), w)
        for t in texts
    ]
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(hs[i], hs[j]) >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_minhash_lsh_finds_near_dups():
    docs = _docs()
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            ray.data.from_arrow(docs), threshold=0.5, carry_text=True
        ).take_all()
    }
    exp = _brute_pairs(docs, 0.5)
    # carry_text verification ⇒ no false positives; LSH may miss borderline
    # pairs but must find all the planted strong dups
    assert got <= exp
    assert {(1, 2), (8, 9)} <= got
    assert any(p in got for p in [(1, 3), (2, 3), (1, 6), (2, 6)])


def test_minhash_pair_emitted_once():
    docs = _docs()
    pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            ray.data.from_arrow(docs), threshold=0.3, carry_text=True
        ).take_all()
    ]
    assert len(pairs) == len(set(pairs))


def test_simhash_candidates():
    docs = _docs()
    res = simhash_candidates(ray.data.from_arrow(docs), max_hamming=8).take_all()
    pairs = [(r["id_a"], r["id_b"]) for r in res]
    assert len(pairs) == len(set(pairs))  # emit-once
    assert (1, 2) in pairs and (8, 9) in pairs  # identical docs: hamming 0
    for r in res:
        assert 0 <= r["hamming"] <= 8


def _hot_corpus(n=120, vocab=500, length=80, muts=2, seed=7):
    """Near-identical corpus: every doc is the same base with a few
    doc-unique word mutations — every LSH bucket is hot."""
    rng = np.random.default_rng(seed)
    base = [f"tok{w}" for w in rng.integers(0, vocab, length)]
    rows = []
    for i in range(n):
        words = list(base)
        for p in rng.integers(0, length, muts):
            words[int(p)] = f"m{i}_{p}"
        rows.append((i, " ".join(words)))
    return rows


def test_minhash_vectorized_matches_bruteforce():
    """The blocked/vectorized bucket kernel must emit exactly the
    signature-level LSH candidate set (collide in ≥1 band AND est ≥
    threshold), each pair once, with exact est values."""
    from changesetmd_ray.text.hashing import minhash_params, minhash_signature

    rows = _hot_corpus()
    docs = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(
            ray.data.from_arrow(docs).repartition(4), threshold=0.5
        ).take_all()
    }
    a, b = minhash_params(128)
    sigs = {
        i: minhash_signature(shingle_hashes(token_hashes(tokenize(t)), 3), a, b)
        for i, t in rows
    }
    exp = {}
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            si, sj = sigs[i], sigs[j]
            collide = any(
                np.array_equal(si[k * 8 : (k + 1) * 8], sj[k * 8 : (k + 1) * 8])
                for k in range(16)
            )
            est = float((si == sj).mean())
            if collide and est >= 0.5:
                exp[(i, j)] = est
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12


def test_minhash_distributed_fallback_matches_broadcast():
    """candidate_broadcast_limit=0 forces the fully distributed verify
    (hash_join-attached signatures); output must be identical to the
    broadcast path — pairs, est, and exact jaccard."""
    def run(docs, **kw):
        return sorted(
            (r["id_a"], r["id_b"], round(r["est_jaccard"], 12),
             round(r.get("jaccard", -1.0), 12))
            for r in minhash_lsh_candidates(
                ray.data.from_arrow(docs), **kw
            ).take_all()
        )

    docs = _docs()
    for kw in ({"threshold": 0.5, "carry_text": True}, {"threshold": 0.5}):
        assert run(docs, **kw) == run(docs, candidate_broadcast_limit=0, **kw)

    rows = _hot_corpus(n=40)
    hot = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )
    assert run(hot, threshold=0.5) == run(
        hot, threshold=0.5, candidate_broadcast_limit=0
    )


def test_minhash_hot_band_star_guard():
    """A band segment ≥ hot_band_limit emits a star around its min id:
    candidate volume collapses from m²/2 to m−1 per band, the verified
    output is a subset of the full enumeration, and downstream cluster
    assignment is UNCHANGED (the star spans the component)."""
    from changesetmd_ray.text.dedup import duplicate_clusters

    rows = _hot_corpus(n=60, muts=1)
    docs = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )

    def pairs(**kw):
        return sorted(
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(
                ray.data.from_arrow(docs), threshold=0.5, **kw
            ).take_all()
        )

    full = pairs()
    star = pairs(hot_band_limit=8)
    assert set(star) <= set(full)
    assert len(star) < len(full)  # the guard engaged

    def clusters(ps):
        t = pa.table({"id_a": pa.array([a for a, _ in ps], pa.int64()),
                      "id_b": pa.array([b for _, b in ps], pa.int64())})
        return sorted((r["doc_id"], r["rep_id"])
                      for r in duplicate_clusters(t).to_pylist())

    assert clusters(star) == clusters(full)

    # standard corpora never form mega-segments: default limit is a no-op
    docs_std = _docs()
    got_default = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            ray.data.from_arrow(docs_std), threshold=0.5, carry_text=True
        ).take_all()
    )
    got_huge = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            ray.data.from_arrow(docs_std), threshold=0.5, carry_text=True,
            hot_band_limit=1 << 30,
        ).take_all()
    )
    assert got_default == got_huge


def test_simhash_vectorized_matches_bruteforce():
    """Pigeonhole banding has recall 1.0 over fingerprints: the output
    must be EXACTLY the set of pairs with Hamming ≤ t, each once."""
    from changesetmd_ray.text.hashing import simhash64

    rows = _hot_corpus()
    docs = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidates(
            ray.data.from_arrow(docs).repartition(4), max_hamming=6
        ).take_all()
    }
    fps = {i: simhash64(token_hashes(tokenize(t))) for i, t in rows}
    exp = {}
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            d = bin(fps[i] ^ fps[j]).count("1")
            if d <= 6:
                exp[(i, j)] = d
    assert got == exp


def test_duplicate_clusters_dataset_matches_union_find():
    """Distributed min-label propagation must produce exactly the
    driver union-find's (doc_id, rep_id) map — including on a long path
    (diameter >> 1, the worst case for propagation rounds)."""
    from changesetmd_ray.text.dedup import duplicate_clusters_dataset

    rng = np.random.default_rng(11)
    edges = []
    # random clusters: stars and cliques
    base = 0
    for size in [2, 3, 5, 8, 4]:
        ids = base + rng.permutation(100)[:size]
        for i in range(1, size):
            edges.append((int(ids[0]), int(ids[i])))
        base += 100
    # a 12-vertex path: 1000-1011
    for i in range(1000, 1011):
        edges.append((i + 1, i))  # reversed order on purpose
    pairs = pa.table(
        {"id_a": pa.array([a for a, b in edges], pa.int64()),
         "id_b": pa.array([b for a, b in edges], pa.int64())}
    )
    exp = {r["doc_id"]: r["rep_id"] for r in duplicate_clusters(pairs).to_pylist()}
    got_rows = duplicate_clusters_dataset(
        ray.data.from_arrow(pairs).repartition(4), num_buckets=8
    ).take_all()
    got = {r["doc_id"]: r["rep_id"] for r in got_rows}
    assert len(got_rows) == len(got)  # one label row per vertex
    assert got == exp


def test_duplicate_clusters_union_find():
    pairs = pa.table(
        {"id_a": pa.array([1, 2, 8], pa.int64()), "id_b": pa.array([2, 3, 9], pa.int64())}
    )
    m = {r["doc_id"]: r["rep_id"] for r in duplicate_clusters(pairs).to_pylist()}
    assert m == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_quality_features_and_tokens():
    docs = _docs()
    out = (
        ray.data.from_arrow(docs)
        .map_batches(quality_features, batch_format="pyarrow")
        .map_batches(TokenCount, batch_format="pyarrow", concurrency=(1, 2))
        .take_all()
    )
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[7]["n_chars"] == 0 and by_id[7]["n_tokens_ws"] == 0
    assert by_id[8]["n_tokens_ws"] == 2
    t1 = docs["text"][0].as_py()
    assert by_id[1]["n_chars"] == len(t1)
    assert by_id[1]["n_tokens_ws"] == len(t1.split())
    assert by_id[1]["quality_ok"] is True
    assert by_id[7]["quality_ok"] is False
    assert by_id[1]["n_tokens_bpe"] >= by_id[1]["n_tokens_ws"]


def test_langid():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat is in the house and it is warm",
                    "der Hund ist nicht mit der Katze und das ist gut",
                    "",
                ]
            ),
        }
    )
    out = ray.data.from_arrow(t).map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2)).take_all()
    by_id = {r["doc_id"]: r["lang_pred"] for r in out}
    assert by_id[1] == "en" and by_id[2] == "de" and by_id[3] == "und"


def test_fingerprint_whitespace_invariant():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["Hello   world,\nthis is FINE", "hello world, this is fine", "different doc"]
            ),
        }
    )
    out = ray.data.from_arrow(t).map_batches(Fingerprint, batch_format="pyarrow", concurrency=(1, 2)).take_all()
    fp = {r["doc_id"]: r["fingerprint"] for r in out}
    assert fp[1] == fp[2] != fp[3]


def _vectors(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, row)) for row in m], pa.list_(pa.float32())),
        }
    ), m


def test_ann_cosine_topk_exact():
    tbl, m = _vectors()
    queries = tbl.slice(0, 5)
    got = ann_cosine_topk(ray.data.from_arrow(tbl), queries, 4).take_all()
    mn = (m.astype(np.float32).astype(np.float64))
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    for q in range(5):
        sims = mn @ mn[q]
        exp = np.lexsort((np.arange(len(sims)), -sims))[:4]
        rows = sorted((r for r in got if r["query_id"] == q), key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rows] == list(exp)
        assert rows[0]["neighbor_id"] == q  # self is nearest


def test_ann_lsh_subset_of_exact_candidates():
    tbl, m = _vectors()
    queries = tbl.slice(0, 3)
    got = ann_lsh_topk(ray.data.from_arrow(tbl), queries, 4, max_mismatch=6).take_all()
    assert len(got) > 0
    for r in got:
        assert -1.0001 <= r["cosine"] <= 1.0001
    # self signature always matches itself → self found at rank 1
    r1 = [r for r in got if r["query_id"] == r["neighbor_id"]]
    assert all(r["rank"] == 1 for r in r1) and len(r1) == 3


def test_ann_ivf_exact_config_matches_bruteforce():
    """nprobe=None probes every cell: the IVF machinery (assignment,
    per-cell rerank, merge) must reproduce the exact top-k bit-for-bit."""
    from changesetmd_ray.text.ann import ann_ivf_topk

    tbl, _ = _vectors()
    queries = tbl.slice(0, 5)
    exact = ann_cosine_topk(ray.data.from_arrow(tbl), queries, 4).take_all()
    ivf = ann_ivf_topk(
        ray.data.from_arrow(tbl).repartition(4), queries, 4,
        n_clusters=8, nprobe=None, train_size=100,
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    e = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact}
    g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf}
    assert g == e


def test_ann_ivf_pruned_recall():
    """Pruned IVF: results are a (query, neighbor)-subset consistent
    with exact cosines, self is always found (its own cell is the
    nearest centroid), and recall vs exact stays useful."""
    from changesetmd_ray.text.ann import ann_ivf_topk

    tbl, _ = _vectors()
    queries = tbl.slice(0, 10)
    exact = ann_cosine_topk(ray.data.from_arrow(tbl), queries, 4).take_all()
    ivf = ann_ivf_topk(
        ray.data.from_arrow(tbl).repartition(4), queries, 4,
        n_clusters=8, nprobe=3, train_size=200,
    ).take_all()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    self_rows = [r for r in ivf if r["query_id"] == r["neighbor_id"]]
    assert len(self_rows) == 10 and all(r["rank"] == 1 for r in self_rows)
    recall = len(ivf_set & exact_set) / len(exact_set)
    assert recall >= 0.5, recall


def test_stratified_sample_rates_and_edge_groups():
    from changesetmd_ray.stages.sample import stratified_sample, systematic_sample

    n = 20_000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(
                ["a" if i % 4 == 0 else ("b" if i % 4 == 1 else ("zzz" if i % 4 == 2 else None))
                 for i in range(n)]
            ),
        }
    )
    out = stratified_sample(
        ray.data.from_arrow(t).repartition(4), key_col="k", group_col="g",
        rates={"a": 1.0, "b": 0.1}, default_rate=0.0,
    ).take_all()
    got_a = [r["k"] for r in out if r["g"] == "a"]
    got_b = [r["k"] for r in out if r["g"] == "b"]
    assert len(got_a) == n // 4  # rate 1.0 keeps everything
    assert 0 < len(got_b) < n // 4 * 0.2  # ~10%
    assert all(r["g"] in ("a", "b") for r in out)  # unknown + null dropped
    # per-row determinism: the same key kept under systematic at the
    # same rate — stratification only swaps the threshold
    sys_b = {r["k"] for r in systematic_sample(
        ray.data.from_arrow(t), key_col="k", rate=0.1).take_all()}
    assert set(got_b) == {k for k in sys_b if k % 4 == 1}
    with pytest.raises(ValueError):
        stratified_sample(ray.data.from_arrow(t), key_col="k", group_col="g",
                          rates={"a": 1.5})


def test_salted_sample_decorrelates_from_domain_cap_stream():
    """domain_cap keeps the per-host LOWEST hash32(key) rows; an
    UNSALTED resample over those survivors keeps ~all of them
    regardless of the nominal rate (same hash stream), while a salted
    resample keeps ~rate — the stage-coupling fix. Also pins the
    salted stream's SQL expression (xor before the multiply)."""
    import duckdb

    from changesetmd_ray.stages.sample import (
        _KNUTH, _MOD32, _SALT_MIX, systematic_sample,
    )

    n, cap, rate, salt = 200_000, 2_000, 0.05, 0x52534D50
    keys = np.arange(n, dtype=np.int64)
    h = (keys.astype(np.uint64) * _KNUTH) % _MOD32
    # one hot host: domain_cap-style winners = the cap lowest hashes
    winners = keys[np.argsort(h)[:cap]]
    t = pa.table({"k": pa.array(np.sort(winners))})
    unsalted = systematic_sample(ray.data.from_arrow(t), key_col="k",
                                 rate=rate).count()
    salted = systematic_sample(ray.data.from_arrow(t), key_col="k",
                               rate=rate, salt=salt).count()
    assert unsalted == cap  # fully coupled: every winner re-survives
    assert abs(salted - cap * rate) < cap * rate * 0.5  # ~rate·cap
    # the salted rule stays ANSI-SQL-expressible (battery-hash pattern)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    splat = int((np.uint64(salt) * _SALT_MIX) % _MOD32)
    sql = con.sql(
        f"select count(*) from t where "
        f"(cast(xor(k, {splat}) as hugeint) * 2654435761) % 4294967296 < "
        f"cast({rate} * 4294967296.0 as ubigint)"
    ).fetchone()[0]
    assert sql == salted


def test_weighted_sample_matches_sql_and_reference():
    import duckdb

    from changesetmd_ray.stages.sample import weighted_sample

    n = 20_000
    rng = np.random.default_rng(5)
    w = rng.uniform(0, 1, n)
    w[::97] = np.nan  # non-finite → dropped
    w[::89] = -0.5    # negative → dropped
    wl = w.tolist()
    for i in range(0, n, 101):
        wl[i] = None  # null → dropped
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "w": pa.array(wl, pa.float64())})
    out = weighted_sample(
        ray.data.from_arrow(t).repartition(4), key_col="k", weight_col="w",
        scale=0.8, power=2.0,
    ).take_all()
    got = sorted(r["k"] for r in out)
    # driver-side reference
    h = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    wv = np.array([x if x is not None else np.nan for x in wl])
    ok = np.isfinite(wv) & (wv >= 0)
    p = np.clip(0.8 * np.where(ok, wv, 0.0) ** 2.0, 0, 1)
    want = sorted(np.nonzero(ok & (h < (p * 2.0**32).astype(np.uint64)))[0].tolist())
    assert got == want
    assert 0 < len(got) < n * 0.5  # E[p] = 0.8·E[w²] ≈ 0.27
    # the same rule is ANSI-SQL-expressible (the battery-hash pattern)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    sql = con.sql(
        "select k from t where w is not null and w >= 0 and isfinite(w) and "
        "(k * 2654435761) % 4294967296 < "
        "cast(least(0.8 * w * w, 1.0) * 4294967296.0 as ubigint)"
    ).fetchall()
    assert sorted(r[0] for r in sql) == want
    with pytest.raises(ValueError):
        weighted_sample(ray.data.from_arrow(t), key_col="k", weight_col="w",
                        scale=-1.0)


def test_media_decode_stub():
    media = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "audio"]),
            "payload": pa.array([b"\x89PNGfakebytes", b"RIFFfakeaudio"], pa.binary()),
            "meta_width": pa.array([4, None], pa.int32()),
            "meta_height": pa.array([3, None], pa.int32()),
        }
    )
    out = decode_media(ray.data.from_arrow(media), feat_dim=8).take_all()
    assert len(out) == 2
    for r in out:
        assert len(r["feature"]) == 8
        assert r["payload_bytes"] > 0
        assert "payload" not in r
    # determinism
    out2 = decode_media(ray.data.from_arrow(media), feat_dim=8).take_all()
    f1 = {r["media_id"]: list(r["feature"]) for r in out}
    f2 = {r["media_id"]: list(r["feature"]) for r in out2}
    assert f1 == f2


def test_media_resize_plumbing():
    from changesetmd_ray.stages.multimodal import resize_media

    media = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media_type": pa.array(["image", "audio"]),
            "payload": pa.array([b"\x89PNGfakebytes", b"RIFFfakeaudio"], pa.binary()),
            "meta_width": pa.array([640, None], pa.int32()),
            "meta_height": pa.array([480, None], pa.int32()),
        }
    )
    out = {r["media_id"]: r for r in resize_media(
        ray.data.from_arrow(media), width=64, height=48).take_all()}
    assert out[1]["meta_width"] == 64 and out[1]["meta_height"] == 48
    assert out[1]["payload"].startswith(b"RSZ1")
    # deterministic: same payload → same resized bytes
    out2 = {r["media_id"]: r for r in resize_media(
        ray.data.from_arrow(media), width=64, height=48).take_all()}
    assert out2[1]["payload"] == out[1]["payload"]
    # non-image rows untouched (payload AND metadata)
    assert out[2]["payload"] == b"RIFFfakeaudio"
    assert out[2]["meta_width"] is None


def test_media_frame_sampling():
    from changesetmd_ray.stages.multimodal import FrameSampleStub, sample_frames

    media = pa.table(
        {
            "media_id": pa.array([7, 8], pa.int64()),
            "media_type": pa.array(["video", "image"]),
            "payload": pa.array([b"FAKEVIDEObytes", b"img"], pa.binary()),
        }
    )
    rows = sample_frames(ray.data.from_arrow(media), stride=3, fps=30).take_all()
    assert rows and all(r["media_id"] == 7 for r in rows)  # image row: no frames
    idx = sorted(r["frame_idx"] for r in rows)
    assert idx[0] == 0 and all(i % 3 == 0 for i in idx)  # stride sampling
    n, _fps = FrameSampleStub(stride=3)._frames_fps(b"FAKEVIDEObytes")
    assert len(rows) == len(range(0, n, 3))
    for r in rows:
        assert r["ts_ms"] == r["frame_idx"] * 1000 // 30
        assert r["payload"].startswith(b"FRM1")


def test_media_decode_strict_raises():
    media = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image"]),
            "payload": pa.array([b"x"], pa.binary()),
            "meta_width": pa.array([1], pa.int32()),
            "meta_height": pa.array([1], pa.int32()),
        }
    )
    with pytest.raises(Exception):
        decode_media(ray.data.from_arrow(media), codec="strict").take_all()


def test_exact_dedup_latest_null_ts_loses(ray_session):
    """keep='latest': a NULL timestamp must never beat a real one (NaT's
    int64 sentinel negates onto itself)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from changesetmd_ray.text.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["same", "same"]),
        "ts": pa.array([np.datetime64("2020-01-01", "us"), None], pa.timestamp("us")),
    })
    out = exact_dedup(ray.data.from_arrow(t), key_col="text", id_col="doc_id",
                      keep="latest", ts_col="ts").to_pandas()
    assert list(out["doc_id"]) == [1]


def test_simhash_md5_hash_matches_sql_oracle():
    """The oracled SimHash configuration (md5 token hash) must equal
    the pure-SQL fingerprint+Hamming derivation pair-for-pair — the
    rigor behind docs_simhash_neardup's oracle_sql entry (pigeonhole
    banding recall is a guarantee, so any diff is a fingerprint bug)."""
    import duckdb

    from changesetmd_ray.pipelines.queries import _sql_docs_simhash
    from changesetmd_ray.text.hashing import md5_token_hashes

    path = "/root/testdata/sf0.001/documents.parquet"
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_candidates(
            ray.data.read_parquet(path, columns=["doc_id", "text"]),
            max_hamming=3, token_hasher=md5_token_hashes,
        ).take_all()
    }
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{path}')"
    )
    want = set(map(tuple, con.execute(_sql_docs_simhash()).fetchall()))
    assert got == want and len(want) > 0


def test_fingerprint_md5_matches_sql_oracle():
    """The md5-gram winnowing configuration must equal the pure-SQL
    derivation value-for-value (docs_fingerprint's oracle_sql rigor);
    also pins whitespace-normalization parity between Python split()
    and the oracle's regexp_replace."""
    import duckdb

    from changesetmd_ray.pipelines.queries import _SQL_DOCS_FINGERPRINT
    from changesetmd_ray.text.analysis import Fingerprint

    path = "/root/testdata/sf0.001/documents.parquet"
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(lambda b: Fingerprint(gram_hash="md5")(b), batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint"])
        .take_all()
    }
    con = duckdb.connect()
    con.execute(f"create view documents as select * from read_parquet('{path}')")
    want = set(map(tuple, con.execute(_SQL_DOCS_FINGERPRINT).fetchall()))
    assert got == want and len(want) == 500


def test_exact_dedup_anti_join_fallback_matches_broadcast(ray_session):
    """loser_broadcast_limit=0 forces the bucketed anti-join path (the
    above-broadcast regime, now list-packed); results must equal the
    broadcast path exactly."""
    rng = np.random.RandomState(9)
    n = 2000
    texts = [f"doc {int(v)}" for v in rng.randint(0, 700, n)]  # heavy dups
    t = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)),
         "text": pa.array(texts, pa.string())}
    )
    ds = ray.data.from_arrow(t).repartition(8)

    def run(**kw):
        out = exact_dedup(ds, key_col="text", id_col="doc_id", **kw).to_pandas()
        return sorted(out["doc_id"].tolist())

    assert run(loser_broadcast_limit=0) == run()


# ----------------------------------------------------------- real codecs


def test_bmp_roundtrip_and_edge_shapes():
    from changesetmd_ray.stages.codecs import bmp_decode, bmp_encode

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (3, 5), (48, 64), (7, 13)]:  # odd widths hit row padding
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def test_bmp_topdown_and_rejects():
    import struct

    from changesetmd_ray.stages.codecs import bmp_decode, bmp_encode

    px = np.arange(7 * 13 * 3, dtype=np.uint8).reshape(7, 13, 3)
    buf = bytearray(bmp_encode(px))
    struct.pack_into("<i", buf, 22, -7)  # negative height = top-down rows
    assert np.array_equal(bmp_decode(bytes(buf)), px[::-1])
    with pytest.raises(ValueError, match="magic"):
        bmp_decode(b"NOPE" + bytes(60))
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(bmp_encode(px)[:-5])
    bpp16 = bytearray(bmp_encode(px))
    struct.pack_into("<H", bpp16, 28, 16)
    with pytest.raises(NotImplementedError):  # outside the 24-bpp subset
        bmp_decode(bytes(bpp16))


def test_nn_resize_matches_naive_loop():
    from changesetmd_ray.stages.codecs import nn_resize

    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    for w, h in [(64, 48), (5, 3), (14, 9), (1, 1)]:
        got = nn_resize(src, w, h)
        exp = np.empty((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                exp[y, x] = src[y * 9 // h, x * 14 // w]
        assert np.array_equal(got, exp), (w, h)


def test_media_bmp_real_decode_resize_features():
    from changesetmd_ray.stages.codecs import bmp_decode, bmp_encode
    from changesetmd_ray.stages.multimodal import decode_media, resize_media

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    media = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image"]),
            "payload": pa.array([bmp_encode(px)], pa.binary()),
            "meta_width": pa.array([10], pa.int32()),
            "meta_height": pa.array([6], pa.int32()),
        }
    )
    resized = resize_media(ray.data.from_arrow(media), width=5, height=3,
                           codec="bmp").take_all()
    out_px = bmp_decode(resized[0]["payload"])
    assert out_px.shape == (3, 5, 3)
    # resize is a REAL pixel gather, not a synthetic payload
    assert np.array_equal(out_px, px[np.arange(3) * 2][:, np.arange(5) * 2])
    feats = decode_media(ray.data.from_arrow(media), feat_dim=8,
                         codec="bmp").take_all()[0]["feature"]
    means = px.reshape(-1, 3).mean(axis=0)
    assert feats[1] == 10.0 and feats[2] == 6.0
    assert abs(feats[0] - means.sum() / 765.0) < 1e-6  # float32 storage
    np.testing.assert_allclose(feats[3:6], means / 255.0, rtol=1e-6)


def test_vid1_header_sampling():
    from changesetmd_ray.stages.codecs import vid1_encode, vid1_header
    from changesetmd_ray.stages.multimodal import sample_frames

    assert vid1_header(vid1_encode(17, 25, b"body")) == (17, 25)
    with pytest.raises(ValueError, match="magic"):
        vid1_header(b"nope")
    media = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["video"]),
            "payload": pa.array([vid1_encode(7, 25)], pa.binary()),
        }
    )
    rows = sample_frames(ray.data.from_arrow(media), stride=2, codec="vid1").take_all()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    assert [r["ts_ms"] for r in rows] == [0, 80, 160, 240]  # 25 fps from header


def test_crc32_windows_matches_zlib():
    """The vectorized sliding-window CRC is bit-identical to zlib."""
    import zlib

    import numpy as np

    from changesetmd_ray.text.analysis import crc32_windows

    rng = np.random.default_rng(7)
    for n, k in ((8, 8), (9, 8), (57, 8), (2000, 8), (64, 5)):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        ref = [zlib.crc32(d[j:j + k]) for j in range(n - k + 1)]
        assert crc32_windows(d, k).tolist() == ref


def test_fingerprint_batch_matches_per_doc():
    """The batch-vectorized crc32 fingerprint path is bit-identical to
    the original per-doc loop, including the short-doc (<k), narrow
    (<k+w-1 bytes) and empty/null edge regimes."""
    import zlib

    import numpy as np

    from changesetmd_ray.text.analysis import Fingerprint
    from changesetmd_ray.text.hashing import hash_bytes64, splitmix64

    texts = ["", None, "abc", "abcdefgh", "abcdefghi", "abcdefghijk",
             "The quick brown fox jumps over the lazy dog",
             "the   QUICK  brown\nfox jumps over the lazy dog",
             "x" * 500]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = Fingerprint()(t)["fingerprint"].to_pylist()

    k, w = 8, 4
    want = []
    for txt in texts:
        norm = " ".join((txt or "").lower().split()).encode("utf-8")
        if len(norm) < k:
            want.append(np.int64(np.uint64(hash_bytes64(norm))).item())
            continue
        grams = splitmix64(np.fromiter(
            (zlib.crc32(norm[j:j + k]) for j in range(len(norm) - k + 1)),
            np.uint64, len(norm) - k + 1))
        if len(grams) >= w:
            idx = np.arange(len(grams) - w + 1)[:, None] + np.arange(w)[None, :]
            mins = grams[idx].min(axis=1)
        else:
            mins = grams
        want.append(np.int64(np.bitwise_xor.reduce(np.unique(mins))).item())
    assert got == want


def test_cross_snapshot_dedup(ray_session, tmp_path):
    """Monthly-recrawl dedup: crawl N's key set persists as parquet;
    crawl N+1 drops every key it already saw, keeps the rest — in both
    the broadcast and the bucketed anti-join regimes."""
    import os

    import ray.data

    from changesetmd_ray.text.dedup import content_keys, exact_dedup_against

    prior_texts = [f"snapshot one doc {i}" for i in range(30)]
    prior = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(30), pa.int64()),
         "text": pa.array(prior_texts, pa.string())}))
    keys_dir = os.path.join(tmp_path, "keys_n")
    content_keys(prior, key_col="text").write_parquet(keys_dir)

    new_texts = ([f"snapshot one doc {i}" for i in range(0, 30, 2)]  # recrawled
                 + [f"snapshot two doc {i}" for i in range(10)])     # fresh
    new = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(100, 100 + len(new_texts)), pa.int64()),
         "text": pa.array(new_texts, pa.string())})).repartition(3)

    for limit in (16_000_000, 0):  # broadcast vs bucketed shuffle
        kept = exact_dedup_against(
            new, ray.data.read_parquet(keys_dir),
            key_col="text", broadcast_limit=limit).take_all()
        assert sorted(r["text"] for r in kept) == sorted(
            f"snapshot two doc {i}" for i in range(10)), f"limit={limit}"
        assert all(set(r) == {"doc_id", "text"} for r in kept)
