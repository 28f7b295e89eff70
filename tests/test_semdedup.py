"""SemDeDup (text/semdedup.py): distributed decisions vs a driver-side
naive reference, layout invariance, keep policies, and the filter form."""

import numpy as np
import pyarrow as pa
import pytest

from changesetmd_ray.text.ann import _kmeans_cosine, _norm_rows
from changesetmd_ray.text.semdedup import semdedup, semdedup_decisions


def _mk_embeddings(n=240, dim=16, n_groups=6, seed=11):
    """Deterministic corpus: n_groups anchor directions, each row a
    jittered copy of its group anchor — plenty of near-dups within a
    group, none across."""
    rng = np.random.default_rng(seed)
    anchors = _norm_rows(rng.standard_normal((n_groups, dim)))
    g = np.arange(n) % n_groups
    jit = 0.15 * rng.standard_normal((n, dim))
    mat = _norm_rows(anchors[g] + jit)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64())),
        }
    ), mat


def _naive_reference(mat, *, threshold, n_clusters, kmeans_iters, seed, keep):
    """Independent driver-side re-derivation: same quantizer, then a
    pure-Python greedy per cluster."""
    cent = _kmeans_cosine(mat, n_clusters, kmeans_iters, seed)
    sims = mat @ cent.T
    cl = np.argmax(sims, axis=1)
    cs = sims[np.arange(len(mat)), cl]
    out = {}
    for c in np.unique(cl):
        idx = np.nonzero(cl == c)[0]
        pri = sorted(idx, key=lambda i: (cs[i] if keep == "outlier" else -cs[i], i))
        kept = []
        for i in pri:
            cover = None
            for j in kept:
                if float(mat[i] @ mat[j]) >= threshold:
                    cover = j
                    break
            if cover is None:
                kept.append(i)
                out[i] = (int(c), float(cs[i]), True, None)
            else:
                out[i] = (int(c), float(cs[i]), False, int(cover))
    return out


def _decisions_dict(dec):
    rows = dec.take_all()
    return {
        r["vec_id"]: (r["cluster"], r["cent_sim"], r["keep"], r["dup_of"])
        for r in rows
    }


KW = dict(threshold=0.9, n_clusters=6, kmeans_iters=5, seed=3)


def test_semdedup_matches_naive_reference(ray_session):
    import ray.data

    tbl, mat = _mk_embeddings()
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = _decisions_dict(semdedup_decisions(ds, **KW))
    # the pipeline re-normalizes stored vectors; mirror that bit-exactly
    want = _naive_reference(_norm_rows(mat), keep="outlier", **KW)
    assert len(got) == len(want) == len(mat)
    for i, (c, cs, kp, dup) in want.items():
        gc, gcs, gkp, gdup = got[i]
        assert gc == c and gkp == kp and gdup == dup
        assert abs(gcs - cs) < 1e-12
    # near-dup-rich fixture must actually drop something
    assert sum(1 for v in want.values() if not v[2]) > 20


def test_semdedup_layout_invariant(ray_session):
    import ray.data

    tbl, _ = _mk_embeddings(n=150, seed=4)
    a = _decisions_dict(
        semdedup_decisions(ray.data.from_arrow(tbl).repartition(1), **KW)
    )
    b = _decisions_dict(
        semdedup_decisions(ray.data.from_arrow(tbl).repartition(11), **KW)
    )
    assert a == b


def test_semdedup_layout_invariant_beyond_train_size(ray_session):
    """The k-means training sample is hash-selected, not limit()-taken,
    so decisions stay layout-invariant even when the corpus EXCEEDS
    train_size (limit() would feed different rows to the centroids per
    block layout)."""
    import ray.data

    tbl, _ = _mk_embeddings(n=150, seed=4)
    kw = dict(KW, train_size=64)
    a = _decisions_dict(
        semdedup_decisions(ray.data.from_arrow(tbl).repartition(1), **kw)
    )
    b = _decisions_dict(
        semdedup_decisions(ray.data.from_arrow(tbl).repartition(11), **kw)
    )
    assert a == b


def test_identical_vectors_one_keeper(ray_session):
    import ray.data

    tbl, mat = _mk_embeddings(n=60, seed=9)
    # rows 50..59 are exact copies of row 0 → same cluster guaranteed
    m2 = mat.copy()
    m2[50:] = mat[0]
    tbl = pa.table(
        {
            "vec_id": tbl["vec_id"],
            "embedding": pa.array([r.tolist() for r in m2], pa.list_(pa.float64())),
        }
    )
    got = _decisions_dict(
        semdedup_decisions(ray.data.from_arrow(tbl).repartition(4), **KW)
    )
    grp = [0, *range(50, 60)]
    keepers = [i for i in grp if got[i][2]]
    assert keepers == [0]  # identical → tie broken by id asc
    assert all(got[i][3] == 0 for i in grp[1:])


def test_keep_policy_picks_side(ray_session):
    import ray.data

    # one tight pair: b sits slightly closer to the cluster core than a
    rng = np.random.default_rng(2)
    dim = 8
    core = _norm_rows(rng.standard_normal((1, dim)))[0]
    a = _norm_rows((core + 0.4 * rng.standard_normal(dim))[None])[0]
    b = _norm_rows((0.97 * a + 0.03 * core)[None])[0]
    rest = _norm_rows(core + 0.05 * rng.standard_normal((20, dim)))
    mat = np.vstack([rest, a, b])
    assert float(a @ b) > 0.99
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kw = dict(threshold=0.99, n_clusters=1, kmeans_iters=4, seed=1)
    ia, ib = len(mat) - 2, len(mat) - 1
    out = _decisions_dict(semdedup_decisions(ds, keep="outlier", **kw))
    cen = _decisions_dict(semdedup_decisions(ds, keep="central", **kw))
    assert out[ia][1] < out[ib][1]  # a is the outlier of the pair
    assert out[ia][2] and not out[ib][2]  # outlier policy keeps a
    assert cen[ib][2] and not cen[ia][2]  # central policy keeps b


def test_semdedup_filter_form(ray_session):
    import ray.data

    tbl, _ = _mk_embeddings(n=120, seed=7)
    ds = ray.data.from_arrow(tbl).repartition(3)
    dec = semdedup_decisions(ds, **KW).take_all()
    kept_ids = sorted(r["vec_id"] for r in dec if r["keep"])
    out = semdedup(ds, **KW)
    assert sorted(r["vec_id"] for r in out.take_all()) == kept_ids
    assert set(out.schema().names) == {"vec_id", "embedding"}
    # forced shuffle-membership path agrees
    out2 = semdedup(ds, broadcast_limit=0, **KW)
    assert sorted(r["vec_id"] for r in out2.take_all()) == kept_ids


def test_semdedup_validation(ray_session):
    import ray.data

    tbl, _ = _mk_embeddings(n=10)
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="keep"):
        semdedup_decisions(ds, threshold=0.9, keep="bogus")
    with pytest.raises(ValueError, match="threshold"):
        semdedup_decisions(ds, threshold=0.0)
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    assert semdedup_decisions(empty, threshold=0.9).count() == 0
