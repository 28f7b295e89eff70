"""HashedEmbedder tests (text/embed.py): determinism, layout
invariance, cosine-tracks-overlap, unit norm, ANN integration."""

import numpy as np
import pyarrow as pa
import pytest

import ray
from changesetmd_ray.text.embed import HashedEmbedder, embed_documents

DOC_A = ("the harbor survey logged tide heights salinity readings and "
         "bird migration counts every morning during the season")
DOC_A_NEAR = ("the harbor survey logged tide heights salinity readings "
              "and bird migration counts every single morning during the season")
DOC_B = ("quarterly revenue grew while the finance committee debated "
         "currency hedging strategies and capital expenditure limits")


def _cos(a, b):
    return float(np.dot(a, b))


def test_deterministic_and_unit_norm():
    st = HashedEmbedder(dim=32)
    e1 = st._embed([DOC_A, "", "   "])
    e2 = st._embed([DOC_A, "", "   "])
    np.testing.assert_array_equal(e1, e2)
    assert abs(np.linalg.norm(e1[0]) - 1.0) < 1e-12
    assert np.all(e1[1] == 0) and np.all(e1[2] == 0)  # empty → zero vector


def test_layout_invariance():
    st = HashedEmbedder(dim=48)
    together = st._embed([DOC_A, DOC_B, DOC_A_NEAR])
    for i, d in enumerate([DOC_A, DOC_B, DOC_A_NEAR]):
        alone = st._embed([d])
        np.testing.assert_allclose(together[i], alone[0], atol=1e-12)


def test_cosine_tracks_lexical_overlap():
    st = HashedEmbedder(dim=64)
    a, near, b = st._embed([DOC_A, DOC_A_NEAR, DOC_B])
    assert _cos(a, near) > 0.9
    assert _cos(a, b) < 0.5
    assert _cos(a, near) - _cos(a, b) > 0.4


def test_seed_and_dim_change_vectors():
    a1 = HashedEmbedder(dim=32, seed=7)._embed([DOC_A])[0]
    a2 = HashedEmbedder(dim=32, seed=8)._embed([DOC_A])[0]
    assert abs(_cos(a1, a2)) < 0.9  # different projection
    with pytest.raises(ValueError):
        HashedEmbedder(dim=0)
    with pytest.raises(ValueError):
        HashedEmbedder(n_features=1000)  # not a power of two


def test_embed_documents_dataset_and_ann(ray_session):
    from changesetmd_ray.text.ann import ann_cosine_topk

    texts = [DOC_A, DOC_A_NEAR, DOC_B,
             "alpine weather stations report snowfall depth and wind"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    emb = embed_documents(ray.data.from_arrow(t).repartition(2), dim=64)
    rows = {r["doc_id"]: np.asarray(r["embedding"]) for r in emb.take_all()}
    assert all(v.shape == (64,) for v in rows.values())
    # ANN over the derived embeddings: DOC_A's nearest non-self
    # neighbor must be its near-duplicate
    corpus = emb.map_batches(
        lambda b: b.rename_columns(
            ["vec_id" if c == "doc_id" else c for c in b.column_names]
        ).select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    queries = pa.table(
        {"vec_id": pa.array([0], pa.int64()),
         "embedding": pa.array([rows[0].tolist()],
                               pa.list_(pa.float32(), 64))}
    )
    top = ann_cosine_topk(corpus, queries, 2).take_all()
    ids = [r["neighbor_id"] for r in sorted(top, key=lambda r: -r["cosine"])]
    assert ids[0] == 0 and ids[1] == 1


def test_embed_to_semdedup_composition(ray_session):
    """Self-contained semantic dedup from RAW TEXT: documents →
    HashedEmbedder → semdedup. The planted near-paraphrase must drop
    at a threshold the unrelated docs clear."""
    from changesetmd_ray.text.semdedup import semdedup

    base = [
        DOC_A,
        DOC_B,
        "volcanic soil samples show elevated mineral content after eruptions",
        "the municipal library extended weekend opening hours this spring",
    ]
    texts = base + [DOC_A_NEAR]  # near-dup of doc 0
    t = pa.table(
        {
            "vec_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    emb = embed_documents(ray.data.from_arrow(t).repartition(2), dim=64)
    # one cluster: 5 docs give k-means no stable 2-way split, and the
    # within-cluster sweep is what this composition test pins
    kept = semdedup(emb, threshold=0.85, n_clusters=1, train_size=16)
    ids = sorted(r["vec_id"] for r in kept.take_all())
    # exactly ONE of the paraphrase pair survives (keep='outlier'
    # retains the member farther from the centroid — here doc 4);
    # the unrelated docs all survive
    assert len({0, 4} & set(ids)) == 1
    assert set(ids) >= {1, 2, 3} and len(ids) == 4
