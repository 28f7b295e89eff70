"""BPE tokenizer (text/bpe.py): the classic merge sequence, round-trip
contract, determinism, and distributed encode parity."""

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.bpe import (
    END,
    BpeModel,
    bpe_encode,
    decode,
    encode_text,
    train_bpe,
    word_counts,
)
from changesetmd_ray.text.hashing import tokenize


def test_classic_merge_order():
    # Sennrich's worked example: est is shared by newest/widest
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = train_bpe(counts, vocab_size=30, min_pair_freq=1)
    # (e,s) (es,t) (est,</w>) all have count 9; ties break lexicographic
    assert m.merges[0] == ("e", "s")
    assert m.merges[1] == ("es", "t")
    assert m.merges[2] == ("est", END)
    ranks = m.ranks()
    from changesetmd_ray.text.bpe import encode_word

    # an UNSEEN word still gets the learned suffix token
    assert "est" + END in encode_word("bravest", ranks)


def test_round_trip_and_unknown_chars():
    texts = [
        "the lowest newest widest low lower",
        "völlig neue wörter überall",
        "numbers 123 and under_scores too",
    ]
    counts: dict = {}
    for t in texts:
        for tok in tokenize(t):
            counts[tok] = counts.get(tok, 0) + 1
    model = train_bpe(sorted(counts.items()), vocab_size=80, min_pair_freq=1)
    cache: dict = {}
    for t in texts:
        ids = encode_text(t, model.ranks(), model.vocab, cache)
        assert decode(ids, model) == " ".join(tokenize(t))
    # a char never seen in training is skipped, not crashed on
    ids = encode_text("the ¤weird", model.ranks(), model.vocab, cache)
    assert decode(ids, model) == "the weird"


def test_training_deterministic():
    counts = [("alpha", 4), ("alphabet", 2), ("beta", 7), ("bet", 1)]
    a = train_bpe(counts, vocab_size=40, min_pair_freq=1)
    b = train_bpe(counts, vocab_size=40, min_pair_freq=1)
    assert a.merges == b.merges and a.vocab == b.vocab


def test_word_counts_and_distributed_encode(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    pool = ["the", "cat", "sat", "mat", "dog", "ran", "fast", "slow",
            "running", "fastest"]
    docs = [" ".join(rng.choice(pool, size=12)) for _ in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(5)

    got = word_counts(ds, max_words=50)
    want: dict = {}
    for d in docs:
        for tok in tokenize(d):
            want[tok] = want.get(tok, 0) + 1
    assert dict(got) == want
    # ordering: count desc, word asc
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))

    model = train_bpe(got, vocab_size=60, min_pair_freq=1)
    out = {r["doc_id"]: r for r in bpe_encode(ds, model).take_all()}
    cache: dict = {}
    for i, d in enumerate(docs):
        assert out[i]["token_ids"] == encode_text(
            d, model.ranks(), model.vocab, cache)
    cnt = {r["doc_id"]: r["n_bpe"] for r in bpe_encode(
        ds, model, out_col="n_bpe", counts_only=True).take_all()}
    assert all(cnt[i] == len(out[i]["token_ids"]) for i in range(300))


def test_min_pair_freq_stops():
    counts = [("ab", 1), ("cd", 1)]
    m = train_bpe(counts, vocab_size=100, min_pair_freq=2)
    assert m.merges == ()  # nothing reaches the frequency floor
    assert isinstance(m, BpeModel) and len(m.vocab) >= 5
