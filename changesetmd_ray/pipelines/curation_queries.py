"""Driver-checkable CORRECTNESS queries for the LLM-curation stack
(round-5; closes the round-4 verdict's top gap: line/span dedup,
SemDeDup, classifier, LM perplexity, repetition features, Bloom
decontamination, BPE, packing, export and the ``curate()`` composition
were pytest-only — the round-4 repetition hash bug showed pytest-only
coverage lets silent corpus-loss bugs through).

Oracle strategy per query (all hash-exact against DuckDB):

- **Generic SQL** (``docs_line_dedup``, ``docs_repetition``): the SQL
  reimplements the operator's full semantics over the actual corpus
  (line splitting + winner rule; all twelve Gopher repetition
  features), so ANY divergence — not just a planted one — fails.
- **Deterministic planted corpus** (``docs_span_dedup``,
  ``docs_semdedup``, ``docs_decontam``, ``docs_model_scores``,
  ``curation_docs``): the query synthesizes its input as a pure
  function of the table's ids (both engines construct the identical
  corpus), choosing parameters so the operator's exact output is a
  closed-form function of the ids. The same construction style as the
  planted BMP/VID1 media fixtures.
- **Assertion rows** (``bpe_roundtrip``'s booleans,
  ``packing_export``'s check/value rows): invariants the operator
  guarantees (round-trip equality, plan consistency, split
  disjointness) are verified IN the query and reduced to rows whose
  expected values SQL can state — the ``ann_lsh`` recall-gate
  pattern.

Reference parity note: the reference (SlowMo24/ChangesetMD,
changesetmd.py:208-271) has no text-curation layer; these operators
are the training-data additions mandated by the build brief, oracled
with the same rigor as the §2 operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------
# shared synthesis helpers (each used identically by Ray and SQL)

_EN = ("the study found that analysis of the data shows clear results and "
       "the method was described in detail with careful sources given")

_SPAM = ("buy cheap pills now winner casino bonus click here free money "
         "offer prize deal urgent claim reward instant cash jackpot")

_BENCH = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu")


def _read_ids(sf_dir: str, table: str, id_col: str):
    from changesetmd_ray.pipelines.queries import _read, _shuffle_blocks

    return _read(sf_dir, table, [id_col],
                 blocks=_shuffle_blocks(sf_dir, table, rows_per_block=640))


def _ids_np(batch: pa.Table, col: str = "doc_id") -> np.ndarray:
    return batch[col].to_numpy(zero_copy_only=False).astype(np.int64)


# ------------------------------------------------------------------
# 1. docs_line_dedup — corpus-wide line dedup, keep='first'
#    (text/linedup.py). Boilerplate lines are appended to a subset of
#    real documents; the SQL oracle reimplements the FULL semantics
#    (normalize → corpus-wide count → keep-first winner → rebuild), so
#    naturally-duplicated lines are covered too, at any sf.

_BOILER_A = "subscribe to our newsletter today"
_BOILER_B = "all rights reserved worldwide"


def q_docs_line_dedup(sf_dir: str):
    from changesetmd_ray.pipelines.queries import _read, _shuffle_blocks
    from changesetmd_ray.text.linedup import line_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640))

    def inject(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch)
        texts = batch["text"].to_pylist()
        out = [
            t
            + ("\n" + _BOILER_A if i % 3 == 0 else "")
            + ("\n" + _BOILER_B if i % 7 == 0 else "")
            for i, t in zip(ids, texts)
        ]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(out, pa.string())})

    return line_dedup(
        ds.map_batches(inject, batch_format="pyarrow"),
        text_col="text", id_col="doc_id",
        min_count=2, keep="first", with_stats=True,
    )


_SQL_DOCS_LINE_DEDUP = rf"""
with base as (
  select doc_id,
    text
    || case when doc_id % 3 = 0 then chr(10) || '{_BOILER_A}' else '' end
    || case when doc_id % 7 = 0 then chr(10) || '{_BOILER_B}' else '' end
      as text
  from documents),
lines as (
  select doc_id,
         unnest(string_split(text, chr(10))) as line,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 as seq
  from base),
marked as (
  select doc_id, seq, line,
         length(nl) = 0 as exempt,
         count(*) over (partition by nl) as cnt,
         row_number() over (partition by nl order by doc_id, seq) as rn
  from (select doc_id, seq, line,
               lower(regexp_replace(trim(line), '\s+', ' ', 'g')) as nl
        from lines)),
flagged as (
  select doc_id, seq, line,
         (not exempt) and cnt >= 2 and rn > 1 as dropped
  from marked)
select doc_id,
  coalesce(string_agg(line, chr(10) order by seq)
           filter (where not dropped), '') as text,
  count(*) as n_units,
  count(*) filter (where dropped) as n_dropped
from flagged group by doc_id
"""


# ------------------------------------------------------------------
# 2. docs_span_dedup — exact-substring span dedup (text/spandup.py)
#    over a planted corpus: every doc gets 20 doc-unique head tokens +
#    20 doc-unique tail tokens; docs with doc_id % 5 == 0 carry an
#    identical 30-token passage in the middle. With winnow_k=1 every
#    w-window is a fingerprint, so the duplicated windows are EXACTLY
#    the windows fully inside the shared passage and the merged cut is
#    exactly the passage's char range — the full output (rebuilt text,
#    n_cuts, chars_removed) is closed-form in SQL. winnow_k>1 argmin
#    selection is covered by unit tests and by docs_text_analysis's
#    winnowing-fingerprint oracle.

_SPAN_W = 8
_SPAN_PASSAGE = " ".join(f"ppq{j}" for j in range(30))


def _span_text(doc_id: int) -> str:
    head = " ".join(f"u{doc_id}h{j}" for j in range(20))
    tail = " ".join(f"u{doc_id}t{j}" for j in range(20))
    if doc_id % 5 == 0:
        return f"{head} {_SPAN_PASSAGE} {tail}"
    return f"{head} {tail}"


def q_docs_span_dedup(sf_dir: str):
    from changesetmd_ray.text.spandup import span_dedup

    ds = _read_ids(sf_dir, "documents", "doc_id")

    def synth(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array([_span_text(int(i)) for i in ids], pa.string()),
        })

    return span_dedup(
        ds.map_batches(synth, batch_format="pyarrow"),
        text_col="text", id_col="doc_id",
        w=_SPAN_W, winnow_k=1, min_count=2, keep="none", with_stats=True,
    )


_SQL_DOCS_SPAN_DEDUP = f"""
with t as (
  select doc_id,
    array_to_string(list_transform(range(20),
                    j -> 'u' || doc_id || 'h' || j), ' ') as head,
    array_to_string(list_transform(range(20),
                    j -> 'u' || doc_id || 't' || j), ' ') as tail,
    doc_id % 5 = 0 as planted
  from documents)
select doc_id,
  case when planted then head || '  ' || tail
       else head || ' ' || tail end as text,
  cast(case when planted then 1 else 0 end as bigint) as n_cuts,
  cast(case when planted then {len(_SPAN_PASSAGE)} else 0 end
       as bigint) as chars_removed
from t
"""


# ------------------------------------------------------------------
# 3. docs_semdedup — SemDeDup (text/semdedup.py) over planted one-hot
#    embedding groups: vec g = e_{{vec_id mod 16}} exactly, so
#    within-group cosine is 1.0, cross-group 0.0, and the greedy sweep
#    (priority: cent_sim asc, id asc — all cent_sims tie within a
#    group) keeps exactly the minimal vec_id per group regardless of
#    how the trained k-means buckets the 16 distinct points. rep_id =
#    the group keeper for every row (kept rows point at themselves),
#    avoiding nullable-int dtype drift between engines.

_SEM_DIM = 16


def q_docs_semdedup(sf_dir: str):
    from changesetmd_ray.text.semdedup import semdedup_decisions

    ds = _read_ids(sf_dir, "embeddings", "vec_id")

    def synth(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch, "vec_id")
        emb = np.zeros((len(ids), _SEM_DIM), np.float64)
        emb[np.arange(len(ids)), ids % _SEM_DIM] = 1.0
        offs = pa.array(np.arange(len(ids) + 1, dtype=np.int64) * _SEM_DIM,
                        pa.int64()).cast(pa.int32())
        return pa.table({
            "vec_id": batch["vec_id"],
            "embedding": pa.ListArray.from_arrays(
                offs, pa.array(emb.ravel(), pa.float64())),
        })

    dec = semdedup_decisions(
        ds.map_batches(synth, batch_format="pyarrow"),
        threshold=0.9, n_clusters=4, train_size=1024,
        id_col="vec_id", keep="outlier",
    )

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": batch["vec_id"],
            "keep": batch["keep"],
            "rep_id": pc.coalesce(batch["dup_of"], batch["vec_id"]),
        })

    return dec.map_batches(fin, batch_format="pyarrow")


_SQL_DOCS_SEMDEDUP = f"""
select vec_id, vec_id = m as keep, m as rep_id
from (select vec_id,
             min(vec_id) over (partition by vec_id % {_SEM_DIM}) as m
      from embeddings)
"""


# ------------------------------------------------------------------
# 4. docs_model_scores — fastText-style classifier (text/classifier.py)
#    + byte-LM perplexity (text/lm.py) over a planted two-class corpus.
#    The classifier trains driver-side on fixed labeled examples; the
#    byte LM trains DISTRIBUTED on the corpus's good half. Scores are
#    floats SQL cannot recompute, so the query asserts the planted
#    separation with wide margins (good ≥ 0.9 vs spam ≤ 0.1 classifier
#    probability; ≥ 2.0 bits of log2-ppl margin around the cut) —
#    a kernel regression that moves any document across these margins
#    fails the battery.

_PPL_CUT = 5.0


def _model_text(doc_id: int) -> str:
    if doc_id % 2 == 0:
        return f"{_EN} gdoc{doc_id}"
    return f"the and of {_SPAM} sdoc{doc_id}"


def q_docs_model_scores(sf_dir: str):
    from changesetmd_ray.text.classifier import classifier_score, train_classifier
    from changesetmd_ray.text.lm import lm_score, train_byte_lm

    ds = _read_ids(sf_dir, "documents", "doc_id")

    def synth(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array([_model_text(int(i)) for i in ids], pa.string()),
        })

    corpus = ds.map_batches(synth, batch_format="pyarrow")
    model = train_classifier(
        [f"{_EN} ex{i}" for i in range(8)],
        [f"the and of {_SPAM} ex{i}" for i in range(8)],
        n_buckets=1 << 16,
    )
    good_half = corpus.map_batches(
        lambda b: b.filter(pa.array(_ids_np(b) % 2 == 0)),
        batch_format="pyarrow",
    )
    lm = train_byte_lm(good_half, n=3, n_buckets=1 << 18)
    scored = lm_score(
        classifier_score(corpus, model, text_col="text"), lm, text_col="text"
    )

    def fin(batch: pa.Table) -> pa.Table:
        prob = batch["quality_prob"].to_numpy(zero_copy_only=False)
        ppl = batch["log2_ppl"].to_numpy(zero_copy_only=False)
        good = _ids_np(batch) % 2 == 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "clf_good": pa.array(prob >= 0.5),
            "clf_margin_ok": pa.array(
                np.where(good, prob >= 0.9, prob <= 0.1)),
            "ppl_high": pa.array(ppl > _PPL_CUT),
            "ppl_margin_ok": pa.array(
                np.where(good, ppl <= _PPL_CUT - 2.0, ppl >= _PPL_CUT + 2.0)),
        })

    return scored.map_batches(fin, batch_format="pyarrow")


_SQL_DOCS_MODEL_SCORES = """
select doc_id,
       doc_id % 2 = 0 as clf_good,
       true as clf_margin_ok,
       doc_id % 2 = 1 as ppl_high,
       true as ppl_margin_ok
from documents
"""


# ------------------------------------------------------------------
# 5. docs_repetition — ALL twelve Gopher repetition features
#    (text/repetition.py) + the keep rule, exact-SQL-oracled over the
#    real corpus (line/para duplication planted on a subset so those
#    features are non-trivially exercised). The SQL rebuilds every
#    feature from first principles — dup line/para count+char
#    fractions, top 2/3/4-gram char fraction, dup 5..10-gram char
#    fraction — so this is the regression net the round-4 hash-chain
#    bug needed (equal-hash ⇔ equal-gram holds: the engine's 64-bit
#    splitmix chain has no practical collisions at corpus scale).

_REP_LINE = "repeated line here"
_REP_PARA = "dup para block"


def q_docs_repetition(sf_dir: str):
    from changesetmd_ray.pipelines.queries import _read, _shuffle_blocks
    from changesetmd_ray.text.repetition import repetition_features

    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640))

    def inject(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch)
        texts = batch["text"].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            t = t + ("\n" + _REP_LINE) * int(i % 4)
            if i % 5 == 3:
                t = t + ("\n\n" + _REP_PARA) * 2
            out.append(t)
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(out, pa.string())})

    feats = ds.map_batches(inject, batch_format="pyarrow").map_batches(
        lambda b: repetition_features(b), batch_format="pyarrow"
    )
    return feats.drop_columns(["text"])


def _sql_docs_repetition() -> str:
    """Composite oracle: per-feature CTEs joined on doc_id. Token =
    ``\\w+`` on lowercased ASCII text = ``[0-9a-z_]+``; gram char mass
    = sum of token lengths (no separators); all fractions are int/int
    double divisions (bit-identical to the numpy kernel)."""
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    parts = [f"""
base as (
  select doc_id,
    text || repeat(chr(10) || '{_REP_LINE}', doc_id % 4)
         || case when doc_id % 5 = 3
                 then repeat(chr(10) || chr(10) || '{_REP_PARA}', 2)
                 else '' end as text
  from documents),
lf as (
  select doc_id, line from (
    select doc_id, unnest(string_split(text, chr(10))) as line from base)
  where trim(line) <> ''),
ldist as (
  select doc_id, count(*) as cnt, length(line) as ln
  from lf group by doc_id, line),
lstat as (
  select doc_id,
    cast(sum(cnt - 1) as double) / sum(cnt) as dup_line_frac,
    cast(sum((cnt - 1) * ln) as double)
      / greatest(sum(cnt * ln), 1) as dup_line_char_frac
  from ldist group by doc_id),
pf as (
  select doc_id, trim(para, ' ' || chr(10)) as para from (
    select doc_id,
           unnest(string_split(text, chr(10) || chr(10))) as para
    from base)
  where trim(para, ' ' || chr(10)) <> ''),
pdist as (
  select doc_id, count(*) as cnt, length(para) as ln
  from pf group by doc_id, para),
pstat as (
  select doc_id,
    cast(sum(cnt - 1) as double) / sum(cnt) as dup_para_frac,
    cast(sum((cnt - 1) * ln) as double)
      / greatest(sum(cnt * ln), 1) as dup_para_char_frac
  from pdist group by doc_id),
tl as (
  select doc_id,
         regexp_extract_all(lower(text), '[0-9a-z_]+') as toks
  from base),
twc as (
  select doc_id,
         length(array_to_string(toks, '')) as wc, len(toks) as nt
  from tl)"""]
    for n in top_ns + dup_ns:
        parts.append(f"""
g{n} as (
  select tl.doc_id,
         array_to_string(toks[i : i + {n - 1}], ' ') as gram,
         length(array_to_string(toks[i : i + {n - 1}], '')) as gchars
  from tl, unnest(range(1, len(toks) - {n} + 2)) as u(i)),
gd{n} as (
  select doc_id, count(*) as cnt, min(gchars) as gchars
  from g{n} group by doc_id, gram)""")
        if n in top_ns:
            parts.append(f"""
s{n} as (
  select doc_id,
    coalesce(max(case when cnt > 1 then cnt * gchars end), 0) as mass
  from gd{n} group by doc_id)""")
        else:
            parts.append(f"""
s{n} as (
  select doc_id, sum((cnt - 1) * gchars) as mass
  from gd{n} group by doc_id)""")
    top_cols = ",\n  ".join(
        f"least(cast(coalesce(s{n}.mass, 0) as double)"
        f" / greatest(twc.wc, 1), 1.0) as top_{n}gram_frac"
        for n in top_ns)
    dup_cols = ",\n  ".join(
        f"least(cast(coalesce(s{n}.mass, 0) as double)"
        f" / greatest(twc.wc, 1), 1.0) as dup_{n}gram_frac"
        for n in dup_ns)
    joins = "\n  ".join(
        f"left join s{n} on s{n}.doc_id = twc.doc_id" for n in top_ns + dup_ns)
    thresh = (
        "f.dup_line_frac <= 0.30 and f.dup_para_frac <= 0.30 and "
        "f.dup_line_char_frac <= 0.20 and f.dup_para_char_frac <= 0.20 and "
        "f.top_2gram_frac <= 0.20 and f.top_3gram_frac <= 0.18 and "
        "f.top_4gram_frac <= 0.16 and "
        "f.dup_5gram_frac <= 0.15 and f.dup_6gram_frac <= 0.14 and "
        "f.dup_7gram_frac <= 0.13 and f.dup_8gram_frac <= 0.12 and "
        "f.dup_9gram_frac <= 0.11 and f.dup_10gram_frac <= 0.10"
    )
    return f"""
with {','.join(parts)},
feat as (
  select twc.doc_id,
  coalesce(lstat.dup_line_frac, 0.0) as dup_line_frac,
  coalesce(lstat.dup_line_char_frac, 0.0) as dup_line_char_frac,
  coalesce(pstat.dup_para_frac, 0.0) as dup_para_frac,
  coalesce(pstat.dup_para_char_frac, 0.0) as dup_para_char_frac,
  {top_cols},
  {dup_cols}
  from twc
  left join lstat on lstat.doc_id = twc.doc_id
  left join pstat on pstat.doc_id = twc.doc_id
  {joins})
select f.*, ({thresh}) as repetition_ok from feat f
"""


# ------------------------------------------------------------------
# 6. docs_decontam — Bloom-filter benchmark decontamination
#    (text/bloom.py) over a planted corpus: every doc gets 20
#    doc-unique tokens; docs with doc_id % 10 == 0 append the 15-token
#    benchmark passage, whose three fully-internal 13-grams are the
#    only grams in the filter. contam_frac is exactly 3/23 for planted
#    docs and 0 otherwise (m_bits = 2^22 over ~3 inserted grams puts
#    the per-gram false-positive probability below 1e-24 — the
#    expected values are deterministic and locally verified).

_DECON_PASSAGE = " ".join(f"bmq{j}" for j in range(15))


def q_docs_decontam(sf_dir: str):
    import ray

    import ray.data
    from changesetmd_ray.text.bloom import build_ngram_bloom, decontaminate

    ds = _read_ids(sf_dir, "documents", "doc_id")

    def synth(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch)
        texts = [
            " ".join(f"u{i}h{j}" for j in range(20))
            + (f" {_DECON_PASSAGE}" if i % 10 == 0 else "")
            for i in ids
        ]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    corpus = ds.map_batches(synth, batch_format="pyarrow")
    bench = ray.data.from_arrow(
        pa.table({"text": pa.array([_DECON_PASSAGE], pa.string())}))
    bloom = build_ngram_bloom(bench, text_col="text", n=13)
    out = decontaminate(corpus, ray.put(bloom), text_col="text", n=13,
                        keep_contaminated=True)
    return out.select_columns(["doc_id", "contam_frac", "contaminated"])


_SQL_DOCS_DECONTAM = """
select doc_id,
       case when doc_id % 10 = 0 then 3.0 / 23.0 else 0.0 end as contam_frac,
       doc_id % 10 = 0 as contaminated
from documents
"""


# ------------------------------------------------------------------
# 7. bpe_roundtrip — BPE tokenizer (text/bpe.py): distributed word
#    counts → deterministic merge training → broadcast encode →
#    decode, asserting the documented round-trip contract
#    ``decode(encode(text)) == " ".join(tokenize(text))`` per document
#    (holds whenever every character of the corpus appears in the
#    counted vocabulary — max_words covers the full sf vocabulary)
#    plus the id-budget invariant n_words ≤ n_ids ≤ n_chars + n_words.

def q_bpe_roundtrip(sf_dir: str):
    from changesetmd_ray.pipelines.queries import _read, _shuffle_blocks
    from changesetmd_ray.text.bpe import (
        bpe_encode,
        decode,
        train_bpe,
        word_counts,
    )
    from changesetmd_ray.text.hashing import tokenize

    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640))
    model = train_bpe(word_counts(ds, max_words=100_000), vocab_size=300)
    encoded = bpe_encode(ds, model, text_col="text", out_col="token_ids")

    def fin(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["token_ids"].to_pylist()
        rt, budget = [], []
        for t, tid in zip(texts, ids):
            toks = tokenize(t or "")
            rt.append(decode(tid, model) == " ".join(toks))
            budget.append(
                len(toks) <= len(tid) <= sum(len(w) + 1 for w in toks))
        return pa.table({
            "doc_id": batch["doc_id"],
            "roundtrip_ok": pa.array(rt),
            "ids_in_budget": pa.array(budget),
        })

    return encoded.map_batches(fin, batch_format="pyarrow")


_SQL_BPE_ROUNDTRIP = """
select doc_id, true as roundtrip_ok, true as ids_in_budget from documents
"""


# ------------------------------------------------------------------
# 8. packing_export — sequence packing plans (stages/packing.py) and
#    the split/shuffle export sink (stages/export.py), reduced to
#    check/value assertion rows. The permutation key is a seeded
#    splitmix64 chain SQL cannot reproduce, so the oracle pins the
#    plan INVARIANTS instead: both plans cover every document exactly
#    once with its exact token count; chunk rows reassemble into a
#    gap-free per-shard token stream; pack sequences never overflow
#    except documented singletons; the 3-way split export is disjoint,
#    complete, near its fractions, and reads back identically.

_EXPORT_DIR = "/tmp/changesetmd_q_packing_export"


def q_packing_export(sf_dir: str):
    import shutil

    from changesetmd_ray.pipelines.queries import _read, _shuffle_blocks
    from changesetmd_ray.stages.export import read_export, split_export
    from changesetmd_ray.stages.packing import chunk_sequences, pack_sequences

    max_tokens = 512
    ds = _read(sf_dir, "documents", ["doc_id", "text"],
               blocks=_shuffle_blocks(sf_dir, "documents", rows_per_block=640))

    def with_len(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pc.add(pc.utf8_length(batch["text"]), 1),
        })

    docs = ds.map_batches(with_len, batch_format="pyarrow")

    chunk = chunk_sequences(docs, id_col="doc_id", len_col="n_tokens",
                            max_tokens=max_tokens, num_shards=8)
    pack = pack_sequences(docs, id_col="doc_id", len_col="n_tokens",
                          max_tokens=max_tokens, num_shards=8)

    def chunk_shard_violations(group: pa.Table) -> pa.Table:
        seq = group["seq"].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False)
        n = group["n_tokens"].to_numpy(zero_copy_only=False)
        sp = group["n_seqs_spanned"].to_numpy(zero_copy_only=False)
        start = seq * max_tokens + pos
        order = np.argsort(start)
        start, n_o, sp_o, pos_o = start[order], n[order], sp[order], pos[order]
        bad = int((pos_o < 0).sum() + (pos_o >= max_tokens).sum())
        bad += int((sp_o != (pos_o + n_o - 1) // max_tokens + 1).sum())
        if len(start):
            bad += int(start[0] != 0)
            bad += int((start[1:] != start[:-1] + n_o[:-1]).sum())
        return pa.table({"v": pa.array([bad], pa.int64())})

    def pack_seq_violations(group: pa.Table) -> pa.Table:
        pos = group["pos"].to_numpy(zero_copy_only=False)
        n = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(pos)
        pos_o, n_o = pos[order], n[order]
        total = int(n_o.sum())
        bad = int(total > max_tokens and len(n_o) > 1)
        bad += int(pos_o[0] != 0)
        bad += int((pos_o[1:] != pos_o[:-1] + n_o[:-1]).sum())
        return pa.table({"v": pa.array([bad], pa.int64())})

    def agg_plan(plan, group_cols, viol_fn):
        stats = plan.map_batches(
            lambda b: pa.table({
                "docs": pa.array([len(b)], pa.int64()),
                "toks": pa.array(
                    [int(b["n_tokens"].to_numpy(
                        zero_copy_only=False).sum())], pa.int64()),
            }),
            batch_format="pyarrow",
        ).to_pandas()
        v = (
            plan.groupby(group_cols)
            .map_groups(viol_fn, batch_format="pyarrow")
            .to_pandas()["v"].sum()
        )
        return int(stats["docs"].sum()), int(stats["toks"].sum()), int(v)

    c_docs, c_toks, c_viol = agg_plan(chunk, "shard", chunk_shard_violations)
    p_docs, p_toks, p_viol = agg_plan(pack, ["shard", "seq"],
                                      pack_seq_violations)

    shutil.rmtree(_EXPORT_DIR, ignore_errors=True)
    fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    manifests = split_export(docs, _EXPORT_DIR, id_col="doc_id",
                             fractions=fractions, num_shards=4)
    split_rows = {
        name: int(m["rows"].to_pandas().sum()) if len(m) else 0
        for name, m in manifests.items()
    }
    total_rows = sum(split_rows.values())
    n_in = docs.count()
    backs = [
        read_export(f"{_EXPORT_DIR}/{name}").select_columns(["doc_id"])
        for name in fractions
    ]
    union = backs[0]
    for b in backs[1:]:
        union = union.union(b)
    back_ids = union.to_pandas()["doc_id"]
    readback_ok = int(
        len(back_ids) == total_rows == n_in
        and back_ids.nunique() == n_in
    )
    frac_ok = int(all(
        abs(split_rows[name] - f * n_in) <= max(0.5 * f * n_in, 8)
        for name, f in fractions.items()
    ))

    rows = [
        ("chunk_n_docs", c_docs),
        ("chunk_n_tokens", c_toks),
        ("chunk_violations", c_viol),
        ("pack_n_docs", p_docs),
        ("pack_n_tokens", p_toks),
        ("pack_violations", p_viol),
        ("export_rows", total_rows),
        ("export_readback_ok", readback_ok),
        ("export_frac_ok", frac_ok),
    ]
    return pa.table({
        "check": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.int64()),
    })


_SQL_PACKING_EXPORT = """
with n as (select count(*) as docs,
                  cast(sum(length(text) + 1) as bigint) as toks
           from documents)
select 'chunk_n_docs' as check, docs as value from n
union all select 'chunk_n_tokens', toks from n
union all select 'chunk_violations', cast(0 as bigint)
union all select 'pack_n_docs', docs from n
union all select 'pack_n_tokens', toks from n
union all select 'pack_violations', cast(0 as bigint)
union all select 'export_rows', docs from n
union all select 'export_readback_ok', cast(1 as bigint)
union all select 'export_frac_ok', cast(1 as bigint)
"""


# ------------------------------------------------------------------
# 9. curation_docs — the full curate() composition
#    (pipelines/curation.py) over a planted corpus where each stage
#    removes exactly one id class (the e2e-test fixture lifted to a
#    pure function of doc_id so both engines construct it):
#      cat = doc_id % 12
#      0/1/2 clean survivors · 3 German (language) · 4 short (quality)
#      · 5 repetitive line (repetition) · 6 exact dup of cat-0
#      (exact_dedup keeps the smaller id) · 7 near dup of cat-1
#      (MinHash keeps the smaller id) · 8 benchmark-contaminated
#      (decontaminate) · 9 email carrier (survives, scrubbed) ·
#      10 blocked host (blocklist) · 11 spam (classifier threshold).
#    Expected survivors and their exact post-scrub text are
#    closed-form in SQL. domain_cap/LM/resample are covered by their
#    own queries and units (their membership depends on floats or
#    hashes SQL cannot restate).

def _curation_text_url(doc_id: int) -> tuple[str, str]:
    cat = doc_id % 12
    url = f"https://h{doc_id % 7}.example/d{doc_id}"
    base = _EN + " " + " ".join(f"token{doc_id}x{j}" for j in range(15))
    if cat <= 2:
        return base, url
    if cat == 3:
        return ("der hund und die katze das haus ist nicht mit einem von zu "
                "der die das und ist nicht mit ein von zu der die das und "
                "ist"), url
    if cat == 4:
        return "tiny doc", url
    if cat == 5:
        return "the cat sat on the mat and looked around slowly\n" * 15, url
    if cat == 6:  # exact duplicate of the cat-0 doc six below
        target = doc_id - 6
        return (_EN + " "
                + " ".join(f"token{target}x{j}" for j in range(15))), url
    if cat == 7:  # near duplicate of the cat-1 doc six below
        target = doc_id - 6
        return (_EN + " "
                + " ".join(f"token{target}x{j}" for j in range(15))
                + " slightly changed"), url
    if cat == 8:
        return (f"{_EN} and then the benchmark text {_BENCH} appears "
                + " ".join(f"bmt{doc_id}z{j}" for j in range(10))), url
    if cat == 9:
        return (_EN + " " + " ".join(f"mail{doc_id}y{j}" for j in range(12))
                + f" contact us at someone{doc_id}@example.com today"), url
    if cat == 10:
        return (f"{_EN} hosted on a blocked domain variant {doc_id}",
                f"https://ads.blocked.example/d{doc_id}")
    return ("the and of " + _SPAM + " "
            + " ".join(f"spam{doc_id}q{j}" for j in range(8))), url


def q_curation_docs(sf_dir: str):
    import ray
    import ray.data

    from changesetmd_ray.pipelines.curation import CurationConfig, curate
    from changesetmd_ray.text.classifier import train_classifier

    ds = _read_ids(sf_dir, "documents", "doc_id")

    def synth(batch: pa.Table) -> pa.Table:
        ids = _ids_np(batch)
        pairs = [_curation_text_url(int(i)) for i in ids]
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.array([p[0] for p in pairs], pa.string()),
            "url": pa.array([p[1] for p in pairs], pa.string()),
        })

    corpus = ds.map_batches(synth, batch_format="pyarrow")
    model = train_classifier(
        [f"{_EN} ex{i}" for i in range(8)],
        [f"the and of {_SPAM} ex{i}" for i in range(8)],
        n_buckets=1 << 16,
    )
    bench_ds = ray.data.from_arrow(
        pa.table({"text": pa.array(
            [f"question: {_BENCH} answer: yes"], pa.string())}))
    cfg = CurationConfig(
        blocklist=["blocked.example"],
        classifier_model=model,
        classifier_threshold=0.5,
        benchmark_texts=bench_ds,
        minhash_kwargs={"batch_size": 64},
    )
    res = curate(corpus, url_col="url", config=cfg)
    return res.dataset.select_columns(["doc_id", "text"])


def _sql_curation_docs() -> str:
    base = (f"'{_EN} ' || array_to_string(list_transform(range(15), "
            "j -> 'token' || doc_id || 'x' || j), ' ')")
    mail = (f"'{_EN} ' || array_to_string(list_transform(range(12), "
            "j -> 'mail' || doc_id || 'y' || j), ' ')"
            " || ' contact us at |||EMAIL_ADDRESS||| today'")
    return f"""
select doc_id,
       case when doc_id % 12 <= 2 then {base} else {mail} end as text
from documents
where doc_id % 12 in (0, 1, 2, 9)
"""
