"""Deterministic sampling stages (O3 family).

Systematic multiplicative-hash sampling — reproducible across engines,
runs and partitionings, unlike ``Dataset.random_sample``: a row's fate
depends only on its key. The hash is Knuth's multiplicative scheme in
exact integer arithmetic (``(key · 2654435761) mod 2³²``), chosen
because the identical expression evaluates bit-equal in ANSI SQL
(hugeint product — see the oracle strings in ``pipelines/queries.py``).

:func:`stratified_sample` extends it per-stratum: each group value gets
its own keep-rate, so a pipeline can e.g. keep 100 % of rare
``purchase`` events while thinning ``view`` noise — the standard
class-balancing step of a training-data pipeline. Map-only: no shuffle,
no state, the streaming executor fuses it into adjacent stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)
_SALT_MIX = np.uint64(2654435769)  # odd (Fibonacci) — spreads small salts


def _key_hash32(
    batch: pa.Table, key_col: str, salt: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """(hash32, valid) for the key column. Null keys are NEVER sampled
    (the SQL oracle's NULL comparison is false); negative keys are
    rejected — DuckDB's hugeint ``%`` returns a negative remainder
    (always kept) while the uint64 wrap hashes uniformly, so the two
    engines would silently diverge.

    ``salt`` decorrelates this stage's hash stream from every other
    consumer of the same key (``salt=0`` is the historical stream).
    Without it, chained deterministic stages COUPLE: ``domain_cap``
    keeps the per-host rows with the LOWEST ``hash32(key)``, so a
    later unsalted ``weighted_sample`` over capped survivors sees only
    low-hash rows and keeps essentially all of them regardless of
    their weights. The salted stream stays SQL-expressible:
    ``xor(k, (salt * 2654435769) % 2^32)`` before the multiply."""
    col = batch[key_col]
    valid = ~np.asarray(pc.is_null(col).combine_chunks())
    k = col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    if (k < 0).any():
        raise ValueError(
            f"{key_col}: negative sampling keys are not supported (SQL-oracle "
            "modulo semantics diverge from the uint64 wrap)"
        )
    ku = k.astype(np.uint64)
    if salt:
        if not 0 <= int(salt) < (1 << 32):
            raise ValueError(f"salt must be in [0, 2^32), got {salt}")
        with np.errstate(over="ignore"):
            ku = ku ^ ((np.uint64(salt) * _SALT_MIX) % _MOD32)
    with np.errstate(over="ignore"):
        return (ku * _KNUTH) % _MOD32, valid


def _threshold(rate: float) -> np.uint64:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return np.uint64(int(rate * float(_MOD32)))


def systematic_sample(ds, *, key_col: str, rate: float, salt: int = 0):
    """Keep a row iff ``hash32(key) < rate · 2³²`` — the ~``rate``
    fraction, deterministically. Pass a distinct ``salt`` when another
    hash-keyed stage (``domain_cap``, another sample) already consumed
    the same key stream (see :func:`_key_hash32`)."""
    thr = _threshold(rate)

    def pick(batch: pa.Table) -> pa.Table:
        h, valid = _key_hash32(batch, key_col, salt)
        return batch.filter(pa.array(valid & (h < thr)))

    return ds.map_batches(pick, batch_format="pyarrow")


def weighted_sample(ds, *, key_col: str, weight_col: str,
                    scale: float = 1.0, power: float = 1.0,
                    salt: int = 0):
    """Per-row importance resampling: keep a row iff ``hash32(key) <
    clamp(scale · w^power, 0, 1) · 2³²`` where ``w`` is the row's
    ``weight_col`` value — the standard way to shape a corpus from a
    quality/classifier score (``power`` is the temperature knob:
    < 1 flattens, > 1 sharpens the score distribution). Deterministic,
    map-only, same SQL-reproducible hash as :func:`systematic_sample`.
    Null / negative / non-finite weights are never kept. Pass a
    distinct ``salt`` when chained after another hash-keyed stage on
    the same key (see :func:`_key_hash32` — unsalted reuse after
    ``domain_cap`` keeps capped-domain survivors regardless of
    weight)."""
    if scale < 0:
        raise ValueError(f"scale must be ≥ 0, got {scale}")

    def pick(batch: pa.Table) -> pa.Table:
        h, valid = _key_hash32(batch, key_col, salt)
        wcol = batch[weight_col]
        wvalid = ~np.asarray(pc.is_null(wcol).combine_chunks())
        w = wcol.fill_null(0).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = wvalid & np.isfinite(w) & (w >= 0)
        with np.errstate(invalid="ignore"):
            p = np.clip(scale * np.power(np.where(ok, w, 0.0), power), 0.0, 1.0)
        thr = (p * float(_MOD32)).astype(np.uint64)
        return batch.filter(pa.array(valid & ok & (h < thr)))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(
    ds,
    *,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
):
    """Per-stratum deterministic sampling: a row whose ``group_col``
    value is ``g`` is kept iff ``hash32(key) < rates.get(g,
    default_rate) · 2³²``. Unknown groups (and null) take
    ``default_rate``. Vectorized via dictionary-encoding the group
    column per batch — the Python loop touches distinct values only.
    ``salt`` decorrelates from other hash-keyed stages (see
    :func:`_key_hash32`)."""
    thr_map = {g: _threshold(r) for g, r in rates.items()}
    default_thr = _threshold(default_rate)

    def pick(batch: pa.Table) -> pa.Table:
        h, kvalid = _key_hash32(batch, key_col, salt)
        enc = pc.dictionary_encode(batch[group_col]).combine_chunks()
        gvalid = np.asarray(enc.indices.is_valid())
        codes = enc.indices.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        dict_vals = enc.dictionary.to_pylist()
        thr_by_code = np.fromiter(
            (thr_map.get(v, default_thr) for v in dict_vals), np.uint64,
            len(dict_vals),
        )
        thr = np.where(gvalid, thr_by_code[codes] if len(dict_vals) else default_thr,
                       default_thr)
        return batch.filter(pa.array(kvalid & (h < thr)))

    return ds.map_batches(pick, batch_format="pyarrow")
