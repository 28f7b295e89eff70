"""exact_quantiles vs DuckDB quantile_disc on adversarial shapes (ties,
nulls, NaN, constant columns, empty input)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from changesetmd_ray.stages.stats import exact_quantiles

QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _oracle(vals, qs=QS):
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals, pa.float64())}))
    got = con.execute(f"select quantile_disc(x, {qs}) from t").fetchone()[0]
    return got


def _engine(vals, qs=QS, **kw):
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(4)
    out = exact_quantiles(ds, col="x", qs=qs, **kw)
    return out["value"].to_pylist()


def test_quantiles_random_with_heavy_ties(ray_session):
    rng = np.random.default_rng(2)
    vals = np.round(rng.standard_normal(20_000) * 10, 1)  # ~400 distinct → ties
    assert _engine(list(vals)) == _oracle(list(vals))


def test_quantiles_skewed_range(ray_session):
    rng = np.random.default_rng(3)
    vals = list(rng.random(5_000)) + [1e12]  # outlier crushes bin resolution
    assert _engine(vals, num_bins=64) == _oracle(vals)


def test_quantiles_nulls_and_nan_excluded(ray_session):
    vals = [1.0, None, 2.0, float("nan"), 3.0, None, 4.0]
    # DuckDB ignores NULLs; NaN sorts as the largest double there, so
    # compare against the explicit non-null non-NaN definition
    clean = [1.0, 2.0, 3.0, 4.0]
    assert _engine(vals) == _oracle(clean)


def test_quantiles_constant_and_empty(ray_session):
    assert _engine([7.5] * 100) == [7.5] * len(QS)
    out = exact_quantiles(
        ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())})),
        col="x", qs=QS,
    )
    assert out["value"].null_count == len(QS)


def test_hll_distinct_error_bounds(ray_session):
    """HLL estimate within ~4 standard errors of exact distinct count
    across cardinalities spanning the linear-counting and raw-estimate
    regimes; deterministic (hash-based, no RNG)."""
    from changesetmd_ray.stages.stats import hll_distinct

    rng = np.random.default_rng(9)
    for true_n in [50, 3_000, 80_000]:
        keys = rng.choice(np.arange(true_n, dtype=np.int64) * 7 + 3, size=true_n * 3)
        exact = len(np.unique(keys))
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(keys, pa.int64())})
        ).repartition(8)
        est = hll_distinct(ds, col="k", p=12)["n_distinct_est"][0].as_py()
        rel_err = abs(est - exact) / exact
        assert rel_err < 4 * 1.04 / np.sqrt(4096), (exact, est, rel_err)
        # determinism + merge-order independence: same input, different
        # partitioning → identical registers → identical estimate
        est2 = hll_distinct(
            ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(3),
            col="k", p=12,
        )["n_distinct_est"][0].as_py()
        assert est2 == est


def test_quantiles_int64_above_2_53_stay_exact(ray_session):
    """int64 columns must not round-trip through float64 — values above
    2^53 would silently corrupt."""
    base = 2**62
    vals = [base + i for i in range(101)]  # consecutive → float64 collapses them
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(4)
    out = exact_quantiles(ds, col="x", qs=[0.0, 0.5, 1.0])
    got = out["value"].to_pylist()
    assert out["value"].type == pa.int64()
    assert got == [base, base + 50, base + 100]
