"""Product quantization: fit determinism, encode correctness, ADC
search recall, fidelity report."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.pq import (
    pq_encode,
    pq_error_report,
    pq_fit,
    pq_search,
)


def _vectors(spark, n=64, d=8, seed=11):
    rng = np.random.default_rng(seed)
    # 4 well-separated clusters so small-k PQ can represent the data
    centers = rng.normal(scale=5.0, size=(4, d))
    X = centers[np.arange(n) % 4] + rng.normal(scale=0.2, size=(n, d))
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_fit_shape_and_determinism(spark):
    _, df = _vectors(spark)
    cb1 = pq_fit(df, m=2, k=4, max_iter=5)
    cb2 = pq_fit(df, m=2, k=4, max_iter=5)
    assert cb1.shape == (2, 4, 4)
    assert np.allclose(cb1, cb2)  # no RNG anywhere


def test_pq_fit_rejects_bad_m(spark):
    _, df = _vectors(spark, d=8)
    with pytest.raises(ValueError, match="divide evenly"):
        pq_fit(df, m=3, k=2)


def test_pq_encode_matches_numpy_argmin(spark):
    X, df = _vectors(spark)
    cb = pq_fit(df, m=2, k=4, max_iter=5)
    out = {r.vec_id: r.pq_code
           for r in pq_encode(df, cb).select("vec_id", "pq_code").collect()}
    dsub = 4
    for i, x in enumerate(X):
        for j in range(2):
            sub = x[j * dsub:(j + 1) * dsub]
            ref = int(np.argmin(((cb[j] - sub) ** 2).sum(axis=1)))
            assert out[i][j] == ref


def test_pq_encode_null_vector(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "vec_id long, embedding array<double>"
    )
    cb = np.zeros((1, 2, 2))
    cb[0, 1] = [1.0, 2.0]
    out = {r.vec_id: r.pq_code for r in pq_encode(df, cb).collect()}
    assert out[0] == [1] and out[1] is None


def test_pq_search_adc_matches_table_sum_and_finds_neighbors(spark):
    X, df = _vectors(spark)
    cb = pq_fit(df, m=2, k=4, max_iter=5)
    codes = pq_encode(df, cb).select("vec_id", "pq_code")
    q = X[0]
    top = pq_search(codes, q, cb, topk=10).collect()
    ids = [r.vec_id for r in top]
    # ADC distances ascending and nonnegative
    dists = [r.adc_dist for r in top]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)
    # clustered data: the query's own cluster mates dominate the top-k
    mates = {i for i in range(64) if i % 4 == 0}
    assert len(set(ids) & mates) >= 8
    # exact ADC replay for the best hit
    code = {r.vec_id: r.pq_code for r in codes.collect()}[ids[0]]
    dsub = 4
    ref = sum(
        float(((cb[j, code[j]] - q[j * dsub:(j + 1) * dsub]) ** 2).sum())
        for j in range(2)
    )
    assert top[0].adc_dist == pytest.approx(ref)


def test_pq_error_report_fidelity(spark):
    X, df = _vectors(spark)
    cb = pq_fit(df, m=2, k=4, max_iter=10)
    r = pq_error_report(df, cb).collect()[0]
    assert r.n == 64
    assert r.mse >= 0 and r.max_sq_err >= r.mse
    # well-separated clusters with k=4 per subspace reconstruct well
    assert r.mean_cos > 0.95


def test_pq_search_rejects_dim_mismatch(spark):
    _, df = _vectors(spark)
    cb = pq_fit(df, m=2, k=4)
    codes = pq_encode(df, cb).select("vec_id", "pq_code")
    with pytest.raises(ValueError, match="query dim"):
        pq_search(codes, [1.0, 2.0], cb)
