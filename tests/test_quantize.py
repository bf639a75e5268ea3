"""int8 scalar quantization: codes, round-trip fidelity, integer top-k."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.quantize import (
    dequantize,
    quantization_error_report,
    quantize_embeddings,
    quantized_dot,
    quantized_topk,
)


def _vecs(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, -1.0, 0.5, 0.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),   # zero vector
            (2, [2.0, 1.0, -0.5, 0.25]),
            (3, None),                    # null vector passes through
        ],
        "vec_id int, embedding array<float>",
    )


def test_quantize_known_codes(spark):
    out = quantize_embeddings(_vecs(spark), keep_vec=True)
    rows = {r.vec_id: (r.q_scale, r.q) for r in out.collect()}
    assert rows[0] == (1.0, [127, -127, 64, 0])  # 0.5*127+0.5=64.0
    assert rows[1] == (0.0, [0, 0, 0, 0])
    # scale 2.0: [127, 64, -31, 16] (1/2*127+.5=64.0; -0.25*127+.5
    # = -31.25 -> floor -32? no: -31.75+0.5=-31.25 -> floor(-31.25)=-32)
    assert rows[2] == (2.0, [127, 64, -32, 16])
    assert rows[3] == (None, None)


def test_quantize_codes_within_int8_range(spark):
    import random

    rng = random.Random(7)
    data = [
        (i, [rng.uniform(-10, 10) for _ in range(32)]) for i in range(50)
    ]
    df = spark.createDataFrame(data, "vec_id int, embedding array<float>")
    out = quantize_embeddings(df)
    mn, mx = out.select(
        F.min(F.array_min("q")), F.max(F.array_max("q"))
    ).first()
    assert -127 <= mn and mx <= 127


def test_quantize_is_pure_projection(spark):
    plan = (
        quantize_embeddings(_vecs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Aggregate" not in plan


def test_dequantize_roundtrip_error_bound(spark):
    # |x - deq(q(x))| <= scale/254 per component (half a code step)
    out = quantize_embeddings(_vecs(spark), keep_vec=True).where(
        F.col("embedding").isNotNull() & (F.col("q_scale") > 0)
    )
    err = out.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                dequantize(F.col("q"), F.col("q_scale")),
                lambda x, y: F.abs(x - y),
            ),
            F.lit(0.0),
            lambda a, v: F.greatest(a, v),
        ).alias("maxerr"),
        (F.col("q_scale") / F.lit(254.0) + F.lit(1e-12)).alias("bound"),
    )
    assert err.where(F.col("maxerr") > F.col("bound")).count() == 0


def test_quantized_dot_approximates_float_dot(spark):
    import random

    rng = random.Random(3)
    a = [rng.uniform(-1, 1) for _ in range(64)]
    b = [rng.uniform(-1, 1) for _ in range(64)]
    true_dot = sum(x * y for x, y in zip(a, b))
    df = spark.createDataFrame(
        [(0, a, b)], "i int, va array<float>, vb array<float>"
    )
    qa = quantize_embeddings(df, "va", q_col="qa", scale_col="sa")
    qb = quantize_embeddings(qa, "vb", q_col="qb", scale_col="sb")
    got = qb.select(
        quantized_dot(
            F.col("qa"), F.col("qb"), F.col("sa"), F.col("sb")
        ).alias("d")
    ).first().d
    # error bound ~ ||a||_1 * step_b + ||b||_1 * step_a; loose: 2%
    assert got == pytest.approx(true_dot, abs=0.05 * 64 / 127)


def test_quantization_error_report_values(spark):
    rep = quantization_error_report(_vecs(spark)).first()
    # null vector excluded; zero vector contributes null cosine
    assert rep.n_vectors == 2
    assert rep.min_cos > 0.999  # 4-dim friendly values, near-exact
    assert rep.max_cos <= 1.0 + 1e-9


def test_quantized_topk_matches_float_ranking(spark):
    import random

    rng = random.Random(11)
    data = [
        (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(40)
    ]
    df = spark.createDataFrame(data, "vec_id int, embedding array<float>")
    got = quantized_topk(df, [0, 1], k=3)
    rows = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
    # python exact cosine replay on the QUANTIZED codes
    def quant(v):
        s = max(abs(x) for x in v)
        return [math.floor(x / s * 127 + 0.5) for x in v]

    qd = {i: quant(v) for i, v in data}
    for qid in (0, 1):
        sims = []
        for nid, q in qd.items():
            if nid == qid:
                continue
            num = sum(x * y for x, y in zip(qd[qid], q))
            den = math.sqrt(sum(x * x for x in qd[qid])) * math.sqrt(
                sum(x * x for x in q)
            )
            sims.append((-num / den, nid))
        sims.sort()
        for rank, (_, nid) in enumerate(sims[:3], start=1):
            assert rows[(qid, rank)] == nid


def test_quantized_topk_rejects_oversized_query_side(spark):
    df = _vecs(spark)
    with pytest.raises(ValueError, match="max_queries"):
        quantized_topk(df, list(range(100)), k=1, max_queries=10)
