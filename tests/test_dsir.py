"""DSIR importance resampling: distributions, scores, Gumbel selection."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.dsir import (
    bucket_distribution,
    dsir_resample,
    dsir_scores,
    gumbel_topk,
)


def _corpus(spark):
    # two dialects: "code-like" docs (target) vs "prose" docs
    rows = []
    for i in range(20):
        rows.append((i, "def foo return lambda class import python code"))
    for i in range(20, 60):
        rows.append((i, "the cat sat on the mat and looked at the dog"))
    rows.append((60, None))  # null text
    rows.append((61, "!!! ???"))  # tokenless
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_bucket_distribution_bounded_rows(spark):
    df = _corpus(spark)
    dist = bucket_distribution(df, buckets=32)
    assert dist.count() <= 32
    total = dist.agg(F.sum("cnt")).first()[0]
    # 20 docs x 8 tokens + 40 docs x 11 tokens
    assert total == 20 * 8 + 40 * 11


def test_dsir_scores_separate_target_from_raw(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)  # code-like docs
    scored = dsir_scores(df, target, buckets=256)
    rows = {r.doc_id: r.dsir_score for r in scored.collect()}
    code = [rows[i] for i in range(20)]
    prose = [rows[i] for i in range(20, 60)]
    assert min(code) > max(prose)  # clean separation on disjoint vocab
    assert rows[60] == 0.0 and rows[61] == 0.0


def test_dsir_scores_matches_python_replay(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)
    B, A = 64, 0.5
    scored = {
        r.doc_id: (r.n_toks, r.dsir_score)
        for r in dsir_scores(df, target, buckets=B, alpha=A).collect()
    }
    # pure-python replay with the same md5-prefix hash
    import collections
    import hashlib

    def h28(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    def toks(t):
        import re

        return re.findall(r"[a-z0-9]+", (t or "").lower())

    texts = {r.doc_id: r.text for r in df.collect()}
    rawc, tgtc = collections.Counter(), collections.Counter()
    for did, t in texts.items():
        if t is None:
            continue
        for w in toks(t):
            b = h28(w) % B
            rawc[b] += 1
            if did < 20:
                tgtc[b] += 1
    rn, tn = sum(rawc.values()), sum(tgtc.values())
    for did, t in texts.items():
        ts = toks(t) if t is not None else []
        terms = sorted(
            math.log((tgtc[h28(w) % B] + A) / (tn + A * B))
            - math.log((rawc[h28(w) % B] + A) / (rn + A * B))
            for w in ts
        )
        acc = 0.0
        for x in terms:
            acc += x
        n_toks, score = scored[did]
        assert n_toks == len(ts)
        assert score == pytest.approx(acc, rel=1e-12, abs=1e-12)


def test_gumbel_topk_deterministic(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)
    scored = dsir_scores(df, target, buckets=128)
    a = [(r.doc_id, r.sel_rank) for r in gumbel_topk(scored, 10).collect()]
    b = [(r.doc_id, r.sel_rank) for r in gumbel_topk(scored, 10).collect()]
    assert sorted(a) == sorted(b)
    assert len(a) == 10


def test_gumbel_topk_prefers_target_like(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)
    top = dsir_resample(df, target, k=15, buckets=256)
    ids = {r.doc_id for r in top.collect()}
    # separation is >> gumbel noise scale, so all picks are code docs
    assert ids <= set(range(20))


def test_dsir_resample_frac_threshold_path(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)
    kept = dsir_resample(df, target, frac=0.3, buckets=256, accuracy=10000)
    n = kept.count()
    assert 10 <= n <= 25  # ~30% of 62, sketch-tolerant bounds
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" not in plan  # threshold cut, no ordering


def test_dsir_resample_arg_validation(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_resample(df, df, k=5, frac=0.5)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_resample(df, df)
    with pytest.raises(ValueError, match="alpha"):
        dsir_scores(df, df, alpha=0.0)


def test_dsir_scoring_is_projection_after_model(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)
    plan = (
        dsir_scores(df, target, buckets=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the scoring side must broadcast the 1-row model, never shuffle docs
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_xxhash_fast_path_runs(spark):
    df = _corpus(spark)
    target = df.where(F.col("doc_id") < 20)
    scored = dsir_scores(df, target, buckets=128, portable=False)
    rows = {r.doc_id: r.dsir_score for r in scored.collect()}
    code = [rows[i] for i in range(20)]
    prose = [rows[i] for i in range(20, 60)]
    assert min(code) > max(prose)
