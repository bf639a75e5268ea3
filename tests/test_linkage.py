"""Fuzzy (edit-distance) join: prefix-filtered q-gram blocking."""

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.linkage import fuzzy_join


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = min(
                dp[j] + 1,
                dp[j - 1] + 1,
                prev + (a[i - 1] != b[j - 1]),
            )
            prev, dp[j] = dp[j], cur
    return dp[n]


def _brute(names_a, names_b, k):
    return {
        (ia, ib, _lev(a, b))
        for ia, a in names_a
        for ib, b in names_b
        if a is not None and b is not None and _lev(a, b) <= k
    }


def test_fuzzy_join_known_pairs(spark):
    a = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "alice cooper"), (3, "bob")],
        "id int, name string",
    )
    b = spark.createDataFrame(
        [(10, "jonathon smith"), (11, "alice coper"), (12, "rob"),
         (13, "completely different")],
        "id int, name string",
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(
            a, b, "name", max_dist=1, id_col_a="id", id_col_b="id"
        ).collect()
    }
    assert got == {(1, 10, 1), (2, 11, 1), (3, 12, 1)}


def test_fuzzy_join_null_and_exact(spark):
    a = spark.createDataFrame(
        [(1, "same"), (2, None)], "id int, name string"
    )
    b = spark.createDataFrame(
        [(10, "same"), (11, None)], "id int, name string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(a, b, "name", max_dist=0).collect()
    }
    assert got == {(1, 10, 0)}


@pytest.mark.parametrize("k,q", [(1, 3), (2, 3), (2, 2)])
def test_fuzzy_join_differential_no_false_negatives(spark, k, q):
    import random

    rng = random.Random(100 * k + q)
    alphabet = "abcdef"

    def word():
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 12))
        )

    names_a = [(i, word()) for i in range(60)]
    # side b: half perturbed copies of a, half fresh
    def perturb(s):
        if not s:
            return s
        i = rng.randrange(len(s))
        op = rng.choice(["del", "sub", "ins"])
        if op == "del":
            return s[:i] + s[i + 1:]
        if op == "sub":
            return s[:i] + rng.choice(alphabet) + s[i + 1:]
        return s[:i] + rng.choice(alphabet) + s[i:]

    names_b = [
        (100 + i, perturb(names_a[i][1])) for i in range(30)
    ] + [(200 + i, word()) for i in range(30)]
    a = spark.createDataFrame(names_a, "id int, name string")
    b = spark.createDataFrame(names_b, "id int, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(a, b, "name", max_dist=k, q=q).collect()
    }
    assert got == _brute(names_a, names_b, k)


def test_fuzzy_join_short_string_tail(spark):
    # strings at/below q(k+1)-1 can share ZERO grams with a true match;
    # the length-band fallback must still find them
    a = spark.createDataFrame(
        [(1, "abc"), (2, "xy"), (3, "abcde")], "id int, name string"
    )
    b = spark.createDataFrame(
        [(10, "abd"), (11, "xz"), (12, "abcdf")], "id int, name string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_join(a, b, "name", max_dist=1, q=3).collect()
    }
    assert {(1, 10), (2, 11), (3, 12)} <= got


def test_fuzzy_join_no_cartesian_product(spark):
    a = spark.createDataFrame(
        [(i, f"name{i:04d}") for i in range(50)], "id int, name string"
    )
    plan = (
        fuzzy_join(a, a, "name", max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_fuzzy_join_arg_validation(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(a, a, "name", max_dist=-1)
    with pytest.raises(ValueError, match="q must"):
        fuzzy_join(a, a, "name", q=1)


def test_fuzzy_join_empty_and_unicode_strings(spark):
    a = spark.createDataFrame(
        [(1, ""), (2, "é"), (3, "münchen")], "id int, name string"
    )
    b = spark.createDataFrame(
        [(10, "x"), (11, "e"), (12, "munchen"), (13, "")],
        "id int, name string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_join(a, b, "name", max_dist=1, q=3).collect()
    }
    # every pair within distance 1: "" matches all len<=1 strings,
    # "é" matches "x"/"e" (substitution) and "" (deletion),
    # "münchen"<->"munchen" is one substitution
    assert got == {
        (1, 10), (1, 11), (1, 13),
        (2, 10), (2, 11), (2, 13),
        (3, 12),
    }
