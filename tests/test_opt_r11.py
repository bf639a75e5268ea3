"""Optimization-round equivalence guards (r11 perf work).

Every optimization here restructures HOW a result is computed, never
WHAT: each test pins bit-identical output between the old (reference)
construction and the optimized one.
"""

from __future__ import annotations

import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# fast contract-relevant lane: `pytest -m smoke` (see pytest.ini)
pytestmark = pytest.mark.smoke


class TestLshSignatureSql:
    """The one-round-trip SQL build of the sign-bit signature must be
    bit-identical to the per-plane Column build it replaces."""

    @pytest.mark.parametrize("dim,n_planes", [(64, 56), (16, 16), (8, 3)])
    def test_bit_identical(self, spark, dim, n_planes):
        from pandera_spark.operators.similarity import (
            _hyperplanes,
            lsh_signature,
            lsh_signature_sql,
        )

        planes = _hyperplanes(dim, n_planes)
        rng = random.Random(7)
        rows = [
            (i, [rng.gauss(0.0, 1.0) for _ in range(dim)])
            for i in range(200)
        ]
        rows.append((998, [0.0] * dim))  # zero vector: every dot == 0
        rows.append((999, [1e-300] * dim))  # denormal-adjacent dots
        df = spark.createDataFrame(rows, "id long, v array<double>")
        old = lsh_signature(F.col("v"), planes)
        new = F.expr(lsh_signature_sql("`v`", planes))
        bad = (
            df.select(old.alias("a"), new.alias("b"))
            .filter("a != b OR a IS NULL OR b IS NULL")
            .count()
        )
        assert bad == 0

    def test_hash_embed_matches_python_reference(self, spark):
        """hash_embed's generated-SQL fold must equal a pure-Python
        md5 reference (token -> bucket/sign -> accumulate) exactly —
        integer arithmetic, no tolerance."""
        import hashlib
        import re

        from pandera_spark.operators.text import hash_embed

        dim = 16
        texts = [
            (0, "The quick brown Fox jumps  over the lazy dog 42 42"),
            (1, ""),
            (2, None),
            (3, "a b c a b c a!!! punct-only ..."),
            (4, "Unicode café naïve 中文 tokens"),
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: list(r["embedding"])
            for r in hash_embed(df, dim=dim).collect()
        }

        def ref(text):
            v = [0] * dim
            if text is None:
                return v
            for t in re.findall(r"[a-z0-9]+", text.lower()):
                h = hashlib.md5(t.encode()).hexdigest()
                b = int(h[:7], 16) % dim
                s = (int(h[8], 16) % 2) * 2 - 1
                v[b] += s
            return v

        for i, text in texts:
            assert got[i] == ref(text), f"doc {i}: {got[i]} != {ref(text)}"

    def test_double_literal_roundtrip(self, spark):
        from pandera_spark.operators.similarity import _fmt_double

        vals = [
            1.0530350896e-05, -2.5e-300, 0.1, -0.1353430762553919,
            3.141592653589793, 1e16, -7.1e-07, 0.0,
        ]
        sql = "array(" + ", ".join(_fmt_double(v) for v in vals) + ")"
        row = (
            spark.range(1)
            .select((F.lit(vals) == F.expr(sql)).alias("eq"))
            .first()
        )
        assert row["eq"] is True
