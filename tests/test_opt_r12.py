"""Round-12 optimization pins.

holt_winters(state_grid=...): the exact-grid replay mode that repins
the holtwinters_events oracle (VERDICT r11 item 1).  The pin: with
dyadic coefficients, every smoothing update on the integer grid is
exactly representable in an IEEE double, so the float loop the
operator actually runs incurs ZERO rounding error — proven here by
replaying the recurrence in exact Python integer arithmetic and
demanding equality.  That exactness is what makes the DuckDB oracle
engine/version-independent: two IEEE-754 engines can only diverge on
an operation that rounds, and the grid recurrence has none (the init
divisions by m and the final /S are single correctly-rounded IEEE
divisions, which are deterministic by the standard).
"""

import datetime
import math

import pytest
from pyspark.sql import functions as F


# fast contract-relevant lane: `pytest -m smoke` (see pytest.ini)
pytestmark = pytest.mark.smoke


def _series(spark, ys, start="2024-01-01T00:00:00"):
    t0 = datetime.datetime.fromisoformat(start)
    rows = [
        (t0 + datetime.timedelta(hours=i), float(v))
        for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(rows, "ts timestamp, v double")


def _exact_int_replay(yvals, m, S):
    """Holt-Winters on the micro-unit grid in EXACT integer arithmetic
    (alpha=1/4, beta=1/8, gamma=1/4): floor(x + 1/2) for x = n/4 is
    (n+2)//4, for x = n/8 is (n+4)//8 — no floating point anywhere in
    the recurrence.  Init mirrors the operator's single correctly
    rounded float divisions by m (deterministic, nothing to
    cross-check)."""
    Sf, fm = float(S), float(m)
    ys = [math.floor(float(v) * Sf + 0.5) for v in yvals]
    s1 = 0.0
    for i in range(m):
        s1 += ys[i]
    s2 = 0.0
    for i in range(m, 2 * m):
        s2 += ys[i]
    lvl = math.floor(s1 / fm + 0.5)
    l0b = math.floor(s2 / fm + 0.5)
    tr = math.floor((l0b - lvl) / fm + 0.5)
    seas = [ys[i] - lvl for i in range(m)]
    out = []
    for t in range(len(ys)):
        s_use = seas[0]
        f_s = lvl + tr + s_use
        lvl_new = ((ys[t] - s_use) + 3 * (lvl + tr) + 2) // 4
        tr_new = ((lvl_new - lvl) + 7 * tr + 4) // 8
        s_new = ((ys[t] - lvl_new) + 3 * s_use + 2) // 4
        seas = seas[1:] + [s_new]
        lvl, tr = lvl_new, tr_new
        out.append((lvl, tr, s_new, f_s, ys[t] - f_s))
    return out


class TestHoltWintersGrid:
    def test_matches_exact_integer_replay(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        m, S = 24, 1000
        # deterministic, seasonal + trend + jitter, with negative
        # seasonal deviations and fractional inputs (exercises the
        # floor(y*S + 0.5) input snap)
        ys = [
            50.0 + 0.25 * i + 10.0 * math.copysign(1, (i % m) - 11.5)
            + ((i * 37) % 7) + (0.5 if i % 3 == 0 else 0.125)
            for i in range(96)
        ]
        out = (
            holt_winters(
                _series(spark, ys), "ts", F.max("v"),
                grain="hour", season_length=m, state_grid=S,
            )
            .orderBy("bucket_ts")
            .collect()
        )
        ref = _exact_int_replay(ys, m, S)
        assert len(out) == len(ref)
        Sf = float(S)
        for r, (lvl, tr, s_new, f_s, resid_s) in zip(out, ref):
            # int/S is the same single IEEE division the operator did;
            # equality must be BIT-exact, not approximate
            assert r.level == lvl / Sf
            assert r.trend == tr / Sf
            assert r.seasonal == s_new / Sf
            assert r.fitted == f_s / Sf
            assert r.resid == resid_s / Sf

    def test_non_dyadic_coefficient_rejected(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        df = _series(spark, [1.0] * 8)
        with pytest.raises(ValueError, match="dyadic"):
            holt_winters(
                df, "ts", F.max("v"), season_length=4,
                alpha=0.3, state_grid=1000,
            )

    def test_grid_tracks_float_path(self, spark):
        from pandera_spark.operators.temporal import holt_winters

        # on a well-conditioned series the grid recurrence stays within
        # a few grid units of the float recurrence
        ys = [10.0, 20.0, 15.0, 5.0] * 8
        kw = dict(grain="hour", season_length=4)
        a = (
            holt_winters(_series(spark, ys), "ts", F.max("v"), **kw)
            .orderBy("bucket_ts").collect()
        )
        b = (
            holt_winters(
                _series(spark, ys), "ts", F.max("v"),
                state_grid=1_000_000, **kw,
            )
            .orderBy("bucket_ts").collect()
        )
        for ra, rb in zip(a, b):
            assert rb.level == pytest.approx(ra.level, abs=1e-4)
            assert rb.fitted == pytest.approx(ra.fitted, abs=1e-4)

    def test_default_mode_unchanged(self, spark):
        # state_grid=None keeps the original float recurrence: a pure
        # seasonal series is a fixed point with zero residuals
        from pandera_spark.operators.temporal import holt_winters

        season = [3.0, 7.0, 5.0, 1.0]
        out = (
            holt_winters(
                _series(spark, season * 6), "ts", F.max("v"),
                grain="hour", season_length=4,
            )
            .orderBy("bucket_ts").collect()
        )
        for r in out:
            assert r.resid == pytest.approx(0.0, abs=1e-12)

class TestSqlLaneBuilds:
    """r12 generated-SQL expression builds: each must be bit-identical
    to the Column construction it replaced (integer arithmetic for the
    minhash family; token-for-token double trees for _lfact)."""

    def test_lfact_sql_bit_identical(self, spark):
        from pandera_spark.operators.stats import _lfact, _lfact_sql

        df = spark.range(0, 3_000_000, 11).withColumnRenamed("id", "m")
        bad = (
            df.select(
                _lfact(F.col("m")).alias("a"),
                F.expr(_lfact_sql("m")).alias("b"),
            )
            .filter("a != b OR a IS NULL OR b IS NULL")
            .count()
        )
        assert bad == 0

    def test_perm_min_sql_bit_identical(self, spark):
        from pandera_spark.operators.dedup import (
            PORTABLE_P,
            _perm_min_sql,
            portable_permutation_constants,
        )

        a, b = portable_permutation_constants(16)
        tok = spark.range(0, 300_000, 3).select(
            (F.col("id") % 50).alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(PORTABLE_P)).alias("__h"),
        )
        h = F.col("__h")
        old = tok.groupBy("k").agg(
            *[
                F.min(
                    (h * F.lit(a[i]) + F.lit(b[i])) % F.lit(PORTABLE_P)
                ).alias(f"o{i}")
                for i in range(16)
            ]
        )
        new = tok.groupBy("k").agg(
            *[
                F.expr(_perm_min_sql("__h", a[i], b[i])).alias(f"n{i}")
                for i in range(16)
            ]
        )
        cond = " OR ".join(f"o{i} != n{i}" for i in range(16))
        assert old.join(new, "k").filter(cond).count() == 0

    def test_band_keys_match_column_build(self, spark):
        """banded_minhash_frame's generated band-key array vs the old
        per-band Column fold, on the same signatures."""
        from pandera_spark.operators.dedup import (
            PORTABLE_P,
            banded_minhash_frame,
            minhash_signatures,
            portable_permutation_constants,
        )

        rows = [
            (i, f"doc {i % 7} words repeat " * 4 + str(i % 13))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        num_hashes, bands = 16, 4
        rowsz = num_hashes // bands
        got = {
            r["__id"]: list(r["__bkeys"])
            for r in banded_minhash_frame(
                df, "doc_id", "text", num_hashes=num_hashes, bands=bands
            ).select("__id", "__bkeys").distinct().collect()
        }
        sigs = minhash_signatures(
            df, "doc_id", "text", num_hashes=num_hashes
        )
        ca, cb = portable_permutation_constants(rowsz, bound=1 << 28)

        def band_key(b):
            out = F.lit(cb[0])
            for r in range(rowsz):
                out = out + F.col("sig")[b * rowsz + r] * F.lit(ca[r])
            return out % F.lit(PORTABLE_P)

        ref = {
            r["doc_id"]: [r[f"b{b}"] for b in range(bands)]
            for r in sigs.select(
                "doc_id",
                *[band_key(b).alias(f"b{b}") for b in range(bands)],
            ).collect()
        }
        assert got == ref

    def test_corpus_resemblance_exact_unchanged(self, spark):
        """The single-frame exact path must reproduce the independent
        two-scan construction: minima from corpus_minhash per side and
        set arithmetic from per-side distinct hash sets."""
        from pandera_spark.operators.dedup import (
            corpus_minhash,
            corpus_resemblance,
            portable_hash28,
            shingles,
        )

        rows_a = [(i, f"alpha beta gamma {i % 5} delta epsilon") for i in range(40)]
        rows_b = [(i, f"alpha beta gamma {i % 9} delta zeta") for i in range(40)]
        a_df = spark.createDataFrame(rows_a, "doc_id long, text string")
        b_df = spark.createDataFrame(rows_b, "doc_id long, text string")
        got = corpus_resemblance(
            a_df, b_df, num_hashes=16, shingle_n=2, exact=True
        ).first()
        sa = corpus_minhash(a_df, num_hashes=16, shingle_n=2).first()["sig"]
        sb = corpus_minhash(b_df, num_hashes=16, shingle_n=2).first()["sig"]
        n_agree = sum(1 for x, y in zip(sa, sb) if x == y)
        assert got["n_agree"] == n_agree
        assert got["est"] == n_agree / 16.0

        def hset(df):
            sh = F.transform(shingles(F.col("text"), 2), portable_hash28)
            return {
                r["h"]
                for r in df.select(
                    F.explode(F.array_distinct(sh)).alias("h")
                ).distinct().collect()
            }

        ha, hb = hset(a_df), hset(b_df)
        assert got["n_union"] == len(ha | hb)
        assert got["n_inter"] == len(ha & hb)
        assert got["j_exact"] == len(ha & hb) / len(ha | hb)

    def test_hash_u_salt_escaping(self, spark):
        """bootstrap salt literals with backslashes/quotes must hash to
        the documented portable_hash28(key || ':' || r || salt) value
        (the quote-only doubling corrupted backslash salts — ADVICE)."""
        import hashlib

        from pandera_spark.operators.stats import _hash_u_sql

        for salt in ["a\\b", "tail\\", "it's", "mix\\'s\n", "plain"]:
            suffix = f":0{salt}"
            got = (
                spark.range(1)
                .select(F.expr(_hash_u_sql("'key7'", suffix)).alias("u"))
                .first()["u"]
            )
            h = int(
                hashlib.md5(("key7" + suffix).encode()).hexdigest()[:7], 16
            )
            assert got == (h + 0.5) / 268435456.0, salt

    def test_simhash_sql_lane_bit_identical(self, spark):
        """simhashes' generated bit-sum/OR-fold SQL vs the Column
        construction it replaced — exact longs, both hash families."""
        from pandera_spark.operators.dedup import _mask_lit, simhashes

        rows = [
            (i, f"w{i % 7} tok{i % 13} common words here {i % 3}")
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        new = {
            r["doc_id"]: r["simhash"]
            for r in simhashes(df, "doc_id", "text").collect()
        }
        h = F.col("__h")
        tokens = df.select(
            "doc_id",
            F.explode(F.split(F.col("text"), r"\s+")).alias("__w"),
        ).select("doc_id", F.xxhash64(F.col("__w")).alias("__h"))
        sums = tokens.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))
                ).alias(f"__b{b}")
                for b in range(64)
            ],
        )
        bits = [
            F.when(
                F.col(f"__b{b}") * 2 > F.col("__n"), _mask_lit(b)
            ).otherwise(F.lit(0).cast("long"))
            for b in range(64)
        ]
        sh = bits[0]
        for e in bits[1:]:
            sh = sh.bitwiseOR(e)
        old = {
            r["doc_id"]: r["sh"]
            for r in sums.select("doc_id", sh.alias("sh")).collect()
        }
        assert new == old
        # portable 28-bit lane still parses and bounds its bits
        p = simhashes(
            df, "doc_id", "text", num_bits=28, portable=True
        ).collect()
        assert all(0 <= r["simhash"] < (1 << 28) for r in p)

    def test_centroid_sql_lane(self, spark):
        from pandera_spark.operators.similarity import centroid

        vdf = spark.createDataFrame(
            [(i, [float(i % 5), float(i % 3), -1.5 * i]) for i in range(50)],
            "id long, v array<double>",
        )
        got = centroid(vdf, "v", dim=3)
        row = vdf.agg(
            *[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(3)]
        ).first()
        assert got == [float(row[f"c{i}"] or 0.0) for i in range(3)]

    def test_groupwise_pairs_sql_lane_fallback(self, spark):
        """groupwise_report output identical whether the struct array
        renders as SQL or falls back (label with a quote + backslash
        forces escaping through both lanes)."""
        import pandera_spark as pa

        df = spark.createDataFrame(
            [(1, "a"), (-2, "a"), (3, "b"), (None, "b")],
            "x int, g string",
        )
        schema = pa.DataFrameSchema({
            "x": pa.Column(
                "int",
                pa.Check.ge(0, error="x_ge_0 'quoted\\path'"),
                nullable=True,
            ),
        })
        out = {
            (r["g"], r["check"]): r["violations"]
            for r in schema.groupwise_report(df, ["g"]).collect()
        }
        assert out[("a", "x_ge_0 'quoted\\path'")] == 1
        assert out[("b", "x_ge_0 'quoted\\path'")] == 0

class TestRangeRankDeterminism:
    """The two-pass range-rank primitive must give the exact global
    answer on every run.  Before r12 its rank branch and counts branch
    each re-executed their own repartitionByRange (ReuseExchange never
    fires across the nondeterministic spark_partition_id projection),
    so each branch sampled DIFFERENT range boundaries once the grain
    outgrew the boundary sample — run-to-run-varying, oracle-diverging
    Mann-Whitney U at sf0.1.  _pin_range_partitions materializes ONE
    partitioning for all consumers."""

    def test_mann_whitney_matches_global_window_and_repeats(self, spark):
        from pyspark.sql import Window
        from pandera_spark.operators.ranks import mann_whitney_u

        n = 60_000  # distinct-heavy: far beyond the boundary sample
        df = (
            spark.range(n)
            .select(
                (F.pmod(F.xxhash64("id"), F.lit(100000)).cast("double")
                 / 7.0).alias("v"),
                F.when(F.col("id") % 3 == 0, "a").otherwise("b")
                .alias("g"),
            )
        )
        got = [
            mann_whitney_u(df, "v", "g", "a", "b").first()["u_a"]
            for _ in range(3)
        ]
        assert got[0] == got[1] == got[2], got
        vg = (
            df.where(F.col("v").isNotNull())
            .groupBy(F.col("v").alias("__v"))
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.sum((F.col("g") == "a").cast("long")).alias("__na"),
            )
        )
        w = Window.orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        mr = vg.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
            "__rank", F.col("__cum") - (F.col("__cnt") - 1) / 2.0
        )
        ref = mr.agg(
            F.sum("__na").alias("na"),
            F.sum(F.col("__na") * F.col("__rank")).alias("ra"),
        ).first()
        u_ref = ref["ra"] - ref["na"] * (ref["na"] + 1) / 2.0
        assert got[0] == u_ref


class TestPermtestSqlBuild:
    """The randomization-test tail (indicator projection, 2R+3
    aggregates, replicate extreme fold) is generated SQL since r12's
    continuation — it must be bit-identical to the Column construction
    it replaced."""

    @pytest.mark.parametrize("salt", ["", "s'x"])
    def test_bit_identical_to_column_build(self, spark, salt):
        from pandera_spark.operators.stats import (
            _hash_u_sql,
            randomization_test_mean,
        )

        n_rep = 16
        rows = [
            (float((i * 7) % 23), "A" if i % 3 else "B", i)
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "x double, g string, id long")
        new = randomization_test_mean(
            df, "x", "g", "A", "B", "id", n_rep=n_rep, salt=salt
        ).first()

        # the replaced Column construction, verbatim
        sub = df.where(
            F.col("x").isNotNull() & F.col("g").isin(["A", "B"])
        ).select(
            F.col("x").cast("double").alias("__x"),
            (F.col("g") == F.lit("A")).alias("__a"),
            F.col("id").cast("string").alias("__k"),
        )
        counts = sub.groupBy().agg(
            F.sum(F.col("__a").cast("long")).alias("na"),
            F.sum((~F.col("__a")).cast("long")).alias("nb"),
        ).first()
        n_a, n_b = int(counts["na"]), int(counts["nb"])
        p_a = n_a / float(n_a + n_b)
        icols = {
            f"__ic_{r}": F.expr(
                f"CAST(({_hash_u_sql('`__k`', f':{r}{salt}')}) "
                f"< {p_a!r}D AS INT)"
            )
            for r in range(n_rep)
        }
        aggs = [
            F.sum(F.col("__x")).alias("__s"),
            F.count(F.lit(1)).cast("double").alias("__c"),
            F.sum(F.when(F.col("__a"), F.col("__x"))).alias("__sa"),
        ]
        for r in range(n_rep):
            aggs.append(
                F.sum(F.col(f"__ic_{r}") * F.col("__x")).alias(f"__s_{r}")
            )
            aggs.append(
                F.sum(f"__ic_{r}").cast("double").alias(f"__c_{r}")
            )
        wide = sub.withColumns(icols).agg(*aggs)
        ca = F.lit(float(n_a))
        obs = F.col("__sa") / ca - (F.col("__s") - F.col("__sa")) / (
            F.col("__c") - ca
        )

        def rep_diff(r):
            sa, cc = F.col(f"__s_{r}"), F.col(f"__c_{r}")
            return F.when(
                (cc > 0) & (F.col("__c") - cc > 0),
                sa / cc - (F.col("__s") - sa) / (F.col("__c") - cc),
            )

        extreme = None
        for r in range(n_rep):
            e = F.when(
                F.abs(rep_diff(r)) >= F.abs(obs), 1
            ).otherwise(0)
            extreme = e if extreme is None else extreme + e
        old = wide.select(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            obs.alias("obs_diff"),
            extreme.cast("long").alias("n_extreme"),
            (
                (extreme.cast("double") + 1.0)
                / F.lit(float(n_rep + 1))
            ).alias("pvalue"),
        ).first()

        assert new["n_a"] == old["n_a"]
        assert new["n_b"] == old["n_b"]
        assert new["obs_diff"] == old["obs_diff"]  # bit-exact
        assert new["n_extreme"] == old["n_extreme"]
        assert new["pvalue"] == old["pvalue"]  # bit-exact


class TestBootciSqlBuild:
    """bootstrap_ci_mean's 2B+2 aggregates and replicate array are
    generated SQL since r12's continuation — pinned bit-identical to
    the Column construction they replaced."""

    def test_bit_identical_to_column_build(self, spark):
        import math as _math

        from pandera_spark.operators.stats import (
            _poisson_weight_sql,
            bootstrap_ci_mean,
        )

        n_boot, alpha, salt = 16, 0.05, ""
        rows = [(float((i * 13) % 31), i) for i in range(500)]
        df = spark.createDataFrame(rows, "x double, id long")
        new = bootstrap_ci_mean(
            df, "x", "id", n_boot=n_boot, alpha=alpha, salt=salt
        ).first()

        # the replaced Column construction, verbatim
        acc, thresholds = 0.0, []
        for k in range(13):
            acc += _math.exp(-1.0) / _math.factorial(k)
            thresholds.append(acc)
        sub = df.where(F.col("x").isNotNull()).select(
            F.col("x").cast("double").alias("__x"),
            F.col("id").cast("string").alias("__k"),
        )
        wcols = {
            f"__wc_{r}": F.expr(
                _poisson_weight_sql("`__k`", f":{r}{salt}", thresholds)
            )
            for r in range(n_boot)
        }
        aggs = [
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("__x").alias("mean"),
        ]
        for r in range(n_boot):
            aggs.append(
                F.sum(F.col(f"__wc_{r}") * F.col("__x")).alias(f"__s_{r}")
            )
            aggs.append(
                F.sum(f"__wc_{r}").cast("double").alias(f"__w_{r}")
            )
        wide = sub.withColumns(wcols).agg(*aggs)
        reps = F.array(
            *[
                F.try_divide(F.col(f"__s_{r}"), F.col(f"__w_{r}"))
                for r in range(n_boot)
            ]
        )
        k_lo = max(1, _math.ceil(n_boot * (alpha / 2.0)))
        k_hi = min(n_boot, _math.ceil(n_boot * (1.0 - alpha / 2.0)))
        srt = F.sort_array(reps)
        s1 = F.aggregate(
            reps, F.lit(0.0), lambda a, b: a + F.coalesce(b, F.lit(0.0))
        )
        s2 = F.aggregate(
            reps,
            F.lit(0.0),
            lambda a, b: a + F.coalesce(b * b, F.lit(0.0)),
        )
        bn = float(n_boot)
        old = wide.select(
            "n",
            "mean",
            F.element_at(srt, k_lo).alias("ci_lo"),
            F.element_at(srt, k_hi).alias("ci_hi"),
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    (s2 - s1 * s1 / bn) / F.lit(bn - 1.0),
                )
            ).alias("se_boot"),
        ).first()

        for c in ("n", "mean", "ci_lo", "ci_hi", "se_boot"):
            assert new[c] == old[c], c  # bit-exact


class TestClusterQualitySqlBuild:
    """cluster_quality's per-centroid distances and silhouette CASEs
    are generated SQL since r12's continuation — pinned bit-identical
    to the Column construction they replaced."""

    def test_bit_identical_to_column_build(self, spark):
        import numpy as np

        from pandera_spark.operators.kmeans import cluster_quality

        rng = np.random.RandomState(7)
        cent = rng.randn(5, 16)
        rows = [
            ([float(x) for x in rng.randn(16)], int(i % 5))
            for i in range(300)
        ]
        df = spark.createDataFrame(
            rows, "embedding array<double>, cluster_id int"
        )
        new = {
            r["cluster_id"]: r
            for r in cluster_quality(df, cent).collect()
        }

        # the replaced Column construction, verbatim
        v = F.col("embedding").cast("array<double>")

        def _dist(c_row):
            lit = F.array(*[F.lit(float(x)) for x in c_row])
            return F.sqrt(
                F.aggregate(
                    F.zip_with(v, lit, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )

        k = cent.shape[0]
        dists = [_dist(cent[i]) for i in range(k)]
        cid = F.col("cluster_id")
        a = F.lit(None).cast("double")
        for i in range(k):
            a = F.when(cid == i, dists[i]).otherwise(a)
        b = F.lit(None).cast("double")
        for i in range(k):
            others = [dists[j] for j in range(k) if j != i]
            nearest = (
                others[0] if len(others) == 1 else F.least(*others)
            )
            b = F.when(cid == i, nearest).otherwise(b)
        s = F.when(
            F.greatest(a, b) > 0,
            (b - a) / F.greatest(a, b),
        ).otherwise(F.lit(0.0))
        old = {
            r["cluster_id"]: r
            for r in (
                df.where(v.isNotNull() & cid.isNotNull())
                .groupBy(cid.alias("cluster_id"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.avg(a).alias("mean_dist"),
                    F.avg(s).alias("silhouette"),
                )
                .collect()
            )
        }
        assert set(new) == set(old)
        for c in new:
            assert new[c]["n"] == old[c]["n"]
            assert new[c]["mean_dist"] == old[c]["mean_dist"]  # bit-exact
            assert new[c]["silhouette"] == old[c]["silhouette"]
