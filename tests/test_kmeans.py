"""K-means + cluster-based curation (operators/kmeans.py).

Differential coverage: every distributed step is checked against a plain
numpy re-implementation on the collected data — seeding, assignment
(incl. tie-break), Lloyd updates, the semdedup drop rule, and the
sampling rank.  Plus the scale guards: assignment plans with no shuffle,
cluster caps fail fast, persistence toggles.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from pandera_spark.operators.kmeans import (
    KMeansFit,
    assign_clusters,
    cluster_sample,
    fit_kmeans,
    seed_centroids,
    semdedup,
)


def _emb_df(spark, n=60, d=8, seed=7, nulls=()):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).round(3)
    rows = [
        (i, None if i in nulls else [float(v) for v in x[i]])
        for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
    )


def _np_assign(x, cent):
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def test_seed_centroids_min_id(spark):
    df, x = _emb_df(spark)
    c = seed_centroids(df, k=4, method="min_id")
    assert c.shape == (4, 8)
    assert np.allclose(c, x[:4])


def test_seed_centroids_min_hash_deterministic_and_spread(spark):
    df, x = _emb_df(spark)
    c1 = seed_centroids(df, k=4)
    c2 = seed_centroids(df, k=4)
    assert np.allclose(c1, c2)
    # a different salt draws a different seed set
    c3 = seed_centroids(df, k=4, salt="b")
    assert not np.allclose(c1, c3)
    # min_hash must not simply take the first k ids
    assert not np.allclose(c1, x[:4])


def test_seed_centroids_ignores_nulls_and_checks_k(spark):
    df, x = _emb_df(spark, nulls={0, 1})
    c = seed_centroids(df, k=3, method="min_id")
    assert np.allclose(c, x[2:5])
    with pytest.raises(ValueError, match="at least k"):
        seed_centroids(df, k=59, method="min_id")


def test_assign_matches_numpy(spark):
    df, x = _emb_df(spark)
    cent = x[:5]
    got = {
        r["vec_id"]: (r["cluster_id"], r["d"])
        for r in assign_clusters(
            df, centroids=cent, dist_col="d"
        ).collect()
    }
    ref = _np_assign(x, cent)
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    for i in range(len(x)):
        assert got[i][0] == ref[i]
        assert got[i][1] == pytest.approx(
            float(np.sqrt(d2[i, ref[i]])), rel=1e-9
        )


def test_assign_null_vector_and_tie_break(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None)],
        "vec_id long, embedding array<double>",
    )
    # two identical centroids: tie must go to the LOWER cluster id
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(
            df, centroids=np.array([[0.0, 1.0], [0.0, 1.0]])
        ).collect()
    }
    assert out[0] == 0
    assert out[1] is None


def test_assign_plan_has_no_shuffle(spark):
    df, x = _emb_df(spark)
    plan = (
        assign_clusters(df, centroids=x[:3])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_fit_kmeans_matches_numpy_lloyd(spark):
    df, x = _emb_df(spark)
    for iters in (1, 4):
        fit = fit_kmeans(
            df, k=5, max_iter=iters, seed_method="min_id", tol=0.0
        )
        cent = x[:5].copy()
        asn = None
        for _ in range(iters):
            asn = _np_assign(x, cent)
            for c in range(5):
                if (asn == c).any():
                    cent[c] = x[asn == c].mean(axis=0)
        assert isinstance(fit, KMeansFit)
        assert fit.n_iter == iters
        assert np.allclose(fit.centroids, cent, atol=1e-12)
        # sizes come from the LAST iteration's assignment (pre-update)
        assert fit.sizes == [int((asn == c).sum()) for c in range(5)]
        assert sum(fit.sizes) == len(x)


def test_fit_kmeans_empty_cluster_keeps_centroid(spark):
    # a far-away centroid captures nothing; it must survive unchanged
    df, x = _emb_df(spark, n=20)
    init = np.vstack([x[:2], np.full((1, 8), 1e6)])
    fit = fit_kmeans(df, init=init, max_iter=2, tol=0.0, persist=False)
    assert fit.sizes[2] == 0
    assert np.allclose(fit.centroids[2], init[2])


def test_fit_kmeans_tol_stops_early(spark):
    df, _ = _emb_df(spark)
    fit = fit_kmeans(df, k=4, max_iter=50, tol=1e-3)
    assert fit.n_iter < 50
    assert fit.shifts[-1] < 1e-3


def test_fit_kmeans_arg_validation(spark):
    df, x = _emb_df(spark)
    with pytest.raises(ValueError, match="k= or init="):
        fit_kmeans(df)
    with pytest.raises(ValueError, match="init has"):
        fit_kmeans(df, k=3, init=x[:4])
    with pytest.raises(ValueError, match="min_hash"):
        seed_centroids(df, k=2, method="bogus")
    with pytest.raises(ValueError, match="matrix"):
        assign_clusters(df, centroids=np.zeros(3))


def _np_semdedup(x, cent, tau):
    asn = _np_assign(x, cent)
    nrm = x / np.maximum(np.linalg.norm(x, axis=1), 1e-300)[:, None]
    dup = np.zeros(len(x), dtype=bool)
    for c in range(len(cent)):
        idx = np.where(asn == c)[0]  # ascending vec_id order
        g = nrm[idx] @ nrm[idx].T
        for r in range(1, len(idx)):
            if (g[r, :r] >= tau).any():
                dup[idx[r]] = True
    return asn, dup


def test_semdedup_matches_reference(spark):
    df, x = _emb_df(spark, n=80)
    cent = x[:4]
    out = semdedup(
        df, centroids=cent, threshold=0.6, block=7
    ).collect()
    asn, dup = _np_semdedup(x, cent, 0.6)
    assert dup.any() and not dup.all()
    for r in out:
        assert r["cluster_id"] == asn[r["vec_id"]]
        assert r["is_dup"] == bool(dup[r["vec_id"]])


def test_semdedup_exact_duplicates_keep_smallest_id(spark):
    v = [1.0, 2.0, 3.0]
    df = spark.createDataFrame(
        [(5, v), (3, v), (9, [-3.0, 1.0, 0.5]), (1, None)],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["is_dup"] for r in semdedup(
        df, centroids=np.array([v]), threshold=0.99
    ).collect()}
    assert out == {3: False, 5: True, 9: False, 1: False}


def test_semdedup_cluster_cap_raises(spark):
    df, x = _emb_df(spark, n=30)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(
            df, centroids=x[:1], threshold=0.9, max_cluster_rows=10
        ).collect()


def test_cluster_sample_exact_and_deterministic(spark):
    df, x = _emb_df(spark, n=50)
    a = assign_clusters(df, centroids=x[:3])
    s1 = cluster_sample(a, key_col="vec_id", n_per_cluster=5)
    sizes = {r["cluster_id"]: r["count"]
             for r in s1.groupBy("cluster_id").count().collect()}
    full = {r["cluster_id"]: r["count"]
            for r in a.groupBy("cluster_id").count().collect()}
    for c, n in full.items():
        assert sizes[c] == min(5, n)
    ids1 = {r["vec_id"] for r in s1.collect()}
    ids2 = {r["vec_id"] for r in cluster_sample(
        a, key_col="vec_id", n_per_cluster=5).collect()}
    assert ids1 == ids2
    ids3 = {r["vec_id"] for r in cluster_sample(
        a, key_col="vec_id", n_per_cluster=5, salt="x").collect()}
    assert ids3 != ids1


def test_cluster_sample_pipeline_composes_with_semdedup(spark):
    """The SemDeDup curation chain: fit -> dedup -> balanced sample."""
    df, _ = _emb_df(spark, n=60)
    fit = fit_kmeans(df, k=3, max_iter=2)
    sd = semdedup(df, centroids=fit.centroids, threshold=0.6)
    kept = sd.where(~F.col("is_dup"))
    out = cluster_sample(kept, key_col="vec_id", n_per_cluster=4)
    counts = [r["count"]
              for r in out.groupBy("cluster_id").count().collect()]
    assert all(c <= 4 for c in counts)
    assert out.count() > 0


# --- corpus resemblance (operators/dedup.py) ---------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_resemblance_identical_and_disjoint(spark):
    from pandera_spark.operators.dedup import corpus_resemblance

    a = _docs(spark, [(1, "the quick brown fox jumps over dogs"),
                      (2, "pack my box with five dozen jugs")])
    same = corpus_resemblance(a, a, exact=True).first()
    assert same["n_agree"] == same["num_hashes"] == 64
    assert same["est"] == 1.0
    assert same["j_exact"] == 1.0
    assert same["n_inter"] == same["n_union"]

    b = _docs(spark, [(3, "zx qv wk jn pb tm rd lg hc fs yw ae")])
    dis = corpus_resemblance(a, b, exact=True).first()
    assert dis["n_inter"] == 0
    assert dis["j_exact"] == 0.0
    assert dis["n_agree"] == 0


def test_corpus_resemblance_subset_and_symmetry(spark):
    from pandera_spark.operators.dedup import corpus_resemblance

    small = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    big = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta"),
                        (2, "eta theta iota kappa lambda mu nu xi")])
    ab = corpus_resemblance(small, big, exact=True).first()
    # A ⊂ B  ->  J = |A| / |B| over the distinct shingle-hash sets
    assert ab["n_inter"] == 4  # 6 words, 3-shingles -> 4 shingles
    assert ab["j_exact"] == pytest.approx(
        ab["n_inter"] / ab["n_union"])
    ba = corpus_resemblance(big, small, exact=True).first()
    assert ba["n_inter"] == ab["n_inter"]
    assert ba["n_agree"] == ab["n_agree"]


def test_corpus_minhash_is_min_over_union(spark):
    """Corpus signature = element-wise min of per-doc signatures (the
    mergeability property that makes the estimate corpus-level)."""
    from pandera_spark.operators.dedup import (
        corpus_minhash, minhash_signatures)

    docs = _docs(spark, [(1, "one two three four five six"),
                         (2, "six seven eight nine ten eleven"),
                         (3, "a b c d e f g h")])
    corpus = corpus_minhash(docs, num_hashes=16).first()["sig"]
    per_doc = minhash_signatures(
        docs, "doc_id", "text", num_hashes=16, portable=True
    ).collect()
    mins = [min(r["sig"][i] for r in per_doc) for i in range(16)]
    assert list(corpus) == mins


def test_uniform_sample_exact_deterministic_and_plan(spark):
    from pandera_spark.operators.curation import uniform_sample

    df = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    s1 = uniform_sample(df, "doc_id", 25)
    assert s1.count() == 25
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"]
            for r in uniform_sample(df, "doc_id", 25).collect()}
    assert ids1 == ids2
    ids3 = {r["doc_id"]
            for r in uniform_sample(df, "doc_id", 25, salt="z").collect()}
    assert ids3 != ids1
    # n >= corpus keeps everything; bad n rejected
    assert uniform_sample(df, "doc_id", 500).count() == 200
    with pytest.raises(ValueError, match="positive"):
        uniform_sample(df, "doc_id", 0)
    # scale guard: TakeOrdered, not a global sort
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ivf_fit_distributed_feeds_search(spark):
    """Distributed spherical k-means as the IVF coarse quantizer: unit
    centroids, sane Voronoi cells, and end-to-end top-k retrieval."""
    from pandera_spark.operators.ann_ivf import (
        ivf_assign, ivf_fit_distributed, ivf_topk)

    df, x = _emb_df(spark, n=60)
    cent = ivf_fit_distributed(df, n_centroids=4, n_iter=3)
    assert cent.shape == (4, 8)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    # assignment covers all rows; distributed centroids match a local
    # spherical-lloyd replay from the same (min-hash) seeds
    cells = ivf_assign(df, "embedding", cent)
    assert cells.where("cell IS NOT NULL").count() == 60
    q = df.limit(3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    hits = ivf_topk(df, q, centroids=cent, k=5, nprobe=2,
                    query_id_col="qid", query_vec_col="qvec")
    rows = hits.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["cosine_sim"]))
    assert len(per_q) == 3
    for sims in per_q.values():
        sims.sort()
        assert len(sims) <= 5
        # ranks contiguous from 1, similarity non-increasing
        assert [rk for rk, _ in sims] == list(range(1, len(sims) + 1))
        cs = [c for _, c in sims]
        assert all(a >= b - 1e-12 for a, b in zip(cs, cs[1:]))


class TestClusterQuality:
    def _toy(self, spark):
        import numpy as np

        rng = np.random.RandomState(13)
        cents = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        rows = []
        for cid, c in enumerate(cents):
            for _ in range(40):
                p = c + rng.normal(0, 0.5, 2)
                rows.append((cid, [float(p[0]), float(p[1])]))
        df = spark.createDataFrame(rows, "cluster_id int, embedding array<double>")
        return df, cents, rows

    def test_matches_local(self, spark):
        import numpy as np

        from pandera_spark.operators.kmeans import cluster_quality

        df, cents, rows = self._toy(spark)
        out = {r["cluster_id"]: r
               for r in cluster_quality(df, cents).collect()}
        for cid in range(3):
            pts = np.array([p for c, p in rows if c == cid])
            a = np.linalg.norm(pts - cents[cid], axis=1)
            others = [np.linalg.norm(pts - cents[j], axis=1)
                      for j in range(3) if j != cid]
            b = np.minimum.reduce(others)
            s = ((b - a) / np.maximum(a, b)).mean()
            assert out[cid]["n"] == 40
            assert out[cid]["mean_dist"] == pytest.approx(a.mean(), abs=1e-10)
            assert out[cid]["silhouette"] == pytest.approx(s, abs=1e-10)
            # well-separated clusters -> silhouette near 1
            assert out[cid]["silhouette"] > 0.85

    def test_degenerate_point_scores_zero(self, spark):
        from pandera_spark.operators.kmeans import cluster_quality

        # a point exactly on BOTH centroids is impossible; a=b=0 needs
        # identical centroids - allowed, scores 0
        df = spark.createDataFrame(
            [(0, [1.0, 1.0])], "cluster_id int, embedding array<double>"
        )
        out = cluster_quality(df, [[1.0, 1.0], [1.0, 1.0]]).first()
        assert out["silhouette"] == 0.0

    def test_plan_no_shuffle_before_agg_and_validation(self, spark):
        from pandera_spark.operators.kmeans import cluster_quality

        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [5.0, 5.0])],
            "cluster_id int, embedding array<double>",
        )
        with pytest.raises(ValueError, match="2 centroids"):
            cluster_quality(df, [[0.0, 0.0]])
        plan = cluster_quality(
            df, [[0.0, 0.0], [5.0, 5.0]]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # exactly the final agg shuffle
        assert plan.count("Exchange") <= 2  # partial+final only
        assert "BroadcastNestedLoopJoin" not in plan
        assert "PythonUDF" not in plan

    def test_davies_bouldin(self, spark):
        import numpy as np

        from pandera_spark.operators.kmeans import (
            cluster_quality,
            davies_bouldin,
        )

        df, cents, rows = self._toy(spark)
        q = cluster_quality(df, cents)
        db = davies_bouldin(q, cents)
        # local replay
        sig = {}
        for cid in range(3):
            pts = np.array([p for c, p in rows if c == cid])
            sig[cid] = np.linalg.norm(pts - cents[cid], axis=1).mean()
        worst = []
        for i in range(3):
            worst.append(max(
                (sig[i] + sig[j]) / np.linalg.norm(cents[i] - cents[j])
                for j in range(3) if j != i
            ))
        assert db == pytest.approx(sum(worst) / 3, abs=1e-10)
        assert db < 0.5  # well separated

    def test_davies_bouldin_needs_two(self, spark):
        from pandera_spark.operators.kmeans import (
            cluster_quality,
            davies_bouldin,
        )

        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (0, [0.1, 0.0])],
            "cluster_id int, embedding array<double>",
        )
        q = cluster_quality(df, [[0.0, 0.0], [9.0, 9.0]])
        with pytest.raises(ValueError, match="non-empty"):
            davies_bouldin(q, [[0.0, 0.0], [9.0, 9.0]])
