"""Operator tests: dedup, similarity, text, multimodal, streaming,
failure cases."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pandera_spark as ps
from pandera_spark import Check, Column, DataFrameSchema


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog today", "en"),  # near
        (4, "der schnelle braune fuchs springt und ist nicht da", "de"),
        (5, "completely different content about spark engines", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_exact_dedup_stats(spark, docs):
    from pandera_spark.operators.dedup import exact_dedup_stats

    row = exact_dedup_stats(docs, "text").first()
    assert row.n_docs == 5
    assert row.n_distinct == 4
    assert row.dup_rows == 2


def test_exact_dedup_drop(spark, docs):
    from pandera_spark.operators.dedup import exact_dedup

    assert exact_dedup(docs, ["text"], keep="any").count() == 4


def test_minhash_lsh_finds_near_dups(spark, docs):
    from pandera_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    cands = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=32, bands=16, shingle_n=2
    )
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (1, 2) in pairs  # exact dups always collide

    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", candidates=cands, shingle_n=2, threshold=0.99
    )
    exact = {(r.id_a, r.id_b) for r in verified.collect()}
    assert (1, 2) in exact
    # near-dup 3 shouldn't survive a 0.99 threshold
    assert (1, 3) not in exact


def test_simhash_near_dups(spark, docs):
    from pandera_spark.operators.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs, "doc_id", "text", max_hamming=0)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 5) not in got


def test_shingles_shorter_than_n(spark):
    """Docs with fewer than n words must yield an empty shingle array, not
    a slice(..., 0) crash (regression: sequence(0, -1) descends)."""
    from pandera_spark.operators.dedup import shingle_hashes, shingles

    df = spark.createDataFrame(
        [("one",), ("one two",), ("one two three",), ("",)], "t string"
    )
    out = df.select(
        F.size(shingles(F.col("t"), 3)).alias("s"),
        F.size(shingle_hashes(F.col("t"), 3)).alias("h"),
    ).collect()
    assert [r.s for r in out] == [0, 0, 1, 0]
    assert [r.h for r in out] == [0, 0, 1, 0]


def test_portable_paths_match_default_semantics(spark, docs):
    """portable=True swaps the hash family but not the pipeline: exact
    dups still collide in every band, and portable simhash of identical
    texts is identical (hamming 0)."""
    from pandera_spark.operators.dedup import (
        PORTABLE_P,
        minhash_lsh_candidates,
        minhash_signatures,
        simhash_near_dups,
        simhashes,
    )

    cands = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=32, bands=8, portable=True
    )
    assert (1, 2) in {(r.id_a, r.id_b) for r in cands.collect()}

    sigs = {r.doc_id: r.sig for r in minhash_signatures(
        docs, "doc_id", "text", num_hashes=8, portable=True
    ).collect()}
    assert sigs[1] == sigs[2]
    assert all(0 <= v < PORTABLE_P for v in sigs[1])

    sh = {r.doc_id: r.simhash for r in simhashes(
        docs, "doc_id", "text", num_bits=28, portable=True
    ).collect()}
    assert sh[1] == sh[2]
    assert all(0 <= v < (1 << 28) for v in sh.values())

    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_dups(
            docs, "doc_id", "text", max_hamming=0, num_bits=28, portable=True
        ).collect()
    }
    assert (1, 2) in got

    with pytest.raises(ValueError):
        simhashes(docs, "doc_id", "text", num_bits=64, portable=True)


def test_token_and_quality(spark, docs):
    from pandera_spark.operators.text import text_quality, token_stats

    ts = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert ts[1] == 9
    q = {r.doc_id: r.quality for r in text_quality(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())


def test_language_id(spark, docs):
    from pandera_spark.operators.text import language_id

    got = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert got[1] == "en"
    assert got[4] == "de"


def test_fingerprints_normalize(spark):
    from pandera_spark.operators.text import document_fingerprints

    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "other")],
        "doc_id bigint, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in document_fingerprints(df).collect()}
    assert fps[1] == fps[2]  # case/punct/ws-insensitive
    assert fps[1] != fps[3]


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(20):
        angle = i * math.pi / 40
        rows.append((i, [math.cos(angle), math.sin(angle), 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_brute_force_topk(spark, vectors):
    from pandera_spark.operators.similarity import brute_force_topk

    q = vectors.filter(F.col("vec_id") == 0)
    top = brute_force_topk(vectors, q, k=3).collect()
    assert [r.neighbor_id for r in top] == [1, 2, 3]  # angular order
    assert all(r.query_id == 0 for r in top)
    assert top[0].cosine_sim > top[1].cosine_sim > top[2].cosine_sim


def test_lsh_topk_recall(spark, vectors):
    from pandera_spark.operators.similarity import lsh_topk

    q = vectors.filter(F.col("vec_id") == 0)
    top = lsh_topk(
        vectors, q, k=3, dim=4, n_planes=8, bands=8
    ).collect()  # bands=8 of width 1: high recall
    assert top and top[0].neighbor_id == 1


def test_embedding_near_dups(spark):
    from pandera_spark.operators.similarity import embedding_near_dups

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.001, 0.0, 0.0]),  # near-dup of 1
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    pairs = embedding_near_dups(
        df, threshold=0.99, dim=4, n_planes=8, bands=8
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got


def test_brute_force_topk_query_size_guard(spark, vectors):
    from pandera_spark.operators.similarity import brute_force_topk

    with pytest.raises(ValueError, match="lsh_topk"):
        brute_force_topk(vectors, vectors, k=3, max_query_rows=5)
    # explicit opt-out still runs the exact baseline
    out = brute_force_topk(
        vectors, vectors.limit(6), k=1, max_query_rows=None
    ).collect()
    assert len(out) == 6


def test_lsh_materialization_configurable(spark, vectors):
    """corpus_storage=None must skip the persist (no InMemoryRelation in
    the plan) and still produce identical results; the default caches the
    banded corpus so the self-join scans it instead of recomputing."""
    from pandera_spark.operators.similarity import (
        embedding_near_dups,
        lsh_topk,
    )

    # earlier tests may have persisted an identical banded-corpus fragment;
    # Spark's cache manager would substitute it into "uncached" plans
    spark.catalog.clearCache()
    q = vectors.filter(F.col("vec_id") == 0)
    kw = dict(k=3, dim=4, n_planes=8, bands=8)
    # uncached FIRST: once anything persists the banded corpus, Spark's
    # cache manager substitutes the cached fragment into matching plans
    uncached = lsh_topk(vectors, q, corpus_storage=None, **kw)
    assert "InMemoryRelation" not in uncached._jdf.queryExecution().toString()
    uncached_rows = uncached.collect()
    cached = lsh_topk(vectors, q, **kw)
    assert "InMemoryRelation" in cached._jdf.queryExecution().toString()
    key = lambda rows: sorted((r.query_id, r.neighbor_id, r.rank)
                              for r in rows)
    assert key(cached.collect()) == key(uncached_rows)
    spark.catalog.clearCache()

    nd = embedding_near_dups(
        vectors, threshold=0.99, dim=4, n_planes=8, bands=8,
        corpus_storage=None,
    )
    assert "InMemoryRelation" not in nd._jdf.queryExecution().toString()
    nd.collect()  # plan executes without the cache

    with pytest.raises(ValueError, match="storage level"):
        lsh_topk(vectors, q, corpus_storage="BANANA", **kw)
    spark.catalog.clearCache()


def test_multimodal_fake_pipeline(spark):
    from pandera_spark.operators.multimodal import (
        image_features,
        media_stats,
        sample_frames,
    )

    media = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG" + bytes(range(256)))),
            (2, bytearray(b"\xff\xd8\xff" + bytes(range(128)))),
            (3, None),
        ],
        "media_id bigint, payload binary",
    )
    stats = media_stats(media).first()
    assert stats.n_media == 3 and stats.null_payloads == 1

    feats = image_features(media, dim=8, deterministic_fake=True).collect()
    assert len(feats) == 3
    by_id = {r.media_id: r.feature for r in feats}
    assert len(by_id[1]) == 8
    # deterministic: re-run gives identical features
    feats2 = image_features(media, dim=8, deterministic_fake=True).collect()
    assert {r.media_id: r.feature for r in feats2} == by_id

    frames = sample_frames(media, deterministic_fake=True).collect()
    assert all(r.media_id in (1, 2) for r in frames)

    # real decode path: corrupt payloads surface as null features, never
    # a crashed job (row-preserving, like coerce-error capture)
    real = {r.media_id: r.feature
            for r in image_features(media, deterministic_fake=False).collect()}
    assert real[1] is None and real[2] is None


def test_streaming_foreach_batch(spark, tmp_path):
    from pandera_spark.streaming import validate_stream

    schema = DataFrameSchema(
        {"value": Column(T.LongType(), Check.lt(5))}, name="stream_schema"
    )
    src = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    src = src.select(F.col("value"))
    reports = {}
    seen = []

    writer = validate_stream(
        src,
        schema,
        on_report=lambda bid, rep: reports.update({bid: rep}),
        drop_invalid=True,
        sink=lambda df, bid: seen.append(df.count()),
    )
    q = writer.start()
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline and len(seen) < 2:
            time.sleep(0.5)
    finally:
        q.stop()
    assert seen, "no micro-batches processed"
    assert any("DATA" in r for r in reports.values() if r) or reports


def test_observe_validation(spark):
    from pandera_spark.streaming import observed_validation

    schema = DataFrameSchema(
        {"v": Column(T.LongType(), Check.gt(2), nullable=False)}
    )
    df = spark.range(10).select(F.col("id").alias("v"))
    out, obs = observed_validation(df, schema)
    out.count()  # metrics piggyback on this action
    metrics = obs.get
    assert metrics["rows"] == 10
    assert metrics["viol__v__greater_than(2)"] == 3  # 0,1,2


def test_failure_cases(spark):
    df = spark.createDataFrame(
        [(1, "a"), (20, "b"), (30, "c")], "v int, s string"
    )
    schema = DataFrameSchema(
        {"v": Column(T.IntegerType(), Check.le(10, n_failure_cases=1))},
        checks=Check(lambda d: F.col("v") != 30, name="v_ne_30", error="v_ne_30"),
    )
    result = schema.validate_result(df)
    fc = result.failure_cases(n=5)
    rows = fc.collect()
    by_check = {}
    for r in rows:
        by_check.setdefault(r.check, []).append(r.failure_case)
    assert len(by_check["less_than_or_equal_to(10)"]) == 1  # n_failure_cases=1
    assert len(by_check["v_ne_30"]) == 1
    assert "30" in by_check["v_ne_30"][0]  # df-level -> json of row


def test_fk_violations_and_count(spark):
    from pandera_spark.operators.relational import (
        fk_violation_count,
        fk_violations,
        isin_table,
        orphan_stats,
    )

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, k int"
    )
    dim = spark.createDataFrame([(10,), (20,), (20,)], "dk int")

    bad = fk_violations(fact, "k", dim, "dk").collect()
    assert [r.id for r in bad] == [3]  # null key is not a violation
    assert fk_violation_count(fact, "k", dim, "dk").first().violations == 1

    kept = isin_table(fact, "k", dim, "dk").collect()
    assert sorted(r.id for r in kept) == [1, 2]

    st = orphan_stats(fact, "k", dim, "dk").first()
    assert (st.total_rows, st.null_key_rows, st.orphan_rows) == (4, 1, 1)


def test_fk_composite_keys(spark):
    from pandera_spark.operators.relational import fk_violations

    fact = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2), (3, "a", 2)], "id int, k1 string, k2 int"
    )
    dim = spark.createDataFrame(
        [("a", 1), ("b", 2)], "r1 string, r2 int"
    )
    bad = fk_violations(fact, ["k1", "k2"], dim, ["r1", "r2"]).collect()
    assert [r.id for r in bad] == [3]


def test_ivf_fit_deterministic(spark, vectors):
    from pandera_spark.operators.ann_ivf import ivf_fit

    c1 = ivf_fit(vectors, n_centroids=4, seed=7)
    c2 = ivf_fit(vectors, n_centroids=4, seed=7)
    assert c1.shape == (4, 4)
    assert (c1 == c2).all()


def test_ivf_topk_recall(spark, vectors):
    from pandera_spark.operators.ann_ivf import ivf_topk
    from pandera_spark.operators.similarity import brute_force_topk

    q = vectors.filter(F.col("vec_id") == 0)
    exact = {r.neighbor_id for r in brute_force_topk(vectors, q, k=3).collect()}
    # nprobe == n_centroids scans every cell -> exact result
    approx = ivf_topk(
        vectors, q, k=3, n_centroids=4, nprobe=4, seed=7
    ).collect()
    assert {r.neighbor_id for r in approx} == exact
    # single-probe stays a subset of the corpus with correct ranking shape
    one = ivf_topk(vectors, q, k=3, n_centroids=4, nprobe=1, seed=7).collect()
    assert [r.rank for r in one] == sorted(r.rank for r in one)
    assert len(one) <= 3


def test_split_and_quarantine_sink(spark, tmp_path):
    from pandera_spark.sinks import split_valid_invalid, write_quarantined

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 9.0)], "id int, v double"
    )
    schema = DataFrameSchema(
        {"v": Column(T.DoubleType(), Check.gt(0.0), nullable=False)}
    )
    valid, invalid = split_valid_invalid(df, schema)
    assert sorted(r.id for r in valid.collect()) == [1, 4]
    assert sorted(r.id for r in invalid.collect()) == [2, 3]

    out = str(tmp_path / "routed")
    paths = write_quarantined(df, schema, out)
    good = spark.read.parquet(paths["valid"])
    bad = spark.read.parquet(paths["invalid"])
    assert sorted(r.id for r in good.collect()) == [1, 4]
    assert sorted(r.id for r in bad.collect()) == [2, 3]


def test_write_validated_raises_then_drops(spark, tmp_path):
    from pandera_spark.errors import SchemaErrors
    from pandera_spark.sinks import write_validated

    df = spark.createDataFrame([(1, 5.0), (2, -1.0)], "id int, v double")
    schema = DataFrameSchema({"v": Column(T.DoubleType(), Check.gt(0.0))})
    with pytest.raises(SchemaErrors):
        write_validated(df, schema, str(tmp_path / "strict"))
    out = write_validated(
        df, schema, str(tmp_path / "clean"), drop_invalid=True
    )
    assert [r.id for r in out.collect()] == [1]
    assert spark.read.parquet(str(tmp_path / "clean")).count() == 1


def test_read_csv_typed_with_corrupt_records(spark, tmp_path):
    from pandera_spark.sources import read_csv

    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,2.5\n2,not_a_number\n3,4.0\n")
    schema = DataFrameSchema(
        {"id": Column(T.IntegerType()), "v": Column(T.DoubleType())}
    )
    df = read_csv(spark, str(p), schema)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].v == 2.5 and rows[1]._corrupt_record is None
    # malformed row preserved for quarantine, not dropped
    bad = [r for r in rows.values() if r._corrupt_record is not None]
    assert len(bad) == 1


def test_read_json_typed(spark, tmp_path):
    from pandera_spark.sources import read_json

    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": "oops"}\n')
    schema = DataFrameSchema(
        {"id": Column(T.LongType()), "v": Column(T.DoubleType())}
    )
    df = read_json(spark, str(p), schema)
    rows = sorted(df.collect(), key=lambda r: (r.id is None, r.id))
    assert rows[0].v == 2.5
    assert any(r._corrupt_record is not None for r in rows)


def test_streaming_dedup_batch_semantics(spark):
    # batch-mode semantic check of the dedup projection (watermark path is
    # exercised in the stateful streaming test below)
    from pandera_spark.streaming.stateful import streaming_dedup

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    assert streaming_dedup(df, ["k"]).count() == 2


def test_stateful_violation_counts(spark, tmp_path):
    import time

    from pandera_spark.streaming.stateful import stateful_violation_counts

    schema = DataFrameSchema(
        {"value": Column(T.LongType(), Check.lt(3))}, name="s"
    )
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(F.col("value"), (F.col("value") % 2).alias("parity"))
    )
    counted = stateful_violation_counts(src, schema, "parity")
    rows = {}

    def sink(batch_df, bid):
        for r in batch_df.collect():
            rows[r.key] = (r.rows_seen, r.violations)

    q = (
        counted.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 40
        while time.time() < deadline and len(rows) < 2:
            time.sleep(0.5)
    finally:
        q.stop()
    assert set(rows) == {0, 1}, rows
    # values 0,1,2 pass; everything >= 3 violates — so each parity key has
    # violations = rows_seen - (passing values seen for that key)
    for key, (n, v) in rows.items():
        passing = len([x for x in (0, 1, 2) if x % 2 == key])
        assert v == n - passing, (key, n, v)


def test_resize_images(spark):
    from pandera_spark.operators.multimodal import decode_image, resize_images

    rows = [(1, bytes(range(256)) * 40), (2, None), (3, b"abc" * 100)]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = resize_images(
        media, width=16, height=16, deterministic_fake=True
    ).collect()
    by_id = {r.media_id: r for r in out}
    assert len(by_id[1].payload) <= 16 * 16
    assert by_id[1].width == 16 and by_id[1].height == 16
    assert by_id[2].payload is None and by_id[2].width is None
    # real codec path: non-image payloads resize to null, never crash
    with pytest.raises(Exception):
        decode_image(b"x")  # undecodable payloads still raise eagerly
    real = {r.media_id: r.payload
            for r in resize_images(media, deterministic_fake=False).collect()}
    assert real[1] is None and real[3] is None


def test_windowed_violation_counts_batch_and_stream(spark, tmp_path):
    import datetime
    import time

    from pandera_spark.streaming.stateful import windowed_violation_counts

    schema = DataFrameSchema({"v": Column(T.LongType(), Check.lt(10))})
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(seconds=s), v)
        for s, v in [(0, 1), (10, 50), (70, 2), (80, 99)]
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    out = {
        r.window_start.minute: (r.rows, r.violations)
        for r in windowed_violation_counts(df, schema, "ts").collect()
    }
    assert out == {0: (2, 1), 1: (2, 1)}

    # streaming: same operator over a rate source, update mode
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "20").load()
        .select(F.col("timestamp").alias("ts"), F.col("value").alias("v"))
    )
    agg = windowed_violation_counts(
        src, schema, "ts", window="10 seconds", delay="5 seconds"
    )
    got = []
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "wm"))
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not got:
            time.sleep(0.5)
    finally:
        q.stop()
    assert got and all(r.rows >= r.violations for r in got)


def test_session_stats_streaming(spark, tmp_path):
    """session_stats must run under Structured Streaming (the native
    session_window aggregate is the streaming-valid formulation, unlike
    the islands window)."""
    import time

    from pandera_spark.operators.temporal import session_stats

    # bursty source: rate rows arrive continuously; keeping only the
    # first half of each second creates >300ms inter-burst gaps, so
    # sessions actually CLOSE (append mode only emits finalized sessions
    # once the watermark passes session end)
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "20").load()
        .filter(F.col("value") % 20 < 10)
        .select(
            F.col("timestamp").alias("ts"),
            F.lit(0).alias("user_id"),
            F.lit(1.0).alias("value"),
        )
        .withWatermark("ts", "1 second")
    )
    agg = session_stats(
        src, by=["user_id"], ts_col="ts", gap="300 milliseconds",
        aggs={"n_events": F.count(F.lit(1)).cast("long")},
    )
    got = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "sess"))
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not got:
            time.sleep(0.5)
    finally:
        q.stop()
    assert got and all(r.session_end > r.session_start for r in got)


def test_duplicate_rows_modes(spark):
    from pandera_spark.operators.dedup import duplicate_rows

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c")], "id int, k string"
    )
    allm = duplicate_rows(df, ["k"], mode="all").collect()
    assert sorted(r.id for r in allm) == [1, 2, 3]
    ef = duplicate_rows(df, ["k"], mode="exclude_first", order_by="id").collect()
    assert sorted(r.id for r in ef) == [2, 3]
    el = duplicate_rows(df, ["k"], mode="exclude_last", order_by="id").collect()
    assert sorted(r.id for r in el) == [1, 2]
    with pytest.raises(ValueError):
        duplicate_rows(df, ["k"], mode="exclude_first")


def test_salted_aggs_match_plain(spark):
    from pandera_spark.operators.skew import (
        salt_join_key,
        salted_agg,
        salted_count_by_key,
    )

    rows = [(i % 3, float(i)) for i in range(100)] + [(0, 1.0)] * 50
    df = spark.createDataFrame(rows, "k int, v double")
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {
        r.k: r["count"] for r in salted_count_by_key(df, ["k"]).collect()
    }
    assert salted == plain

    agg = {
        r.k: (r.sum_v, r.min_v, r.max_v)
        for r in salted_agg(
            df, ["k"], {"v": "sum"} | {}, n_salt=8
        ).select("k", "sum_v", F.lit(0).alias("min_v"),
                 F.lit(0).alias("max_v")).collect()
    }
    plain_sum = {r.k: r["sum(v)"] for r in df.groupBy("k").sum("v").collect()}
    for key in plain_sum:
        assert abs(agg[key][0] - plain_sum[key]) < 1e-9

    f, d, jk = salt_join_key(
        df, spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k int, nm string"),
        "k", n_salt=4,
    )
    joined = f.join(d, jk)
    assert joined.count() == df.count()  # every fact row matched exactly once


def test_ivf_indexed_partition_pruning(spark, vectors, tmp_path):
    from pandera_spark.operators.ann_ivf import (
        ivf_fit,
        ivf_topk,
        ivf_topk_indexed,
        ivf_write_index,
    )

    cents = ivf_fit(vectors, n_centroids=4, seed=7)
    idx = str(tmp_path / "ivf")
    ivf_write_index(vectors, cents, idx)

    q = vectors.filter(F.col("vec_id") == 0)
    direct = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(
            vectors, q, k=3, n_centroids=4, nprobe=4, seed=7,
            centroids=cents,
        ).collect()
    }
    indexed = ivf_topk_indexed(spark, idx, q, k=3, nprobe=4)
    got = {(r.query_id, r.rank): r.neighbor_id for r in indexed.collect()}
    assert got == direct

    # nprobe=1 must prune partitions at the file index
    pruned = ivf_topk_indexed(spark, idx, q, k=3, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_monotonic_violations_matches_global_window(spark):
    import random

    from pyspark.sql import Window
    from pandera_spark.operators.ordered import monotonic_violations

    rng = random.Random(7)
    rows = [(i, float(i + (5 if rng.random() < 0.2 else 0) - (8 if rng.random() < 0.1 else 0))) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "o int, v double").repartition(8)

    for decreasing, strict in [(False, False), (False, True), (True, False)]:
        w = Window.orderBy("o")
        prev = F.lag("v").over(w)
        cur = F.col("v")
        if decreasing:
            ok = cur < prev if strict else cur <= prev
        else:
            ok = cur > prev if strict else cur >= prev
        expected = df.select(
            (prev.isNotNull() & cur.isNotNull() & ~ok).cast("long").alias("x")
        ).agg(F.sum("x")).first()[0]
        got = monotonic_violations(
            df, "v", "o", decreasing=decreasing, strict=strict,
            num_partitions=7,
        )
        assert got == expected, (decreasing, strict, got, expected)


def test_end_to_end_training_data_pipeline(spark, tmp_path):
    """Integration: read -> validate/quarantine -> exact dedup -> quality
    filter -> token stats -> routed write. The composed engine a
    training-data pipeline actually runs."""
    from pandera_spark.operators.dedup import exact_dedup
    from pandera_spark.operators.text import bpe_ish_token_count
    from pandera_spark.sinks import split_valid_invalid
    from pandera_spark.sources import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    schema = DataFrameSchema(
        {
            "doc_id": Column(T.LongType(), Check.gt(0), nullable=False),
            "text": Column(T.StringType(), Check.str_length(1, 100_000),
                           nullable=False),
        },
        name="docs_in",
    )
    valid, quarantined = split_valid_invalid(docs, schema)
    deduped = exact_dedup(valid, ["text"], keep="any")
    scored = deduped.withColumn(
        "n_tokens", bpe_ish_token_count(F.col("text"))
    ).filter(F.col("n_tokens") >= 3)
    out_path = str(tmp_path / "clean_docs")
    scored.write.parquet(out_path)

    written = spark.read.parquet(out_path)
    n_in, n_q = docs.count(), quarantined.count()
    n_out = written.count()
    assert n_out > 0 and n_out <= n_in - n_q
    assert "n_tokens" in written.columns
    # dedup really happened: no duplicate texts remain
    assert written.select("text").distinct().count() == n_out


def test_read_orc_typed(spark, tmp_path):
    from pandera_spark.sources import read_orc

    p = str(tmp_path / "t.orc")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").write.orc(p)
    schema = DataFrameSchema(
        {"id": Column(T.IntegerType()), "s": Column(T.StringType())}
    )
    df = read_orc(spark, p, schema)
    assert df.schema["id"].dataType == T.IntegerType()
    assert df.count() == 2


def test_read_text_documents(spark, tmp_path):
    from pandera_spark.sources import read_text_documents

    (tmp_path / "a.txt").write_text("doc one\ndoc two\n")
    (tmp_path / "b.txt").write_text("doc three\n")
    df = read_text_documents(spark, str(tmp_path / "*.txt"))
    rows = df.collect()
    assert len(rows) == 3
    assert {r.text for r in rows} == {"doc one", "doc two", "doc three"}
    # ids are stable across re-reads (content+provenance hash)
    again = {r.text: r.doc_id for r in
             read_text_documents(spark, str(tmp_path / "*.txt")).collect()}
    assert all(again[r.text] == r.doc_id for r in rows)


def test_quarantine_stream(spark, tmp_path):
    import time

    from pandera_spark.sinks import quarantine_stream

    schema = DataFrameSchema({"value": Column(T.LongType(), Check.lt(5))})
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select("value")
    )
    out = str(tmp_path / "routed")
    q = (
        quarantine_stream(src, schema, out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 30
        import glob
        while time.time() < deadline:
            if glob.glob(f"{out}/_pandera_valid=false/*.parquet"):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    good = spark.read.parquet(f"{out}/_pandera_valid=true")
    bad = spark.read.parquet(f"{out}/_pandera_valid=false")
    assert good.count() > 0 and bad.count() > 0
    assert good.agg(F.max("value")).first()[0] < 5
    assert bad.agg(F.min("value")).first()[0] >= 5


def test_quarantine_includes_coerce_failures(spark):
    from pandera_spark.sinks import split_valid_invalid

    df = spark.createDataFrame(
        [("1", "a"), ("oops", "b"), (None, "c")], "v string, k string"
    )
    schema = DataFrameSchema(
        {"v": Column(T.IntegerType(), coerce=True)}, name="co"
    )
    valid, invalid = split_valid_invalid(df, schema)
    # 'oops' fails the cast -> quarantined; null original passes (nullable)
    assert sorted(r.k for r in valid.collect()) == ["a", "c"]
    assert [r.k for r in invalid.collect()] == ["b"]
    # hidden pre-cast columns never leak
    assert all(not c.startswith("__pandera") for c in valid.columns)


def test_drop_invalid_rows_drops_coerce_failures(spark):
    df = spark.createDataFrame(
        [("1",), ("oops",), ("3",)], "v string"
    )
    schema = DataFrameSchema(
        {"v": Column(T.IntegerType(), coerce=True)},
        drop_invalid_rows=True,
    )
    out = schema.validate_result(df).df
    assert sorted(r.v for r in out.collect()) == [1, 3]


# ---------------------------------------------------------------------------
# temporal operators (as-of join, banded range join, rollup cascade)


@pytest.fixture(scope="module")
def ticks(spark):
    rows = [
        # (id, user, ts, kind, value)
        (1, 10, "2024-01-01 10:00:00", "quote", 1.0),
        (2, 10, "2024-01-01 10:05:00", "trade", 0.0),
        (3, 10, "2024-01-01 10:10:00", "quote", 2.0),
        (4, 10, "2024-01-01 10:10:00", "trade", 0.0),  # exact-match tie
        (5, 10, "2024-01-01 10:30:00", "trade", 0.0),
        (6, 20, "2024-01-01 09:00:00", "trade", 0.0),  # no prior quote
        (7, 20, "2024-01-01 11:00:00", "quote", 9.0),
    ]
    return spark.createDataFrame(
        rows, "id bigint, user bigint, ts string, kind string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_asof_join_backward(spark, ticks):
    from pandera_spark.operators.temporal import asof_join

    trades = ticks.filter(F.col("kind") == "trade")
    quotes = ticks.filter(F.col("kind") == "quote").select(
        "user", "ts", F.col("id").alias("qid"), F.col("value").alias("qv")
    )
    out = asof_join(
        trades, quotes, on="ts", by=["user"], right_cols=["qid", "qv"]
    )
    got = {r.id: (r.qid_r, r.qv_r) for r in out.collect()}
    assert got[2] == (1, 1.0)   # latest quote before 10:05 is 10:00
    assert got[4] == (3, 2.0)   # exact match at 10:10 is inclusive
    assert got[5] == (3, 2.0)
    assert got[6] == (None, None)  # no prior quote -> left row kept, nulls


def test_asof_join_forward_and_tolerance(spark, ticks):
    from pandera_spark.operators.temporal import asof_join

    trades = ticks.filter(F.col("kind") == "trade")
    quotes = ticks.filter(F.col("kind") == "quote").select(
        "user", "ts", F.col("id").alias("qid")
    )
    fwd = asof_join(
        trades, quotes, on="ts", by=["user"], right_cols=["qid"],
        direction="forward",
    )
    got = {r.id: r.qid_r for r in fwd.collect()}
    assert got[2] == 3          # next quote after 10:05 is 10:10
    assert got[6] == 7          # forward finds the 11:00 quote
    assert got[5] is None       # nothing after 10:30 for user 10

    tol = asof_join(
        trades, quotes, on="ts", by=["user"], right_cols=["qid"],
        tolerance_seconds=60,
    )
    got = {r.id: r.qid_r for r in tol.collect()}
    assert got[4] == 3          # 0s away -> within tolerance
    assert got[5] is None       # 20min away -> out of tolerance


def test_banded_range_join(spark, ticks):
    from pandera_spark.operators.temporal import banded_range_join

    trades = ticks.filter(F.col("kind") == "trade")
    quotes = ticks.filter(F.col("kind") == "quote")
    out = banded_range_join(
        trades, quotes, left_on="ts", right_on="ts",
        band_seconds=360, by=["user"],
    )
    pairs = {(r.id, r.id_r) for r in out.collect()}
    # trade 2 (10:05) within 6min of quotes 1 (10:00) and 3 (10:10)
    assert (2, 1) in pairs and (2, 3) in pairs
    assert (4, 3) in pairs      # exact same ts
    assert (5, 3) not in pairs  # 20min apart
    assert not any(l == 6 for l, _ in pairs)  # cross-user never joins


def test_time_rollup_and_cascade(spark, ticks):
    from pandera_spark.operators.temporal import (
        rollup_reaggregate,
        time_rollup,
    )

    hourly = time_rollup(
        ticks, "ts", resolution="1 hour", keys=["user"],
        aggs={"n": F.count(F.lit(1)), "v": F.sum("value")},
    )
    rows = {(r.bucket_start.hour, r.user): (r.n, r.v)
            for r in hourly.collect()}
    assert rows[(10, 10)] == (5, 3.0)
    assert rows[(9, 20)] == (1, 0.0)

    daily = rollup_reaggregate(
        hourly, resolution="1 day", keys=["user"], sum_cols=["n", "v"],
    )
    drows = {r.user: (r.n, r.v) for r in daily.collect()}
    assert drows[10] == (5, 3.0)
    assert drows[20] == (2, 9.0)


def test_sessionize_matches_session_window(spark):
    """The islands window formulation and Spark's native session_window
    must agree on session boundaries — including the exact-gap boundary,
    where session_window merges adjacent sessions."""
    import datetime
    import random

    from pandera_spark.operators.temporal import session_stats, sessionize

    D = datetime.datetime
    rows = [
        (1, D(2024, 1, 1, 0, 0, 0)),
        (1, D(2024, 1, 1, 0, 10, 0)),
        (1, D(2024, 1, 1, 0, 40, 0)),   # exactly gap after prev: merges
        (1, D(2024, 1, 1, 2, 0, 0)),    # > gap: new session
        (2, D(2024, 1, 1, 0, 0, 0)),
    ]
    rng = random.Random(11)
    base = D(2024, 3, 1)
    for _ in range(300):
        rows.append(
            (rng.randrange(3, 8),
             base + datetime.timedelta(seconds=rng.randrange(0, 50_000)))
        )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    ses = sessionize(df, by=["user_id"], ts_col="ts", gap_seconds=1800)
    islands = (
        ses.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"),
             F.count(F.lit(1)).cast("long").alias("n_events"))
        .select("user_id", "session_start", "n_events")
    )
    native = session_stats(
        df, by=["user_id"], ts_col="ts", gap="30 minutes",
        aggs={"n_events": F.count(F.lit(1)).cast("long")},
    ).select("user_id", "session_start", "n_events")
    a = sorted(map(tuple, islands.collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b
    # the boundary case specifically: user 1 has 2 sessions, not 3
    per_user = {r.user_id: r.n for r in islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per_user[1] == 2 and per_user[2] == 1


def test_temporal_timestamp_ntz(spark, ticks):
    """Regression: the sfX parquet nano-ts shim yields TIMESTAMP_NTZ, which
    plain unix_micros rejects (r1's one red oracle row + crashed bench).
    Every epoch-math path must accept NTZ input and agree with the
    TIMESTAMP results."""
    from pandera_spark.operators.temporal import asof_join, banded_range_join

    ntz = ticks.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert str(ntz.schema["ts"].dataType) == "TimestampNTZType()"
    trades = ntz.filter(F.col("kind") == "trade")
    quotes = ntz.filter(F.col("kind") == "quote").select(
        "user", "ts", F.col("id").alias("qid")
    )

    tol = asof_join(
        trades, quotes, on="ts", by=["user"], right_cols=["qid"],
        tolerance_seconds=60,
    )
    got = {r.id: r.qid_r for r in tol.collect()}
    assert got[4] == 3 and got[5] is None

    out = banded_range_join(
        trades, ntz.filter(F.col("kind") == "quote"),
        left_on="ts", right_on="ts", band_seconds=360, by=["user"],
    )
    pairs = {(r.id, r.id_r) for r in out.collect()}
    assert (2, 1) in pairs and (2, 3) in pairs and (5, 3) not in pairs


# ---------------------------------------------------------------------------
# curation operators (splits, mixing, sampling, binning)


def test_hash_split_deterministic_and_leakage_free(spark):
    from pandera_spark.operators.curation import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    # duplicate keys (multi-row entities) must co-locate in one split
    dup = df.union(df)
    out = hash_split(dup, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_key = out.groupBy("k").agg(F.countDistinct("split").alias("ns"))
    assert per_key.filter(F.col("ns") > 1).count() == 0

    counts = {r.split: r.c for r in out.groupBy("split")
              .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert abs(counts["train"] / 4000 - 0.8) < 0.05
    # rerun-stable
    again = hash_split(dup, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0
    # a different salt draws a different assignment
    resplit = hash_split(
        dup, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2"
    )
    assert out.exceptAll(resplit).count() > 0

    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.5, "b": 0.6})


def test_weighted_mix_and_stratified_sample(spark):
    from pandera_spark.operators.curation import (
        stratified_sample,
        weighted_mix,
    )

    a = spark.range(0, 1000).select(F.col("id"))
    b = spark.range(0, 1000).select(F.col("id"))
    mix = weighted_mix({"a": (a, 1.0), "b": (b, 0.25)}, seed=7)
    counts = {r.source_corpus: r.c for r in mix.groupBy("source_corpus")
              .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts["a"] == 1000          # dominant corpus never discarded
    assert 150 < counts["b"] < 400      # ~250

    df = spark.range(0, 1000).withColumn(
        "stratum", F.when(F.col("id") % 10 == 0, "rare").otherwise("common")
    )
    s = stratified_sample(df, "stratum", {"rare": 1.0, "common": 0.1}, seed=1)
    got = {r.stratum: r.c for r in s.groupBy("stratum")
           .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert got["rare"] == 100           # fraction 1.0 keeps all
    assert 40 < got["common"] < 180


def test_bins_exact_and_scalable_agree(spark):
    from pandera_spark.operators.curation import cdf_bins, ntile_bins

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7 % 997).alias("score")
    )  # distinct scores -> both methods give identical equi-depth bins
    nt = ntile_bins(df, "score", 4, tiebreak_cols=["id"])
    cd = cdf_bins(df, "score", 4)
    joined = nt.alias("a").join(cd.alias("b"), "id").select(
        F.col("a.bin").alias("bn"), F.col("b.bin").alias("bc")
    )
    assert joined.filter(F.col("bn") != F.col("bc")).count() == 0
    sizes = [r.c for r in nt.groupBy("bin")
             .agg(F.count(F.lit(1)).alias("c")).orderBy("bin").collect()]
    assert sizes == [250, 250, 250, 250]
    # heavy ties: cdf_bins never splits a score across bins
    ties = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 2).alias("score")
    )
    cb = cdf_bins(ties, "score", 4)
    per_score = cb.groupBy("score").agg(F.countDistinct("bin").alias("nb"))
    assert per_score.filter(F.col("nb") > 1).count() == 0


# ---------------------------------------------------------------------------
# bucketed co-located validation (operators/bucketing.py)
# ---------------------------------------------------------------------------


def test_bucketed_fk_and_duplicates_no_exchange(spark):
    from pandera_spark.operators import bucketing as B
    from pandera_spark.operators.relational import fk_violations

    fact = spark.range(0, 5000).selectExpr("id % 300 as k", "id as payload")
    dim = spark.range(0, 250).selectExpr("id as k", "concat('d', id) as nm")
    B.write_bucketed(fact, "t_fact_b", "k", 4)
    B.write_bucketed(dim, "t_dim_b", "k", 4)
    try:
        viol = B.bucketed_fk_violations(spark, "t_fact_b", "t_dim_b", "k")
        # co-located: the validation join plans zero shuffles
        assert not B.plan_has_exchange(viol), B.physical_plan(viol)
        # same answer as the broadcast-anti-join operator on dataframes
        expect = fk_violations(fact, "k", dim).count()
        assert viol.count() == expect == 800  # keys 250..299, 16 rows each

        dups = B.bucketed_duplicates(spark, "t_fact_b", "k")
        assert not B.plan_has_exchange(dups), B.physical_plan(dups)
        assert dups.count() == 300  # every key repeats

        # control: the same merge join over unbucketed inputs shuffles
        ctrl = (
            spark.table("t_fact_b").repartition(4)
            .join(spark.table("t_dim_b").repartition(4).select("k").hint("merge"),
                  "k", "left_anti")
        )
        assert B.plan_has_exchange(ctrl)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fact_b")
        spark.sql("DROP TABLE IF EXISTS t_dim_b")


def test_bucketed_duplicates_ignores_null_keys(spark):
    from pandera_spark.operators import bucketing as B

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c"), (None, "d"), (2, "e")],
        "k int, v string",
    )
    B.write_bucketed(df, "t_nulls_b", "k", 2)
    try:
        dups = B.bucketed_duplicates(spark, "t_nulls_b", "k")
        rows = {(r["k"], r["n_duplicates"]) for r in dups.collect()}
        assert rows == {(1, 2)}  # nulls are not duplicates of each other
    finally:
        spark.sql("DROP TABLE IF EXISTS t_nulls_b")


def test_hash_stratified_sample_deterministic(spark):
    from pandera_spark.operators.curation import hash_stratified_sample

    df = spark.range(0, 2000).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' "
        "ELSE 'c' END AS s"
    )
    fr = {"a": 0.5, "b": 0.1}
    out1 = hash_stratified_sample(df, "s", "id", fr)
    out2 = hash_stratified_sample(df.repartition(7), "s", "id", fr)
    ids1 = {r["id"] for r in out1.collect()}
    ids2 = {r["id"] for r in out2.collect()}
    assert ids1 == ids2  # membership is a pure function of the key
    per = {r["s"]: r["n"] for r in out1.groupBy("s")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "c" not in per  # absent stratum dropped
    assert 0.4 < per["a"] / 667 < 0.6  # ~50% of stratum a
    assert 0.03 < per["b"] / 667 < 0.2  # ~10% of stratum b
    # salt draws an independent sample
    ids3 = {r["id"] for r in
            hash_stratified_sample(df, "s", "id", fr, salt="x").collect()}
    assert ids3 != ids1


# ---------------------------------------------------------------------------
# connected components / dedup clustering


def _uf_components(n_nodes_edges):
    """Pure-python union-find reference."""
    edges = n_nodes_edges
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 4)],                  # chain
        [(10, 1), (10, 2), (10, 3)],               # star, hub is max
        [(1, 2), (3, 4), (5, 6)],                  # three 2-clusters
        [(1, 2), (2, 3), (3, 1), (7, 8)],          # cycle + pair
        [(5, 5), (1, 2)],                          # self loop ignored
        [(2, 1), (1, 2), (2, 1)],                  # duplicates both ways
    ],
)
def test_connected_components_known_graphs(spark, edges):
    from pandera_spark.operators.clustering import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _uf_components([(a, b) for a, b in edges if a != b])
    # both execution paths: driver union-find and distributed star rounds
    for thresh in (200_000, 0):
        got = {r.node: r.component
               for r in connected_components(
                   df, small_graph_threshold=thresh).collect()}
        assert got == want, f"threshold={thresh}"


def test_connected_components_random_parity(spark):
    import random

    from pandera_spark.operators.clustering import connected_components

    rng = random.Random(7)
    for trial, thresh in [(0, 200_000), (1, 0), (2, 200_000)]:
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.component
               for r in connected_components(
                   df, small_graph_threshold=thresh).collect()}
        assert got == _uf_components(edges), f"trial {trial}"


def test_dedup_clusters_summary(spark):
    from pandera_spark.operators.clustering import dedup_clusters

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 8)], "id_a long, id_b long"
    )
    out = {r.component: (r.n_members, r.keep_id)
           for r in dedup_clusters(df).collect()}
    assert out == {1: (3, 1), 8: (2, 8)}


def test_apply_dedup_keeps_canonical_and_isolated(spark):
    from pandera_spark.operators.clustering import apply_dedup

    corpus = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 9)], "doc_id long, text string"
    )
    # clusters {1,2,3} and {5,6}; 4, 7, 8 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in apply_dedup(corpus, pairs, id_col="doc_id").collect()
    )
    assert kept == [1, 4, 5, 7, 8]
    # empty pair graph: everything passes through
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert apply_dedup(corpus, empty, id_col="doc_id").count() == 8


def test_connected_components_rejects_string_ids(spark):
    from pandera_spark.operators.clustering import connected_components

    df = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(TypeError, match="integral ids"):
        connected_components(df)


def test_repetition_stats_known_values(spark):
    from pandera_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat again"),
            (2, "a b a b a b a b"),
            (3, "all distinct words here now"),
            (4, "x"),     # shorter than the n-gram width
            (5, ""),      # empty
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_words, r.dup_word_frac, r.n_grams, r.dup_gram_frac,
            r.top_gram_frac,
        )
        for r in repetition_stats(df, ngram_n=2).collect()
    }
    # doc 1: 10 words, 6 distinct; 9 bigrams, 7 distinct, top "the cat" x2
    assert got[1] == (10, 0.4, 9, 0.222222, 0.222222)
    # doc 2: "a b" x4 + "b a" x3
    assert got[2] == (8, 0.75, 7, 0.714286, 0.571429)
    assert got[3] == (5, 0.0, 4, 0.0, 0.25)
    assert got[4] == (1, 0.0, 0, 0.0, 0.0)
    assert got[5] == (0, 0.0, 0, 0.0, 0.0)


def test_pii_counts_and_scrub(spark):
    from pandera_spark.operators.text import (
        PII_PATTERNS,
        pii_counts,
        pii_scrub,
    )

    df = spark.createDataFrame(
        [
            (1, "write to alice@example.org or 10.0.0.1"),
            (2, "call 555-123-4567 or 555 987 6543"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_email, r.n_ipv4, r.n_phone)
        for r in pii_counts(df).collect()
    }
    assert got == {1: (1, 1, 0), 2: (0, 0, 2), 3: (0, 0, 0)}
    scrubbed = pii_scrub(df)
    texts = {r.doc_id: r.text for r in scrubbed.collect()}
    assert texts[1] == "write to [PII] or [PII]"
    assert texts[2] == "call [PII] or [PII]"
    assert texts[3] == "clean text with no pii at all"
    # post-scrub residual must be zero for every pattern
    residual = pii_counts(scrubbed).agg(
        *[F.sum(f"n_{k}").alias(k) for k in PII_PATTERNS]
    ).first()
    assert all((residual[k] or 0) == 0 for k in PII_PATTERNS)


def test_contamination_pairs_and_decontaminate(spark):
    from pandera_spark.operators.contamination import (
        contamination_pairs,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "entirely unrelated content nothing shared with eval"),
            (3, "the quick brown fox appears here too somehow"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    for portable in (False, True):
        pairs = {
            (r.doc_id, r.bench_id): r.n_shared
            for r in contamination_pairs(
                corpus, bench, ngram_n=3, min_shared=2, portable=portable
            ).collect()
        }
        assert (1, 100) in pairs and pairs[(1, 100)] >= 6, pairs
        assert all(doc != 2 for doc, _ in pairs)
        kept = sorted(
            r.doc_id for r in decontaminate(
                corpus, bench, ngram_n=3, min_shared=2, portable=portable
            ).collect()
        )
        assert 1 not in kept and 2 in kept


def test_embedding_outliers(spark):
    from pandera_spark.operators.similarity import (
        centroid,
        embedding_outliers,
    )

    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [1.1, -0.1]),
        (4, [-1.0, 0.0]),  # opposite of the cluster -> clear outlier
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c = centroid(df, "embedding", dim=2)
    assert abs(c[0] - 0.5) < 1e-9 and abs(c[1] - 0.0) < 1e-9
    sims = {r.vec_id: r.centroid_sim
            for r in embedding_outliers(df, dim=2).collect()}
    assert min(sims, key=sims.get) == 4
    assert sims[4] < 0 < sims[1]


def test_curate_corpus_composition(spark):
    from pandera_spark.operators.curation import curate_corpus
    from pandera_spark.operators.text import token_count

    long_dup = "many words repeated here for a sufficiently long document"
    corpus = spark.createDataFrame(
        [
            (20, long_dup),
            (21, long_dup),                      # near-dup of 20 -> dropped
            (22, "short"),                        # fails quality gate
            (23, "the quick brown fox jumps over the lazy dog tonight"),
            (24, "completely original text that survives every stage fine"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in curate_corpus(
            corpus,
            quality_predicate=token_count(F.col("text")) >= 5,
            benchmark=bench,
            num_hashes=16, bands=8, shingle_n=2,
            decontam_ngram_n=3, decontam_min_shared=2,
        ).collect()
    )
    # 20 kept (min id of the dup cluster), 21 deduped, 22 quality-gated,
    # 23 contaminated by the bench doc, 24 untouched
    assert kept == [20, 24]
    # stages are skippable: no predicate, no benchmark -> dedup only
    kept2 = sorted(
        r.doc_id
        for r in curate_corpus(
            corpus, num_hashes=16, bands=8, shingle_n=2
        ).collect()
    )
    assert 22 in kept2 and 23 in kept2 and 21 not in kept2


def test_lsh_dedup_no_persist_path_matches(spark, docs):
    """storage_level=None (recompute lineage, no cache) must give the
    identical candidate/pair sets as the default cached path."""
    from pandera_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_near_dups,
    )

    mk = lambda **kw: sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=16, bands=4, **kw
        ).collect()
    )
    assert mk(storage_level=None) == mk()
    sk = lambda **kw: sorted(
        (r.id_a, r.id_b)
        for r in simhash_near_dups(
            docs, "doc_id", "text", max_hamming=2, **kw
        ).collect()
    )
    assert sk(storage_level=None) == sk()


# ---------------------------------------------------------------------------
# drift operators


def test_category_drift_identical_is_zero(spark):
    from pandera_spark.operators.drift import category_drift

    df = spark.createDataFrame(
        [(i, "abc"[i % 3]) for i in range(60)], "id bigint, cat string"
    )
    row = category_drift(df, df, "cat").first()
    assert row.n_a == 60 and row.n_b == 60
    assert row.n_categories == 3 and row.dof == 2
    assert abs(row.chi2_stat) < 1e-12
    assert abs(row.js_divergence) < 1e-12


def test_category_drift_known_chi2(spark):
    from pandera_spark.operators.drift import category_drift

    # 2x2 table: a = 30 x / 10 y, b = 10 x / 30 y
    a = spark.createDataFrame(
        [(i, "x" if i < 30 else "y") for i in range(40)], "id int, cat string"
    )
    b = spark.createDataFrame(
        [(i, "x" if i < 10 else "y") for i in range(40)], "id int, cat string"
    )
    row = category_drift(a, b, "cat", pvalue=True).first()
    # classic chi2 for [[30,10],[10,30]] = 80*(30*30-10*10)^2/(40*40*40*40)
    assert abs(row.chi2_stat - 20.0) < 1e-9
    assert row.dof == 1
    # exact sf(20, 1) = 7.744e-6; Wilson-Hilferty is ~1e-2 relative here
    assert 0 < row.chi2_pvalue < 1e-4
    # disjoint support in the 2 categories is symmetric: JS > 0
    assert row.js_divergence > 0.05


def test_category_drift_category_absent_one_side(spark):
    from pandera_spark.operators.drift import category_drift

    a = spark.createDataFrame([(1, "x"), (2, "x")], "id int, cat string")
    b = spark.createDataFrame([(1, "x"), (2, "z")], "id int, cat string")
    row = category_drift(a, b, "cat").first()
    assert row.n_categories == 2
    # finite statistic even with a zero cell
    assert row.chi2_stat == pytest.approx(
        (2 - 1.5) ** 2 / 1.5 * 2 + (0 - 0.5) ** 2 / 0.5 + (1 - 0.5) ** 2 / 0.5
    )


def test_norm_sf_against_known_values(spark):
    from pandera_spark.operators.drift import _norm_sf

    df = spark.range(1).select(
        _norm_sf(F.lit(0.0)).alias("z0"),
        _norm_sf(F.lit(1.6448536269514722)).alias("z95"),
        _norm_sf(F.lit(-1.6448536269514722)).alias("zm95"),
    )
    row = df.first()
    assert row.z0 == pytest.approx(0.5, abs=1e-7)
    assert row.z95 == pytest.approx(0.05, abs=1e-6)
    assert row.zm95 == pytest.approx(0.95, abs=1e-6)


def test_bin_column_edges_and_nulls(spark):
    from pandera_spark.operators.drift import bin_column

    df = spark.createDataFrame(
        [(None,), (5.0,), (10.0,), (15.0,), (20.0,), (25.0,)],
        "v double",
    )
    out = [
        r.bin for r in df.select(bin_column(F.col("v"), [10, 20]).alias("bin"))
        .collect()
    ]
    # null -> -1; 5 -> 0; 10,15 -> 1 (left-closed); 20,25 -> 2
    assert out == [-1, 0, 1, 1, 2, 2]
    with pytest.raises(ValueError):
        bin_column(F.col("v"), [20, 10])
    with pytest.raises(ValueError):
        bin_column(F.col("v"), [])


def test_psi_zero_for_identical_and_positive_for_shifted(spark):
    from pandera_spark.operators.drift import psi

    a = spark.range(1000).select((F.col("id") % 100).alias("v"))
    b = spark.range(1000).select(((F.col("id") % 100) + 50).alias("v"))
    edges = [25.0, 50.0, 75.0, 100.0, 125.0]
    same = psi(a, a, "v", edges).first()
    assert same.psi == pytest.approx(0.0, abs=1e-12)
    shifted = psi(a, b, "v", edges).first()
    assert shifted.psi > 0.25
    assert shifted.n_a == 1000 and shifted.n_b == 1000


def test_psi_bins_empty_bin_floored(spark):
    from pandera_spark.operators.drift import psi_bins, PSI_EPS

    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(11.0,), (12.0,)], "v double")
    rows = {r.bin: r for r in psi_bins(a, b, "v", [10.0]).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].frac_a == pytest.approx(1.0)
    assert rows[0].frac_b == pytest.approx(PSI_EPS)
    # per-bin terms are finite and symmetric across the two bins
    assert rows[0].psi_term == pytest.approx(rows[1].psi_term)


# ---------------------------------------------------------------------------
# n-gram heavy hitters


def test_word_ngrams_short_docs_empty(spark):
    from pandera_spark.operators.text import word_ngrams

    df = spark.createDataFrame(
        [("a b c",), ("one",), ("",)], "text string"
    )
    out = [
        r.g for r in df.select(word_ngrams(F.col("text"), 2).alias("g"))
        .collect()
    ]
    assert out[0] == ["a b", "b c"]
    assert out[1] == []
    assert out[2] == []


def test_top_ngrams_deterministic_tiebreak(spark):
    from pandera_spark.operators.text import top_ngrams

    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "a b"), (4, "c d")],
        "doc_id bigint, text string",
    )
    rows = top_ngrams(df, "text", n=2, k=2).collect()
    assert (rows[0].gram, rows[0].n_occurrences) == ("x y", 2)
    # tie between "a b" and "c d" broken ascending
    assert (rows[1].gram, rows[1].n_occurrences) == ("a b", 1)


def test_top_ngrams_plan_is_take_ordered(spark):
    from pandera_spark.operators.text import top_ngrams

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = top_ngrams(df, "text", n=2, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# percentile profiling


def test_numeric_percentiles_known_values(spark):
    from pandera_spark.inference import numeric_percentiles

    df = spark.range(1, 101).select(
        F.col("id").cast("double").alias("a"),
        (F.col("id") * 10).cast("double").alias("b"),
    )
    rows = {
        r.col_name: r
        for r in numeric_percentiles(df, ["a", "b"], exact=True).collect()
    }
    # exact path: interpolation at rank p*(n-1) 0-based over 1..100
    assert rows["a"].p50 == pytest.approx(50.5)
    assert rows["a"].p90 == pytest.approx(90.1)
    assert rows["b"].p50 == pytest.approx(505.0)
    assert rows["b"].p99 == pytest.approx(rows["a"].p99 * 10)


def test_numeric_percentiles_approx_default_known_values(spark):
    """The DEFAULT path is the GK sketch: with accuracy >= n the rank
    error is zero and it returns the ACTUAL data value at the target
    rank (percentile_disc semantics) — 50.0 on 1..100, never the
    interpolated 50.5."""
    from pandera_spark.inference import numeric_percentiles

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("a"))
    rows = {
        r.col_name: r
        for r in numeric_percentiles(df, ["a"], accuracy=1000).collect()
    }
    assert rows["a"].p50 == pytest.approx(50.0)
    assert rows["a"].p90 == pytest.approx(90.0)
    assert rows["a"].p99 == pytest.approx(99.0)


def test_numeric_percentiles_approx_rank_error_bound(spark):
    """Sketch guarantee at accuracy < n: the returned value is a member
    of the data whose rank is within n/accuracy of the target."""
    from pandera_spark.inference import numeric_percentiles

    n, acc = 5000, 100  # rank error bound: n/acc = 50
    df = spark.range(1, n + 1).select(
        F.col("id").cast("double").alias("a")
    )
    row = numeric_percentiles(
        df, ["a"], probs=(0.5,), accuracy=acc
    ).first()
    got = row.p50
    assert got == float(int(got))  # an actual data value, no interpolation
    assert abs(got - 0.5 * n) <= n / acc + 1


def test_numeric_percentiles_single_job(spark):
    from pandera_spark.inference import numeric_percentiles

    df = spark.range(100).select(
        F.col("id").cast("double").alias("a"),
        F.col("id").cast("double").alias("b"),
        F.col("id").cast("double").alias("c"),
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    numeric_percentiles(df, ["a", "b", "c"]).collect()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= 2  # one agg job (+ possible AQE follow-up)


def test_corpus_profile_groups(spark, docs):
    from pandera_spark.operators.text import corpus_profile

    prof = {r[0]: r for r in corpus_profile(docs, "lang").collect()}
    assert prof["en"].n_docs == 4
    assert prof["de"].n_docs == 1
    assert prof["en"].sum_tokens > 0
    assert 0.0 <= prof["en"].avg_quality <= 1.0
    assert prof["de"].n_langs == 1


def test_streaming_dedup_cross_batch(spark, tmp_path):
    """Duplicates arriving in a LATER micro-batch are suppressed by
    dropDuplicatesWithinWatermark state (file source, one file per
    batch, availableNow so the run is deterministic and bounded)."""
    import json

    from pandera_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 1, "ts": "2024-01-01 00:00:01"},
                {"k": 2, "ts": "2024-01-01 00:00:02"},
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"k": 1, "ts": "2024-01-01 00:00:03"},  # cross-batch dup
                {"k": 3, "ts": "2024-01-01 00:00:04"},
            ]
        )
    )
    stream = (
        spark.readStream.schema("k bigint, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    dd = streaming_dedup(stream, ["k"], watermark_col="ts", delay="10 minutes")
    got = []
    q = (
        dd.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r.k for r in got) == [1, 2, 3]


def test_ks_drift_identical_zero_and_disjoint_one(spark):
    from pandera_spark.operators.drift import ks_drift

    a = spark.range(100).select(F.col("id").cast("double").alias("v"))
    b = spark.range(100, 200).select(F.col("id").cast("double").alias("v"))
    same = ks_drift(a, a, "v").first()
    assert same.ks_stat == pytest.approx(0.0, abs=1e-12)
    disjoint = ks_drift(a, b, "v", pvalue=True).first()
    assert disjoint.ks_stat == pytest.approx(1.0)
    assert disjoint.ks_pvalue == pytest.approx(0.0, abs=1e-12)
    assert disjoint.n_a == 100 and disjoint.n_b == 100


def test_ks_drift_known_value_and_nulls(spark):
    from pandera_spark.operators.drift import ks_drift

    # a = {1,2,3,4}, b = {3,4,5,6}: max CDF gap is 0.5 (at v=2)
    a = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (None,)], "v double"
    )
    b = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "v double")
    row = ks_drift(a, b, "v").first()
    assert row.n_a == 4  # null excluded
    assert row.ks_stat == pytest.approx(0.5)


def test_ks_pvalue_matches_asymptotic_series(spark):
    import math

    from pandera_spark.operators.drift import ks_drift

    a = spark.range(500).select((F.col("id") % 50).cast("double").alias("v"))
    b = spark.range(500).select(((F.col("id") % 50) + 5).cast("double").alias("v"))
    row = ks_drift(a, b, "v", pvalue=True).first()
    ne = row.n_a * row.n_b / (row.n_a + row.n_b)
    lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * row.ks_stat
    want = 2 * sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, 101)
    )
    assert row.ks_pvalue == pytest.approx(min(1.0, max(0.0, want)), abs=1e-9)


# ---------------------------------------------------------------------------
# group-wise validation report


@pytest.fixture(scope="module")
def seg_df(spark):
    rows = [
        # (grp, x, s): grp a has 2 x-violations + 1 null; grp b clean
        ("a", 5, "ok"), ("a", -1, "ok"), ("a", -2, "bad_longer"),
        ("a", None, "ok"), ("b", 1, "ok"), ("b", 2, "ok"),
    ]
    return spark.createDataFrame(rows, "grp string, x int, s string")


def test_groupwise_report_counts(spark, seg_df):
    schema = DataFrameSchema(
        {
            "x": Column(
                checks=[Check.ge(0, error="x_ge_0")], nullable=False
            ),
            "s": Column(checks=[Check.str_length(1, 5, error="s_len")]),
        },
        name="seg",
    )
    rep = schema.groupwise_report(seg_df, ["grp"])
    rows = {(r.grp, r.col_name, r.check): r for r in rep.collect()}
    assert rows[("a", "x", "x_ge_0")].violations == 2
    assert rows[("a", "x", "not_nullable")].violations == 1
    assert rows[("a", "s", "s_len")].violations == 1
    assert rows[("a", "s", "s_len")].n_rows == 4
    assert rows[("b", "x", "x_ge_0")].violations == 0
    assert rows[("b", "s", "s_len")].n_rows == 2
    # one row per (group, spec): 2 groups x 3 specs
    assert len(rows) == 6


def test_groupwise_report_reconciles_with_global(spark, seg_df):
    """Sum of per-group violations == the global report's counts."""
    schema = DataFrameSchema(
        {"x": Column(checks=[Check.ge(0, error="x_ge_0")], nullable=False)},
        name="seg",
    )
    rep = schema.groupwise_report(seg_df, ["grp"]).collect()
    total = {
        (r.col_name, r.check): 0 for r in rep
    }
    for r in rep:
        total[(r.col_name, r.check)] += r.violations
    res = schema.validate_result(seg_df)
    glob = {
        (o.column, o.check): int(o.violations)
        for o in res.outcomes
        if o.check in ("x_ge_0", "not_nullable")
    }
    assert total == glob


def test_groupwise_report_single_shuffle_plan(spark, seg_df):
    """The grouped report is ONE hash aggregation: exactly one Exchange
    below the explode projection."""
    schema = DataFrameSchema(
        {"x": Column(checks=[Check.ge(0, error="x_ge_0")], nullable=False)},
        name="seg",
    )
    plan = (
        schema.groupwise_report(seg_df, ["grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_rollup_anomalies_flags_planted_spike(spark):
    import datetime as dt

    from pandera_spark.operators.temporal import (
        rollup_anomalies, time_rollup,
    )

    # 10 days x hours {1, 2}: hour 1 always 5 events, hour 2 always 5
    # events except day 9 where it spikes to 50
    rows = []
    eid = 0
    for day in range(1, 11):
        for hour in (1, 2):
            n = 50 if (day == 9 and hour == 2) else 5
            for _ in range(n):
                rows.append(
                    (eid, dt.datetime(2024, 1, day, hour, 30), "click")
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )
    hourly = time_rollup(df, "ts", resolution="1 hour", keys=["event_type"])
    out = rollup_anomalies(
        hourly, "n_events", keys=["event_type"], z_threshold=2.0
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.bucket_start == dt.datetime(2024, 1, 9, 2)
    assert r.n_events == 50 and r.season == 2
    assert r.z > 2.0


def test_rollup_anomalies_constant_and_singleton_groups(spark):
    import datetime as dt

    from pandera_spark.operators.temporal import rollup_anomalies

    rows = [
        # constant baseline at hour 1 (std 0, every point on it): clean
        (dt.datetime(2024, 1, 1, 1), "a", 7),
        (dt.datetime(2024, 1, 2, 1), "a", 7),
        (dt.datetime(2024, 1, 3, 1), "a", 7),
        # singleton group (one bucket at hour 5): never flagged — a
        # single observation has no baseline to deviate from
        (dt.datetime(2024, 1, 1, 5), "a", 1000),
    ]
    hourly = spark.createDataFrame(
        rows, "bucket_start timestamp, event_type string, n_events bigint"
    )
    out = rollup_anomalies(
        hourly, "n_events", keys=["event_type"], z_threshold=2.0
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# sequence packing


def test_greedy_pack_known_sequence(spark):
    from pandera_spark.operators.packing import greedy_pack

    # one bucket, budget 10: [4,4,4] -> packs 0,0,1; then 12 (oversized)
    # -> own pack 2; then 3,7 -> pack 3
    rows = [(1, 4), (2, 4), (3, 4), (4, 12), (5, 3), (6, 7)]
    df = spark.createDataFrame(rows, "id bigint, toks bigint")
    out = {
        r.id: r.pack
        for r in greedy_pack(
            df, "id", "toks", 10, bucket=F.lit(0)
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 3}


def test_greedy_pack_never_exceeds_budget_except_oversized(spark):
    from pandera_spark.operators.packing import greedy_pack, pack_stats

    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 37 + 1).alias("toks")
    )
    packed = greedy_pack(df, "id", "toks", 50, bucket=F.col("id") % 4)
    st = pack_stats(packed, 50).collect()
    assert all(r.pack_tokens <= 50 for r in st)  # no toks > budget here
    # packing preserves every row exactly once
    assert packed.count() == 200
    assert packed.select("id").distinct().count() == 200


def test_greedy_pack_matches_python_reference(spark):
    import random

    from pandera_spark.operators.packing import greedy_pack

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 80)) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, toks bigint")
    got = {
        (r.bucket, r.id): r.pack
        for r in greedy_pack(
            df, "id", "toks", 64, bucket=F.col("id") % 5
        ).collect()
    }
    want = {}
    for b in range(5):
        cur, fill = 0, 0
        for i, t in [r for r in rows if r[0] % 5 == b]:
            if fill > 0 and fill + t > 64:
                cur, fill = cur + 1, 0
            fill += t
            want[(b, i)] = cur
    assert got == want


def test_chunk_pack_no_udf_and_straddle_semantics(spark):
    from pandera_spark.operators.packing import chunk_pack

    rows = [(1, 6), (2, 6), (3, 6)]
    df = spark.createDataFrame(rows, "id bigint, toks bigint")
    out = {
        r.id: r.pack
        for r in chunk_pack(df, "id", "toks", 10, bucket=F.lit(0)).collect()
    }
    # cum_before: 0, 6, 12 -> packs 0, 0, 1 (doc 2 straddles into pack 0)
    assert out == {1: 0, 2: 0, 3: 1}
    plan = chunk_pack(
        df, "id", "toks", 10, bucket=F.lit(0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_temperature_sample_proportions_and_determinism(spark):
    from pandera_spark.operators.curation import temperature_sample

    rows = [(i, "big" if i < 800 else "small") for i in range(900)]
    df = spark.createDataFrame(rows, "id bigint, src string")
    kept = temperature_sample(df, "src", "id", alpha=0.5)
    counts = {r.src: r.c for r in kept.groupBy("src").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    # smallest stratum kept whole
    assert counts["small"] == 100
    # big stratum sampled at ~sqrt(100/800) = 0.354: hash-uniform so
    # within a loose band
    assert 220 <= counts["big"] <= 340
    # deterministic: identical rerun, different with a different salt
    again = {r.src: r.c for r in temperature_sample(
        df, "src", "id", alpha=0.5).groupBy("src").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert again == counts
    salted = temperature_sample(df, "src", "id", alpha=0.5, salt="x")
    assert sorted(r.id for r in salted.collect()) != sorted(
        r.id for r in kept.collect()
    )


def test_temperature_sample_alpha_bounds(spark):
    from pandera_spark.operators.curation import temperature_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id bigint, src string"
    )
    # alpha=1: keep everything
    assert temperature_sample(df, "src", "id", alpha=1.0).count() == 3
    with pytest.raises(ValueError):
        temperature_sample(df, "src", "id", alpha=1.5)


def test_verify_pairs_cosine_known_vectors(spark):
    from pandera_spark.operators.similarity import verify_pairs_cosine

    embs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),   # identical to 1
            (3, [0.0, 1.0]),   # orthogonal to 1
            (4, [-1.0, 0.0]),  # opposite of 1
        ],
        "vec_id bigint, embedding array<double>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a bigint, id_b bigint"
    )
    out = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in verify_pairs_cosine(pairs, embs, threshold=-2.0).collect()
    }
    assert out[(1, 2)] == pytest.approx(1.0)
    assert out[(1, 3)] == pytest.approx(0.0)
    assert out[(1, 4)] == pytest.approx(-1.0)
    # threshold filters
    from pyspark.sql import functions as F  # noqa: F401
    kept = verify_pairs_cosine(pairs, embs, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in kept] == [(1, 2)]


def test_ngram_containment_doc_in_doc(spark):
    from pandera_spark.operators.dedup import ngram_containment_pairs

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words here now")],
        "doc_id bigint, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a bigint, id_b bigint"
    )
    out = {
        (r.id_a, r.id_b): r
        for r in ngram_containment_pairs(
            df, "doc_id", "text", candidates=cands, shingle_n=3,
            threshold=0.9,
        ).collect()
    }
    # doc 1 fully contained in doc 2: containment_ab = 1.0, but the
    # symmetric direction is small (2 is much longer)
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r.containment_ab == pytest.approx(1.0)
    assert r.containment_ba < 0.2


def test_drift_report_matches_single_column_ops(spark):
    """The one-shuffle multi-column report must agree with the
    single-column operators on every statistic."""
    from pandera_spark.operators.drift import (
        category_drift, drift_report, psi,
    )

    df = spark.createDataFrame(
        [(i, "xyz"[i % 3], float(i % 10)) for i in range(120)],
        "id bigint, cat string, v double",
    )
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 3 == 0)
    edges = [3.0, 6.0]
    rep = {
        r.col_name: r
        for r in drift_report(
            a, b, cat_cols=["cat"], binned_cols={"v": edges}
        ).collect()
    }
    cd = category_drift(a, b, "cat").first()
    assert rep["cat"].chi2_stat == pytest.approx(cd.chi2_stat)
    assert rep["cat"].js_divergence == pytest.approx(cd.js_divergence)
    assert rep["cat"].n_keys == cd.n_categories
    ps = psi(a, b, "v", edges).first()
    assert rep["v"].psi == pytest.approx(ps.psi)
    assert rep["v"].n_a == ps.n_a


def test_drift_report_single_shuffle_and_null_keys(spark):
    from pandera_spark.operators.drift import drift_report

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y"), (4, None)], "id bigint, cat string"
    )
    a = df.filter(F.col("id") <= 2)
    b = df.filter(F.col("id") > 2)
    rep = drift_report(a, b, cat_cols=["cat"]).collect()
    # null is a first-class key: 3 keys total (x, y, null sentinel)
    assert rep[0].n_keys == 3
    # the counts exchange is consumed twice (per-key stats + totals);
    # at runtime AQE reuses it, so the melted row-grain data is
    # shuffled ONCE — assert the reuse actually happened
    q = drift_report(a, b, cat_cols=["cat"])
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    with pytest.raises(ValueError):
        drift_report(a, b)


def test_partitioned_corpus_scan_prunes(spark, tmp_path):
    """Validation/curation over a hive-partitioned corpus must reach the
    scan with BOTH partition pruning (lang=) and a pushed data filter
    (n_chars) — the layout a 100 TB corpus actually uses."""
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "de", 10 + i) for i in range(40)],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    path = str(tmp_path / "corpus")
    docs.write.partitionBy("lang").parquet(path)
    q = (
        spark.read.parquet(path)
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 30))
        .select("doc_id", "n_chars")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "n_chars" in pushed
    # column pruning: text never read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema
    assert q.count() == 10


def test_corpus_line_dedup_removes_boilerplate(spark):
    from pandera_spark.operators.text import corpus_line_dedup

    banner = "accept our cookies"
    rows = [
        (1, f"{banner}\nunique content one\nmore text one"),
        (2, f"{banner}\nunique content two"),
        (3, f"{banner}\nunique content three"),
        (4, banner),  # only the boilerplate line
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r.text
        for r in corpus_line_dedup(df, max_doc_frequency=2).collect()
    }
    # the banner appears in 4 docs > 2 -> removed everywhere; order kept
    assert out[1] == "unique content one\nmore text one"
    assert out[2] == "unique content two"
    assert out[3] == "unique content three"
    # doc 4 lost every line -> absent
    assert 4 not in out


def test_corpus_line_dedup_keeps_rare_duplicates(spark):
    from pandera_spark.operators.text import corpus_line_dedup

    rows = [(1, "shared\nalpha"), (2, "shared\nbeta"), (3, "gamma")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r.text
        for r in corpus_line_dedup(df, max_doc_frequency=2).collect()
    }
    # "shared" appears in exactly 2 docs == threshold -> kept
    assert out[1] == "shared\nalpha"
    assert out[2] == "shared\nbeta"
    assert out[3] == "gamma"


def test_strip_markup_restores_clean_text(spark):
    from pandera_spark.operators.text import strip_markup

    df = spark.createDataFrame(
        [
            ("<html><body>hello <b>world</b></body></html>",),
            ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y",),
            ("already clean",),
        ],
        "t string",
    )
    out = [r.c for r in df.select(strip_markup(F.col("t")).alias("c")).collect()]
    assert out[0] == "hello world"
    assert out[1] == 'a & b <tag> "q" \'s\' x y'
    assert out[2] == "already clean"


def test_top_k_per_group_deterministic(spark):
    from pandera_spark.operators.text import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.9), ("a", 3, 0.1),
         ("b", 4, 0.5), ("b", 5, 0.7)],
        "g string, id bigint, score double",
    )
    out = top_k_per_group(
        df, "g", [F.col("score").desc(), F.col("id").asc()], 2
    ).collect()
    got = {(r.g, r.id) for r in out}
    # tie at 0.9 broken by id asc: both kept (k=2); b keeps 5 then 4
    assert got == {("a", 1), ("a", 2), ("b", 5), ("b", 4)}


def test_streaming_category_drift_against_baseline(spark, tmp_path):
    """Per-window drift of a stream vs a static baseline mix: balanced
    window -> chi2 0; skewed window -> chi2 > 0.  Uses chained
    windowed aggregations (Spark 3.4+ multiple stateful operators) in
    append mode, availableNow for determinism."""
    import json

    from pandera_spark.streaming.stateful import streaming_category_drift

    src = tmp_path / "in"
    src.mkdir()
    rows = []
    # minute 0: 30/30 split (matches baseline); minute 1: 50/10 skew
    for i in range(60):
        rows.append(
            {"ts": f"2024-01-01 00:00:{i % 50 + 1:02d}", "cat": "xy"[i % 2]}
        )
    for i in range(60):
        rows.append(
            {"ts": f"2024-01-01 00:01:{i % 50 + 1:02d}",
             "cat": "x" if i < 50 else "y"}
        )
    rows.append({"ts": "2024-01-01 00:10:00", "cat": "x"})  # advance wm
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts string, cat string").json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    base = spark.createDataFrame(
        [("x", 30), ("y", 30)], "cat string, n_base long"
    )
    drift = streaming_category_drift(
        stream, base, "cat", ts_col="ts",
        window="1 minute", watermark="1 second",
    )
    got = []
    q = (
        drift.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_start = {r.window_start.minute: r for r in got}
    assert set(by_start) == {0, 1}
    assert by_start[0].chi2_stat == pytest.approx(0.0, abs=1e-12)
    assert by_start[1].chi2_stat > 5.0
    assert by_start[1].js_divergence > 0.01
    assert by_start[0].n_obs == 60 and by_start[1].n_obs == 60


def test_incremental_minhash_matches_full_run(spark, tmp_path):
    """Index old docs once; candidates for a new batch must equal the
    full-corpus LSH pairs restricted to pairs touching a new doc —
    via both the DataFrame index and the parquet round-trip."""
    from pandera_spark.operators.dedup import (
        banded_minhash_frame,
        incremental_minhash_candidates,
        minhash_lsh_candidates,
        write_minhash_index,
    )

    base = "the quick brown fox jumps over the lazy dog wow"
    rows = [
        (1, base), (2, base),                       # old dup pair
        (3, "completely different old content here friend"),
        (10, base + " extra"),                      # new, near-dups 1/2
        (11, base + " extra"),                      # new, dups 10
        (12, "fresh unrelated new words entirely again today"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kw = dict(num_hashes=32, bands=8, shingle_n=2, portable=True)
    old = df.filter(F.col("doc_id") < 10)
    new = df.filter(F.col("doc_id") >= 10)

    full = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(df, "doc_id", "text", **kw).collect()
    }
    want = {(a, b) for a, b in full if a >= 10 or b >= 10}
    assert (10, 11) in want  # sanity: new-vs-new dup present

    idx = banded_minhash_frame(old, "doc_id", "text", **kw)
    got = {
        (r.id_a, r.id_b)
        for r in incremental_minhash_candidates(
            new, idx, "doc_id", "text", **kw
        ).collect()
    }
    assert got == want

    path = str(tmp_path / "sigidx")
    write_minhash_index(old, "doc_id", "text", path, **kw)
    got2 = {
        (r.id_a, r.id_b)
        for r in incremental_minhash_candidates(
            new, path, "doc_id", "text", **kw
        ).collect()
    }
    assert got2 == want


def test_corpus_card_metrics(spark):
    from pandera_spark.operators.text import corpus_card

    rows = [
        (1, "the quick brown fox jumps over something", "en", "s1", 41),
        (2, "the quick brown fox jumps over something", "en", "s1", 41),
        (3, "der schnelle braune fuchs springt nicht da", "de", "s2", 42),
        (4, "une phrase pour les tests et la France", "fr", "s2", 38),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    card = {r.metric: r.value for r in corpus_card(df).collect()}
    assert card["n_docs"] == 4.0
    assert card["n_sources"] == 2.0
    assert card["exact_dup_rate"] == pytest.approx(0.25)  # 1 dup of 4
    assert card["n_langs_pred"] >= 2.0
    assert 0.0 <= card["mean_quality"] <= 1.0
    assert card["mean_tokens"] > 0
    assert "psi_halves_length" in card


def test_corpus_line_dedup_regex_special_delimiter(spark):
    from pandera_spark.operators.text import corpus_line_dedup

    rows = [(1, "a|b|common"), (2, "c|common"), (3, "common")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r.text
        for r in corpus_line_dedup(
            df, delimiter="|", max_doc_frequency=2
        ).collect()
    }
    assert out == {1: "a|b", 2: "c"}


def test_greedy_pack_rejects_string_ids(spark):
    from pandera_spark.operators.packing import chunk_pack, greedy_pack

    df = spark.createDataFrame([("a", 5)], "id string, toks bigint")
    with pytest.raises(TypeError, match="integral"):
        greedy_pack(df, "id", "toks", 10, bucket=F.lit(0))
    with pytest.raises(TypeError, match="integral"):
        chunk_pack(df, "id", "toks", 10, bucket=F.lit(0))


def test_keyword_search_ranking(spark):
    from pandera_spark.operators.text import keyword_search

    rows = [
        (1, "spark spark spark streaming"),
        (2, "spark appears once here"),
        (3, "nothing relevant at all"),
        (4, "rare unicorn word"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = keyword_search(df, ["spark", "unicorn"], k=10).collect()
    ids = [r.doc_id for r in out]
    # doc 3 matches nothing -> excluded
    assert 3 not in ids and set(ids) == {1, 2, 4}
    scores = {r.doc_id: r.score for r in out}
    # unicorn is rarer (df=1) than spark (df=2): idf higher, so doc 4's
    # single rare term outranks doc 2's single common term
    assert scores[4] > scores[2]
    # tf dominates within the same term: doc 1 >> doc 2
    assert scores[1] > scores[2]
    with pytest.raises(ValueError):
        keyword_search(df, [])


def test_keyword_search_escapes_regex_terms(spark):
    from pandera_spark.operators.text import keyword_search

    df = spark.createDataFrame(
        [(1, "a c++ mention"), (2, "plain c here")],
        "doc_id bigint, text string",
    )
    out = keyword_search(df, ["c++"], k=5).collect()
    assert [r.doc_id for r in out] == [1]


def test_strip_markup_nested_entities_not_double_decoded(spark):
    from pandera_spark.operators.text import strip_markup

    df = spark.createDataFrame([("write a &amp;lt; b",)], "t string")
    out = df.select(strip_markup(F.col("t")).alias("c")).first().c
    # the author escaped the literal string "&lt;" — it must survive
    assert out == "write a &lt; b"


def test_ks_pvalue_is_one_for_identical_distributions(spark):
    from pandera_spark.operators.drift import ks_drift

    a = spark.range(200).select((F.col("id") % 20).cast("double").alias("v"))
    row = ks_drift(a, a, "v", pvalue=True).first()
    assert row.ks_stat == pytest.approx(0.0, abs=1e-12)
    assert row.ks_pvalue == pytest.approx(1.0)


def test_incremental_minhash_reingested_doc_not_duplicated(spark):
    from pandera_spark.operators.dedup import (
        banded_minhash_frame, incremental_minhash_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog wow"
    df = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id bigint, text string"
    )
    kw = dict(num_hashes=32, bands=8, shingle_n=2, portable=True)
    # doc 2 is in the index AND re-arrives in the new batch
    idx = banded_minhash_frame(df, "doc_id", "text", **kw)
    new = df  # both docs re-ingested
    pairs = incremental_minhash_candidates(
        new, idx, "doc_id", "text", **kw
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]  # exactly once


def test_greedy_pack_null_tokens_clear_error(spark):
    from pandera_spark.operators.packing import greedy_pack

    df = spark.createDataFrame(
        [(1, 5), (2, None)], "id bigint, toks bigint"
    )
    with pytest.raises(Exception, match="non-null"):
        greedy_pack(df, "id", "toks", 10, bucket=F.lit(0)).collect()


def test_synthesize_array_max_only_and_zero_size(spark):
    from pyspark.sql import types as T

    from pandera_spark import Check, Column, DataFrameSchema
    from pandera_spark.strategies import example, synthesize

    max_only = DataFrameSchema(
        {"v": Column(T.ArrayType(T.DoubleType()),
                     checks=[Check.array_size(min_value=None, max_value=2)])},
        name="m",
    )
    assert not max_only.validate_result(
        synthesize(max_only, spark, rows=10)
    ).errors
    assert not max_only.validate_result(example(max_only, spark, 4)).errors
    zero = DataFrameSchema(
        {"v": Column(T.ArrayType(T.DoubleType()),
                     checks=[Check.array_size(0)])},
        name="z",
    )
    assert not zero.validate_result(synthesize(zero, spark, rows=5)).errors


def test_yaml_roundtrip_equal_to_true_boolean(spark):
    """Regression: the statistic-less marker must not collide with
    builtin checks whose single statistic is the boolean True."""
    from pyspark.sql import types as T

    import pandera_spark as ps
    from pandera_spark import Check, Column, DataFrameSchema

    schema = DataFrameSchema(
        {"b": Column(T.BooleanType(), checks=[Check.equal_to(True)])},
        name="bools",
    )
    back = ps.schema_from_yaml(ps.schema_to_yaml(schema))
    df = spark.createDataFrame([(True,), (False,)], "b boolean")
    res = back.validate_result(df)
    [err] = res.errors
    assert err.failure_cases_count == 1


def test_field_flag_form_for_statless_array_checks(spark):
    from pyspark.sql import types as T

    from pandera_spark import DataFrameModel, Field

    class M(DataFrameModel):
        v: T.ArrayType(T.DoubleType()) = Field(
            array_no_nulls=True, array_finite=True
        )

    df = spark.createDataFrame(
        [([1.0, None],), ([1.0, 2.0],)], "v array<double>"
    )
    res = M.validate_result(df)
    bad = [o for o in res.outcomes if not o.passed]
    assert {o.check for o in bad} == {"array_no_nulls", "array_finite"}


def test_streaming_category_drift_sees_novel_category(spark, tmp_path):
    """A category absent from the baseline must raise the statistic,
    not silently disappear (review regression)."""
    import json

    from pandera_spark.streaming.stateful import streaming_category_drift

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"ts": f"2024-01-01 00:00:{i + 1:02d}", "cat": "x" if i < 30 else "z"}
        for i in range(50)
    ]
    rows.append({"ts": "2024-01-01 00:10:00", "cat": "x"})
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts string, cat string").json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    base = spark.createDataFrame(
        [("x", 30), ("y", 30)], "cat string, n_base long"
    )
    got = []
    q = (
        streaming_category_drift(
            stream, base, "cat", ts_col="ts",
            window="1 minute", watermark="1 second",
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = [r for r in got if r.window_start.minute == 0][0]
    # all 50 observed rows counted (novel 'z' included), and the
    # category union covers x, z (novel) AND y (baseline-only)
    assert row.n_obs == 50
    assert row.n_categories == 3
    assert row.chi2_stat > 10.0
    assert row.js_divergence > 0.05


# --- bloom membership index -------------------------------------------------


def test_bloom_parameters_and_validation():
    from pandera_spark.operators.bloom import bloom_parameters

    m, k = bloom_parameters(1000, 0.01)
    assert m % 32 == 0 and m >= 9000  # ~9.6 bits/item at 1%
    assert 1 <= k <= 16
    with pytest.raises(ValueError):
        bloom_parameters(0)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_bloom_no_false_negatives_dense_sparse_parity(spark):
    from pandera_spark.operators.bloom import (
        bloom_build, bloom_contains, bloom_contains_sparse, bloom_dense,
        bloom_parameters,
    )

    df = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(400)], "id long, text string"
    )
    m, k = bloom_parameters(300, 0.01)
    idx = df.filter(F.col("id") % 2 == 0)
    words = bloom_build(idx, "text", m, k)
    dense = bloom_dense(words, m)
    got = {
        r.id: r.might_contain
        for r in bloom_contains(df, "text", dense, m, k).collect()
    }
    members = {r.id for r in idx.collect()}
    # no false negatives, ever
    assert all(got[i] for i in members)
    # false positives bounded well above the design rate
    fps = sum(1 for i in got if i not in members and got[i])
    assert fps <= 20
    # the shuffle-join probe path agrees bit-for-bit with the broadcast path
    sparse = {
        r.id: r.might_contain
        for r in bloom_contains_sparse(df, "text", "id", words, m, k).collect()
    }
    assert sparse == got


def test_bloom_merge_equals_full_build(spark):
    from pandera_spark.operators.bloom import bloom_build, bloom_merge

    df = spark.createDataFrame(
        [(i, f"item {i}") for i in range(100)], "id long, text string"
    )
    full = bloom_build(df, "text", 1024, 4)
    merged = bloom_merge(
        bloom_build(df.filter("id < 50"), "text", 1024, 4),
        bloom_build(df.filter("id >= 50"), "text", 1024, 4),
    )
    a = {(r.word_idx, r.word) for r in full.collect()}
    b = {(r.word_idx, r.word) for r in merged.collect()}
    assert a == b


def test_bloom_null_probes_false(spark):
    from pandera_spark.operators.bloom import (
        bloom_build, bloom_contains, bloom_dense,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, None)], "id long, text string"
    )
    dense = bloom_dense(bloom_build(df, "text", 256, 3), 256)
    got = {r.id: r.might_contain for r in
           bloom_contains(df, "text", dense, 256, 3).collect()}
    assert got == {1: True, 2: False}


# --- training-export sharding -----------------------------------------------


def test_shard_assign_deterministic_balanced(spark):
    from pandera_spark.operators.sharding import shard_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = shard_assign(df, "id", 8)
    counts = {r.shard: r.c for r in
              out.groupBy("shard").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * min(counts.values())
    # re-run -> identical assignment (pure function of the key)
    again = shard_assign(df, "id", 8)
    assert out.collect() == again.collect()
    with pytest.raises(ValueError):
        shard_assign(df, "id", 0)


def test_balanced_shards_cost_spread(spark):
    """Snake dealing bounds the shard-total spread by one max-cost row;
    hash sharding on the same skewed costs does not."""
    from pandera_spark.operators.sharding import balanced_shards

    # skewed costs: doc i costs i+1 tokens (triangular distribution)
    rows = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, cost long")
    out = balanced_shards(df, "cost", 8)
    totals = {r.shard: r.s for r in
              out.groupBy("shard").agg(F.sum("cost").alias("s")).collect()}
    assert set(totals) == set(range(8))
    assert max(totals.values()) - min(totals.values()) <= 200  # one max row
    # every input row keeps exactly one assignment; columns preserved
    assert out.count() == 200 and set(out.columns) == {
        "doc_id", "cost", "shard"}
    # deterministic replay
    again = {(r.doc_id, r.shard) for r in
             balanced_shards(df, "cost", 8).collect()}
    assert again == {(r.doc_id, r.shard) for r in out.collect()}
    with pytest.raises(ValueError):
        balanced_shards(df, "cost", 0)


def test_edit_distance_pairs_verify(spark):
    """Candidate pairs verify by normalized Levenshtein: a one-edit
    variant passes, an unrelated text fails, and the threshold form's
    -1 early-exit never leaks through."""
    from pandera_spark.operators.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, base),
        (2, base.replace("quick", "quack", 1)),     # one substitution
        (3, "completely different content with other words " * 3),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    got = {(r.id_a, r.id_b): (r.edit_distance, r.norm_distance)
           for r in edit_distance_pairs(
               docs, "doc_id", "text", candidates=cand,
               max_norm_distance=0.2).collect()}
    assert set(got) == {(1, 2)}
    d, nd = got[(1, 2)]
    assert d == 1 and 0 < nd < 0.05
    # zero-length pair: norm distance 0, never a divide error
    empt = spark.createDataFrame(
        [(1, ""), (2, "")], "doc_id long, text string")
    out = edit_distance_pairs(
        empt, "doc_id", "text",
        candidates=spark.createDataFrame([(1, 2)], "id_a long, id_b long"),
    ).collect()
    assert len(out) == 1 and out[0].norm_distance == 0.0
    with pytest.raises(ValueError):
        edit_distance_pairs(docs, "doc_id", "text",
                            candidates=cand, max_norm_distance=2.0)


def test_epoch_sort_keys_independent(spark):
    from pandera_spark.operators.sharding import epoch_sort_key

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    e1 = {r.id: r.sort_key for r in epoch_sort_key(df, "id", 1).collect()}
    e2 = {r.id: r.sort_key for r in epoch_sort_key(df, "id", 2).collect()}
    # different epochs give a genuinely different permutation
    order1 = sorted(e1, key=lambda i: (e1[i], i))
    order2 = sorted(e2, key=lambda i: (e2[i], i))
    assert order1 != order2
    # but each epoch is reproducible
    again = {r.id: r.sort_key for r in epoch_sort_key(df, "id", 1).collect()}
    assert again == e1


def test_interleave_positions_contiguous(spark):
    from pandera_spark.operators.sharding import interleave_positions

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    out = interleave_positions(df, "id", 4, epoch=3).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append((r.pos, r.sort_key, r.id))
    for shard, rows in by_shard.items():
        rows.sort()
        # positions are 1..n contiguous and follow (sort_key, id) order
        assert [p for p, _, _ in rows] == list(range(1, len(rows) + 1))
        assert rows == sorted(rows, key=lambda t: (t[1], t[2]))


def test_write_shards_layout_and_order(spark, tmp_path):
    from pandera_spark.operators.sharding import shard_assign, write_shards

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "id long, text string"
    )
    path = str(tmp_path / "shards")
    write_shards(df, path, "id", 4, epoch=1)
    back = spark.read.parquet(path)
    assert back.count() == 200
    # the on-disk shard column equals the pure-function assignment
    expect = {r.id: r.shard for r in shard_assign(df, "id", 4).collect()}
    got = {r.id: int(r.shard) for r in back.collect()}
    assert got == expect
    # each shard directory's rows are sorted by the epoch key within files
    import glob

    for d in sorted(glob.glob(f"{path}/shard=*")):
        pdf = spark.read.parquet(d).toPandas()
        assert list(pdf["sort_key"]) == sorted(pdf["sort_key"])


# --- row-level error annotation ---------------------------------------------


def test_annotate_errors_reconciles_with_report(spark):
    schema = DataFrameSchema(
        {
            "a": Column(T.LongType(), Check.gt(0), nullable=False),
            "b": Column(T.StringType(), Check.isin(["x", "y"])),
        },
        checks=Check(
            lambda df: F.col("a") < 100, error="a_lt_100", name="a_lt_100"
        ),
        name="ann",
    )
    df = spark.createDataFrame(
        [(1, "x"), (-5, "z"), (None, "x"), (200, "y")],
        T.StructType([
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]),
    )
    ann = schema.annotate(df)
    rows = ann.collect()
    tags = {tuple(sorted(r.failed_checks)) for r in rows}
    assert ("a:gt(0)" in t or "a:not_nullable" in t or not t
            for t in tags)
    # per-row expectations
    by_a = {r.a: sorted(r.failed_checks) for r in rows}
    assert by_a[1] == []
    assert by_a[-5] == sorted(["a:gt(0)", "b:isin(['x', 'y'])"]) or \
        len(by_a[-5]) == 2
    assert by_a[None] == ["a:not_nullable"]
    assert any("a_lt_100" in t for t in by_a[200])
    # tag counts reconcile with the aggregated report
    res = schema.validate_result(df)
    from collections import Counter

    c = Counter(t for r in rows for t in r.failed_checks)
    for o in res.outcomes:
        key = f"{o.column if o.column is not None else '<df>'}:{o.check}"
        if key in c:
            assert c[key] == o.violations, key


def test_annotate_errors_clean_schema_empty_arrays(spark):
    schema = DataFrameSchema({"a": Column(T.LongType())}, name="clean")
    df = spark.createDataFrame([(1,), (2,)], "a long")
    out = schema.annotate(df)
    assert all(r.failed_checks == [] for r in out.collect())


# --- corpus kNN graph -------------------------------------------------------


def test_knn_graph_finds_twin_vectors(spark):
    from pandera_spark.operators.similarity import knn_graph

    import random as _r

    rng = _r.Random(7)
    rows = []
    # 20 well-separated base vectors, each with an almost-identical twin
    for i in range(20):
        base = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x + 0.001) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    edges = knn_graph(
        df, k=2, dim=16, n_planes=16, bands=8, corpus_storage=None
    )
    top1 = {r.src: r.dst for r in edges.filter("rank = 1").collect()}
    twins_found = sum(1 for s, d in top1.items() if d == s ^ 1)
    # twins share signatures (identical sign bits) so virtually all match
    assert twins_found >= 36


def test_knn_band_plan_sizing():
    """Band width follows ceil(log2(n / target_bucket)), capped so the
    packed signature stays in a signed long."""
    from pandera_spark.operators.similarity import knn_band_plan

    # the contract corpus: 5,000 docs, default bucket 64 -> 7-bit bands
    assert knn_band_plan(5_000) == (28, 4)
    assert knn_band_plan(500) == (12, 4)          # small corpus: 3 bits
    assert knn_band_plan(50_000) == (40, 4)       # 10x data: +3-4 bits
    assert knn_band_plan(10) == (4, 4)            # floor: 1-bit bands
    # 100M rows: rule wants 21 bits but the cap bounds total planes
    n_planes, bands = knn_band_plan(100_000_000)
    assert n_planes <= 56 and n_planes % bands == 0
    # bucket target scales the width down
    assert knn_band_plan(5_000, target_bucket=1024)[0] < 28
    with pytest.raises(ValueError):
        knn_band_plan(0)


def test_neardup_band_plan_recall_vs_volume():
    """Threshold sizing keeps the any-band match probability for a
    threshold-grade pair >= recall while the bucket rule bounds volume."""
    import math

    from pandera_spark.operators.similarity import neardup_band_plan

    def any_band_recall(threshold, width, bands):
        p1 = 1.0 - math.acos(threshold) / math.pi
        return 1.0 - (1.0 - p1 ** width) ** bands

    for n, thr in [(5_000, 0.9), (50_000, 0.9), (500_000, 0.95)]:
        n_planes, bands = neardup_band_plan(n, thr, recall=0.9)
        width = n_planes // bands
        p1 = 1.0 - math.acos(thr) / math.pi
        required = math.ceil(math.log(0.1) / math.log(1.0 - p1 ** width))
        if required * width <= 56:  # cap not binding -> recall holds
            assert any_band_recall(thr, width, bands) >= 0.9, (n, thr)
        else:  # cap binds: bands degrade gracefully, never exceed cap
            assert bands == 56 // width, (n, thr)
        assert n_planes <= 56 and n_planes % bands == 0
    # scale-up widens bands but adds bands to hold recall
    p5k = neardup_band_plan(5_000, 0.9)
    p50k = neardup_band_plan(50_000, 0.9)
    assert p50k[0] // p50k[1] > p5k[0] // p5k[1]   # wider bands
    with pytest.raises(ValueError):
        neardup_band_plan(0, 0.9)
    with pytest.raises(ValueError):
        neardup_band_plan(10, 1.5)


def test_mutual_knn_pairs(spark):
    from pandera_spark.operators.similarity import knn_graph, mutual_knn

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.1]),
            (2, [1.0, 0.01, 0.0, 0.1]),
            (3, [0.0, 1.0, 0.1, 0.0]),
            (4, [0.0, 1.0, 0.11, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    edges = knn_graph(df, k=1, dim=4, n_planes=8, bands=8,
                      corpus_storage=None)
    pairs = {(r.id_a, r.id_b) for r in mutual_knn(edges).collect()}
    assert pairs == {(1, 2), (3, 4)}


# --- document chunking ------------------------------------------------------


def test_chunk_text_char_layout(spark):
    from pandera_spark.operators.chunking import chunk_text

    text = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
    df = spark.createDataFrame([(1, text), (2, None), (3, "")],
                               "doc_id long, text string")
    out = chunk_text(df, "doc_id", "text", size=10, overlap=4)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    # step=6 -> chunks at 0,6,12,18: ceil((26-10)/6)+1 = 4
    assert [r.doc_id for r in rows] == [1, 1, 1, 1]
    assert [r.chunk for r in rows] == [
        text[0:10], text[6:16], text[12:22], text[18:26]
    ]
    assert all(r.n_chunks == 4 for r in rows)
    # overlap really overlaps
    assert rows[0].chunk[-4:] == rows[1].chunk[:4]
    # short doc -> one chunk, empty/null -> none
    short = chunk_text(
        spark.createDataFrame([(9, "hi")], "doc_id long, text string"),
        "doc_id", "text", size=10, overlap=4,
    ).collect()
    assert len(short) == 1 and short[0].chunk == "hi"


def test_chunk_text_tokens_and_validation(spark):
    from pandera_spark.operators.chunking import chunk_text

    df = spark.createDataFrame(
        [(1, "t0  t1 t2\tt3\nt4 t5 t6")], "doc_id long, text string"
    )
    out = chunk_text(df, "doc_id", "text", size=4, overlap=1, unit="tokens")
    rows = sorted(out.collect(), key=lambda r: r.chunk_idx)
    # 7 tokens, step=3 -> chunks at 0,3: ceil((7-4)/3)+1 = 2
    assert [r.chunk for r in rows] == ["t0 t1 t2 t3", "t3 t4 t5 t6"]
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", size=0, overlap=0)
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", unit="bytes")


def test_chunk_stats(spark):
    from pandera_spark.operators.chunking import chunk_stats

    df = spark.createDataFrame(
        [(1, "a" * 26), (2, "b" * 5)], "doc_id long, text string"
    )
    row = chunk_stats(df, "doc_id", "text", size=10, overlap=4).first()
    assert row.n_docs == 2 and row.n_chunks == 5
    assert row.min_len == 5 and row.max_len == 10


# --- hashed linear scorer ---------------------------------------------------


def test_hashed_linear_score_deterministic_bounded(spark):
    from pandera_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame(
        [(1, "spark engines process data"), (2, "spark engines process data"),
         (3, "completely different words here now"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.model_score
           for r in hashed_linear_score(df, "text").collect()}
    assert out[1] == out[2]                      # pure function of text
    assert out[1] != out[3]
    assert 0.0 < out[1] < 1.0
    assert out[4] is None and out[5] is None     # empty/null -> null
    with pytest.raises(ValueError):
        hashed_linear_score(df, "text", n_buckets=0)


def test_hashed_linear_score_bias_shifts(spark):
    from pandera_spark.operators.text import hashed_linear_score

    df = spark.createDataFrame([(1, "one two three")],
                               "doc_id long, text string")
    lo = hashed_linear_score(df, "text", bias=-2.0).first().model_score
    hi = hashed_linear_score(df, "text", bias=2.0).first().model_score
    assert lo < hi


# --- streaming bloom novelty ------------------------------------------------


def test_streaming_bloom_novelty_cross_batch(spark, tmp_path):
    """Two micro-batches: content repeated from batch 1 is flagged in
    batch 2; the appended index equals a one-shot build over the union;
    a replayed batch (at-least-once retry) leaves the index unchanged."""
    import json

    from pandera_spark.operators.bloom import bloom_build
    from pandera_spark.streaming.novelty import (
        bloom_novelty_foreach_batch, compact_bloom_index,
    )

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        json.dumps({"id": i, "text": t})
        for i, t in [(1, "alpha"), (2, "beta")]
    ))
    (src / "b.json").write_text("\n".join(
        json.dumps({"id": i, "text": t})
        for i, t in [(3, "beta"), (4, "gamma")]
    ))
    idx = str(tmp_path / "bloom_index")
    got: dict[int, list] = {}
    fn = bloom_novelty_foreach_batch(
        "text", idx, 1024, 4,
        lambda df, bid: got.setdefault(bid, []).extend(df.collect()),
    )
    stream = spark.readStream.schema("id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(got) == {0, 1}
    flags = {r.id: r.seen_before for b in got.values() for r in b}
    assert flags[1] is False and flags[2] is False   # first batch: no index
    assert flags[3] is True                           # 'beta' seen in batch 1
    assert flags[4] is False                          # 'gamma' genuinely new
    # folded index == one-shot build over everything that flowed through
    all_docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "beta"), (4, "gamma")],
        "id long, text string",
    )
    expect = {(r.word_idx, r.word)
              for r in bloom_build(all_docs, "text", 1024, 4).collect()}
    folded = {(r.word_idx, r.word)
              for r in spark.read.parquet(idx).groupBy("word_idx")
              .agg(F.bit_or("word").alias("word")).collect()}
    assert folded == expect
    # idempotent retry: re-process batch 0, index fold unchanged
    fn(spark.createDataFrame([(1, "alpha"), (2, "beta")],
                             "id long, text string"), 0)
    refolded = {(r.word_idx, r.word)
                for r in spark.read.parquet(idx).groupBy("word_idx")
                .agg(F.bit_or("word").alias("word")).collect()}
    assert refolded == expect
    # compaction preserves the filter and bounds the file to one segment
    n = compact_bloom_index(spark, idx)
    assert n == len(expect)
    compacted = {(r.word_idx, r.word)
                 for r in spark.read.parquet(idx).collect()}
    assert compacted == expect


def test_streaming_minhash_novelty_cross_batch(spark, tmp_path):
    """Near-dup novelty across micro-batches: a near-duplicate of a
    batch-1 document is flagged in batch 2; unrelated text is not; a
    replayed batch (at-least-once retry) produces identical flags; and
    compaction drops the duplicate signature rows the retry appended."""
    import json

    from pandera_spark.streaming.novelty import (
        compact_minhash_index, minhash_novelty_foreach_batch,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    near = base.replace("lazy", "sleepy")
    other = ("completely unrelated content about databases and "
             "distributed query engines with many different words")
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": t})
        for i, t in [(1, base), (2, other)]
    ))
    (src / "b.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": t})
        for i, t in [(3, near), (4, "something else entirely different "
                                    "with zero overlap at all")]
    ))
    idx = str(tmp_path / "sig_index")
    got: dict[int, list] = {}
    fn = minhash_novelty_foreach_batch(
        "doc_id", "text", idx,
        lambda df, bid: got.setdefault(bid, []).extend(df.collect()),
        num_hashes=32, bands=8,
    )
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flags = {r.doc_id: r.near_dup for b in got.values() for r in b}
    assert flags[1] is False and flags[2] is False    # batch 1: all new
    assert flags[3] is True                           # near-dup of doc 1
    assert flags[4] is False
    # at-least-once replay of batch 2: identical flags (the candidate
    # join drops the batch's own earlier index append)
    replay: list = []
    fn2 = minhash_novelty_foreach_batch(
        "doc_id", "text", idx,
        lambda df, bid: replay.extend(df.collect()),
        num_hashes=32, bands=8,
    )
    b2 = spark.createDataFrame(
        [(3, near), (4, "something else entirely different with zero "
                        "overlap at all")],
        "doc_id long, text string",
    )
    fn2(b2, 1)
    assert {r.doc_id: r.near_dup for r in replay} == {3: True, 4: False}
    # compaction: distinct signature rows, duplicates from the replay gone
    n = compact_minhash_index(spark, idx)
    deduped = spark.read.parquet(idx)
    assert deduped.count() == n == deduped.distinct().count()


def test_compact_bloom_index_concurrent_append_survives(spark, tmp_path):
    """A segment appended by a concurrent foreachBatch between the
    compactor's file-capture and its delete must survive: compaction
    appends its fold FIRST and deletes only the files it actually read,
    never the whole directory.  The race is injected deterministically
    by patching DataFrame.inputFiles so the concurrent append lands the
    instant the compactor has captured its input file list."""
    import unittest.mock as mock

    from pandera_spark.operators.bloom import bloom_build
    from pandera_spark.streaming import novelty as nov

    idx = str(tmp_path / "bloom_index")
    d1 = spark.createDataFrame([(1, "alpha")], "id long, text string")
    d2 = spark.createDataFrame([(2, "beta")], "id long, text string")
    bloom_build(d1, "text", 1024, 4).write.mode("append").parquet(idx)

    # patch the CONCRETE DataFrame class (pyspark 4 classic subclass
    # overrides inputFiles, so patching the abstract base misses)
    df_cls = type(spark.read.parquet(idx))
    real_input_files = df_cls.inputFiles
    state = {"injected": False}

    def racy_input_files(self):
        files = real_input_files(self)
        if not state["injected"]:
            state["injected"] = True
            bloom_build(d2, "text", 1024, 4).write.mode("append").parquet(idx)
        return files

    with mock.patch.object(df_cls, "inputFiles", racy_input_files):
        n = nov.compact_bloom_index(spark, idx)
    assert state["injected"] and n > 0
    # the concurrently-appended d2 segment must still be in the index
    both = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, text string"
    )
    expect = {(r.word_idx, r.word)
              for r in bloom_build(both, "text", 1024, 4).collect()}
    got = {(r.word_idx, r.word)
           for r in spark.read.parquet(idx).groupBy("word_idx")
           .agg(F.bit_or("word").alias("word")).collect()}
    assert got == expect
    # a second (quiet) compaction folds everything down to one segment
    nov.compact_bloom_index(spark, idx)
    flat = {(r.word_idx, r.word)
            for r in spark.read.parquet(idx).collect()}
    assert flat == expect


# --- winsorization + entropy ------------------------------------------------


def test_winsorize_clips_tails(spark):
    from pandera_spark.operators.numeric import winsorize, winsorize_report

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)] + [(None,)], "v double"
    )
    out = winsorize(df, ["v"], lower=0.10, upper=0.90, exact=True)
    vals = [r.v for r in out.collect() if r.v is not None]
    # exact path: p10 of 1..100 = 10.9, p90 = 90.1 (linear interpolation)
    assert min(vals) == pytest.approx(10.9)
    assert max(vals) == pytest.approx(90.1)
    assert len(vals) == 100
    assert out.filter(F.col("v").isNull()).count() == 1  # nulls untouched
    rep = winsorize_report(df, ["v"], lower=0.10, upper=0.90,
                           exact=True).first()
    assert rep.n_below == 10 and rep.n_above == 10
    assert rep.lo == pytest.approx(10.9) and rep.hi == pytest.approx(90.1)
    with pytest.raises(ValueError):
        winsorize(df, ["v"], lower=0.9, upper=0.1)


def test_winsorize_approx_mode(spark):
    from pandera_spark.operators.numeric import winsorize_report

    df = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    rep = winsorize_report(df, ["v"], lower=0.05, upper=0.95).first()
    # the default is the sketch; bounds are near-exact on a uniform ramp
    assert rep.lo == pytest.approx(50.0, abs=5)
    assert rep.hi == pytest.approx(950.0, abs=5)
    # the pre-r5 approx= keyword survives as a deprecated alias
    with pytest.warns(DeprecationWarning):
        rep2 = winsorize_report(df, ["v"], lower=0.05, upper=0.95,
                                approx=True).first()
    assert rep2.lo == rep.lo and rep2.hi == rep.hi
    with pytest.warns(DeprecationWarning):
        rep3 = winsorize_report(df, ["v"], lower=0.05, upper=0.95,
                                approx=False).first()
    assert rep3.lo == pytest.approx(49.95) and rep3.hi == pytest.approx(949.05)


def test_column_entropy_known_values(spark):
    import math

    from pandera_spark.operators.drift import column_entropy

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
         ("a", "x"), ("a", None)],
        "u string, w string",
    )
    out = {r.col_name: r for r in column_entropy(df, ["u", "w"]).collect()}
    # u: a=4, b=2 over 6
    pu = [4 / 6, 2 / 6]
    assert out["u"].entropy == pytest.approx(
        -sum(p * math.log(p) for p in pu)
    )
    assert out["u"].n_values == 6 and out["u"].n_distinct == 2
    # w: nulls excluded -> x=3, y=2 over 5
    pw = [3 / 5, 2 / 5]
    assert out["w"].entropy == pytest.approx(
        -sum(p * math.log(p) for p in pw)
    )
    assert out["w"].n_values == 5
    # constant column -> entropy 0
    const = column_entropy(
        spark.createDataFrame([("k",)] * 5, "u string"), ["u"]
    ).first()
    assert const.entropy == pytest.approx(0.0)
    with pytest.raises(ValueError):
        column_entropy(df, [])


# --- star report + corpus diff ----------------------------------------------


def test_star_report_counts_and_validation(spark):
    from pandera_spark.operators.relational import star_report

    orders = spark.createDataFrame([(1,), (2,)], "o_id long")
    items = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (9, 13), (None, 14)],
        "o_id long, item long",
    )
    users = spark.createDataFrame([(10,), (12,)], "u_id long")
    rep = star_report(
        {"items": items, "orders": orders, "users": users},
        [("items", "o_id", "orders", "o_id"),
         ("items", "item", "users", "u_id")],
    )
    got = {(r.fact, r.fk_cols, r.dim): r.violations for r in rep.collect()}
    assert got[("items", "o_id", "orders")] == 1      # o_id=9; null exempt
    assert got[("items", "item", "users")] == 3       # 11,13,14
    with pytest.raises(ValueError):
        star_report({"a": items}, [])
    with pytest.raises(KeyError):
        star_report({"a": items}, [("a", "o_id", "missing", "x")])


def test_corpus_diff_categories(spark):
    from pandera_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "x")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id long, text string"
    )
    row = corpus_diff(old, new, "id", "text").first()
    assert (row.n_old, row.n_new) == (3, 3)           # null key excluded
    assert row.added == 1 and row.removed == 1
    assert row.changed == 1 and row.unchanged == 1


# --- correlation matrix + inverted index ------------------------------------


def test_correlation_matrix_known_values(spark):
    from pandera_spark.operators.numeric import correlation_matrix

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i), 1.0) for i in range(1, 21)],
        "a double, b double, c double, d double",
    )
    # d is constant -> corr undefined (null)
    got = {(r.col_a, r.col_b): r.corr
           for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert got[("a", "b")] == pytest.approx(1.0)
    assert got[("a", "c")] == pytest.approx(-1.0)
    assert got[("a", "d")] is None
    assert len(got) == 6
    with pytest.raises(ValueError):
        correlation_matrix(df, ["a"])


def test_term_index_and_search(spark):
    from pandera_spark.operators.text import (
        build_term_index, index_search, term_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "Spark spark SPARK engine"),
            (2, "spark data data"),
            (3, "unrelated words only"),
        ],
        "doc_id long, text string",
    )
    idx = build_term_index(df, "doc_id", "text")
    post = {(r.term, r.id): r.tf for r in idx.collect()}
    assert post[("spark", 1)] == 3          # case-folded
    assert post[("spark", 2)] == 1
    assert ("only", 3) in post and ("a", 1) not in post  # min_token_len
    stats = {r.term: (r.n_docs, r.total_tf)
             for r in term_stats(idx, ["spark", "data"]).collect()}
    assert stats["spark"] == (2, 4) and stats["data"] == (1, 2)
    hits = index_search(idx, 3, ["spark"], k=2).collect()
    assert [r.id for r in hits] == [1, 2]   # tf order
    assert hits[0].score > hits[1].score
    with pytest.raises(ValueError):
        index_search(idx, 3, [])


def test_psi_timeline_detects_shifted_day(spark):
    """Two days matching the pooled mix -> tiny PSI; one skewed day ->
    large PSI.  Periods with zero rows in a baseline bin still get the
    eps-floored contribution (exact PSI, grid join)."""
    import datetime as dt

    from pandera_spark.operators.drift import psi_timeline

    rows = []
    # day 1 + day 2: uniform over bins; day 3: all mass in one bin
    for d in (1, 2):
        for i in range(60):
            rows.append((dt.datetime(2024, 1, d, 3 + i % 12), float(i % 100)))
    for i in range(60):
        rows.append((dt.datetime(2024, 1, 3, 4), 5.0))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.period.day: r for r in psi_timeline(
        df, "ts", "value", [25.0, 50.0, 75.0]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_rows == 60
    # the pooled baseline contains the skewed day, so the clean days sit
    # at a moderate, EQUAL offset; the skewed day stands far out
    assert out[1].psi == pytest.approx(out[2].psi)
    assert out[3].psi > 5 * out[1].psi
    assert out[3].psi > 1.0


def test_funnel_greedy_ordering(spark):
    import datetime as dt

    from pandera_spark.operators.temporal import funnel

    T0 = dt.datetime(2024, 1, 1)

    def ev(u, t, m):
        return (u, T0 + dt.timedelta(minutes=m), t)

    rows = [
        # u1 converts fully in order
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "buy", 10),
        # u2 clicks BEFORE viewing -> click doesn't count, no buy path
        ev(2, "click", 0), ev(2, "view", 5), ev(2, "buy", 10),
        # wait: u2's buy at 10 > view at 5 but there is no click after
        # view -> u2 must NOT convert step 2 or 3
        # u3 views only
        ev(3, "view", 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r.step: r.n_users
           for r in funnel(df, "user_id", "event_type", "ts",
                           ["view", "click", "buy"]).collect()}
    assert out == {1: 3, 2: 1, 3: 1}
    with pytest.raises(ValueError):
        funnel(df, "user_id", "event_type", "ts", [])


def test_retention_triangle(spark):
    import datetime as dt

    from pandera_spark.operators.temporal import retention

    D = dt.datetime
    rows = [
        (1, D(2024, 1, 1, 9)), (1, D(2024, 1, 2, 10)), (1, D(2024, 1, 2, 20)),
        (2, D(2024, 1, 1, 5)), (2, D(2024, 1, 4, 5)),
        (3, D(2024, 1, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort.day, r.day_offset): r.n_users
           for r in retention(df, "user_id", "ts", max_offset=7).collect()}
    assert out[(1, 0)] == 2        # u1, u2 cohort Jan 1
    assert out[(1, 1)] == 1        # u1 back on day 2 (two events, one count)
    assert out[(1, 3)] == 1        # u2 back on day 4
    assert out[(2, 0)] == 1        # u3 cohort Jan 2
    assert (2, 1) not in out


def test_distribution_match_converges_to_reference(spark):
    """A corpus skewed 90/10 across two bins matched to a 50/50
    reference: the over-represented bin thins to roughly the
    under-represented bin's size; membership is deterministic."""
    from pandera_spark.operators.curation import distribution_match

    rows = [(i, 10.0 if i < 900 else 90.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    ref = spark.createDataFrame(
        [(i, 10.0) for i in range(50)] + [(i, 90.0) for i in range(50)],
        "id long, v double",
    )
    out = distribution_match(df, ref, "v", [50.0], key_col="id")
    got = out.collect()
    lo = sum(1 for r in got if r.v < 50)
    hi = sum(1 for r in got if r.v >= 50)
    assert hi == 100                    # under-represented bin kept whole
    # over-represented bin thins to ~ its matched share (rate=1/9 of 900)
    assert 70 <= lo <= 130
    # deterministic re-run
    again = {r.id for r in distribution_match(
        df, ref, "v", [50.0], key_col="id").collect()}
    assert again == {r.id for r in got}
    # bins absent from the reference are dropped entirely
    ref_lo_only = spark.createDataFrame(
        [(i, 10.0) for i in range(50)], "id long, v double"
    )
    only_lo = distribution_match(df, ref_lo_only, "v", [50.0],
                                 key_col="id").collect()
    assert all(r.v < 50 for r in only_lo)


def test_skew_report_hot_key(spark):
    from pandera_spark.operators.skew import skew_report

    rows = [("hot", i % 7) for i in range(90)] + [
        ("cold%d" % i, None) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, g long")
    out = {r.col_name: r for r in skew_report(df, ["k", "g"]).collect()}
    assert out["k"].top_key == "hot" and out["k"].top_count == 90
    assert out["k"].top_share == pytest.approx(0.9)
    assert out["k"].n_distinct == 11
    # nulls count as a key (they co-partition too)
    assert out["g"].n_values == 100 and out["g"].n_distinct == 8
    with pytest.raises(ValueError):
        skew_report(df, [])


def test_zorder_key_locality_and_layout(spark):
    from pandera_spark.operators.sharding import zorder_key

    rows = [(i, float(x), float(y))
            for i, (x, y) in enumerate((x, y)
            for x in range(16) for y in range(16))]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {(int(r.x), int(r.y)): r.zkey
           for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    # corners of the grid map to the morton extremes
    assert out[(0, 0)] == 0
    assert out[(15, 15)] == 255
    # interleave: x contributes even bits, y odd bits
    assert out[(15, 0)] == 0b01010101
    assert out[(0, 15)] == 0b10101010
    # locality: neighbors in (x, y) are near in zkey on average vs random
    import statistics

    deltas = [abs(out[(x, y)] - out[(x + 1, y)])
              for x in range(15) for y in range(16)]
    assert statistics.median(deltas) <= 16
    with pytest.raises(ValueError):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_projection_only_operators_plan_no_exchange(spark):
    """The scan-bound claims hold in the physical plan: row annotation
    and chunking add ZERO shuffles; the bloom probe's only exchanges sit
    on the bounded filter lineage (broadcast + filter-sized groupBy),
    never on the probe rows."""
    from pandera_spark.operators.bucketing import plan_has_exchange
    from pandera_spark.operators.chunking import chunk_text
    from pandera_spark import Check, Column, DataFrameSchema
    import pyspark.sql.types as T

    df = spark.createDataFrame(
        [(1, "abcdef" * 10)], "doc_id long, text string"
    )
    assert not plan_has_exchange(
        chunk_text(df, "doc_id", "text", size=20, overlap=5)
    )
    schema = DataFrameSchema(
        {"doc_id": Column(T.LongType(), Check.gt(0), nullable=False)},
        name="p",
    )
    assert not plan_has_exchange(schema.annotate(df))


def test_event_transitions_counts(spark):
    import datetime as dt

    from pandera_spark.operators.temporal import event_transitions

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, T0, "a"), (1, 2, T0 + dt.timedelta(seconds=1), "b"),
        (1, 3, T0 + dt.timedelta(seconds=2), "a"),
        (2, 4, T0, "a"), (2, 5, T0 + dt.timedelta(seconds=1), "b"),
        (3, 6, T0, "a"),                       # lone event: no transition
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, et string"
    )
    got = {(r.from_type, r.to_type): r.n
           for r in event_transitions(df, "user_id", "et", "ts",
                                      tiebreak_cols=["event_id"]).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_join_cardinality_contract(spark):
    from pandera_spark.operators.relational import join_cardinality

    dim = spark.createDataFrame([(1,), (2,), (2,), (None,)], "k long")
    fact = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    row = join_cardinality(dim, fact, "k", expect="1:N").first()
    assert row.left_keys == 2 and row.left_dup_keys == 1
    assert row.left_null_rows == 1
    assert row.right_keys == 2 and row.right_dup_keys == 1
    assert row.ok is False                      # left not unique
    assert join_cardinality(dim, fact, "k",
                            expect="N:M").first().ok is True
    clean = spark.createDataFrame([(1,), (2,)], "k long")
    assert join_cardinality(clean, fact, "k",
                            expect="1:N").first().ok is True
    assert join_cardinality(clean, fact, "k",
                            expect="1:1").first().ok is False
    with pytest.raises(ValueError):
        join_cardinality(dim, fact, "k", expect="2:3")


def test_two_stage_search_rerank(spark):
    from pandera_spark.operators.text import build_term_index, two_stage_search

    df = spark.createDataFrame(
        [
            (1, "Spark spark spark"),          # high token tf, 1 exact "spark"x2? case-sensitive: "spark" twice
            (2, "spark spark spark spark"),    # all exact
            (3, "sparkle sparky sparks"),      # token 'sparkle' etc: no exact whole-word matches
            (4, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    idx = build_term_index(df, "doc_id", "text")
    out = two_stage_search(df, idx, 4, ["spark"], k=3, k1=10).collect()
    ids = [r.id for r in out]
    # doc 2 has the most exact whole-word matches -> top
    assert ids[0] == 2
    # doc 3's subword variants score 0 exact, doc 4 never a candidate
    by_id = {r.id: r.score for r in out}
    assert by_id.get(3, 0.0) == 0.0 or 3 not in by_id
    assert 4 not in by_id
    with pytest.raises(ValueError):
        two_stage_search(df, idx, 4, [])


def test_gopher_gate_rules(spark):
    from pandera_spark.operators.text import gopher_gate

    good = ("the cat and the dog went to the park in a big way for fun "
            "and that is all there is to say about it today really")
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "word " * 30),                # repeated word -> dup rules
            (3, "!!! ??? *** !!!"),           # punct + stopwords + words
            (4, ""),                          # empty -> several rules
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_gate(
        df, min_words=10, min_stop_hits=2,
        max_dup_word_frac=0.5, max_dup_gram_frac=0.5).collect()}
    assert out[1].keep is True and out[1].failed_rules == ""
    assert "dup_words" in out[2].failed_rules
    assert "punct_ratio" in out[3].failed_rules
    assert "stopword_hits" in out[3].failed_rules
    assert out[4].keep is False and "word_count" in out[4].failed_rules


def test_bm25_search_saturation_and_length_norm(spark):
    """BM25 vs raw TF-IDF behaviors: term-frequency saturation (20
    repeats is not 20x the score) and length normalization (same tf in
    a shorter doc ranks higher)."""
    from pandera_spark.operators.text import bm25_search, build_term_index

    rows = [
        (1, "spark " * 2 + "filler word " * 4),            # tf=2, short
        (2, "spark " * 2 + "filler word " * 40),           # tf=2, long
        (3, "spark " * 20 + "filler word " * 4),           # tf=20
        (4, "nothing relevant here at all " * 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_term_index(docs, "doc_id", "text")
    got = {r.id: r.score
           for r in bm25_search(index, 4, ["spark"], k=10).collect()}
    assert set(got) == {1, 2, 3}                  # doc 4 never matches
    assert got[1] > got[2]                        # shorter doc wins at eq tf
    assert got[3] < 10 * got[1]                   # saturation, not linear
    with pytest.raises(ValueError):
        bm25_search(index, 4, [])
    with pytest.raises(ValueError):
        bm25_search(index, 4, ["spark"], b=2.0)


def test_leakage_safe_split_clusters_together(spark):
    """Near-dup clusters never straddle splits: every member of a
    connected pair cluster gets the root's split; isolated docs match
    plain hash_split on their own id."""
    from pandera_spark.operators.curation import (
        hash_split, leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # two clusters: {0,1,2} (chained) and {10, 11}; rest isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r.doc_id: r.split
           for r in leakage_safe_split(docs, "doc_id", pairs, fr).collect()}
    assert len(out) == 40
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11]
    # isolated docs: identical to the plain hash split on their own id
    plain = {r.doc_id: r.split
             for r in hash_split(docs, "doc_id", fr).collect()}
    clustered = {0, 1, 2, 10, 11}
    for i in set(out) - clustered:
        assert out[i] == plain[i], i
    # cluster members adopt the ROOT's plain split
    assert out[0] == plain[0] and out[10] == plain[10]
    # deterministic replay
    again = {r.doc_id: r.split
             for r in leakage_safe_split(docs, "doc_id", pairs, fr).collect()}
    assert again == out


def test_bigram_lm_scoring(spark):
    """Bigram LM: in-distribution word ORDER scores higher than the
    same words scrambled (exactly what the unigram model cannot see);
    short docs get null; replay is deterministic."""
    from pandera_spark.operators.text import bigram_model, bigram_score

    ref_rows = [(i, "the cat sat on the mat and the dog ran away")
                for i in range(10)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    model = bigram_model(ref)
    m = {(r.w1, r.w2): r.n for r in model.collect()}
    assert m[("the", "cat")] == 10 and ("cat", "the") not in m
    held = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # in-distribution order
            (2, "mat the on sat cat the"),       # same words, scrambled
            (3, "single"),                       # <2 tokens -> null
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_score(held, model).collect()}
    assert got[1].avg_logprob > got[2].avg_logprob
    assert got[1].n_bigrams == 5 and got[2].n_bigrams == 5
    assert got[3].avg_logprob is None and got[3].n_bigrams is None
    again = {r.doc_id: (r.n_bigrams, round(r.avg_logprob, 9))
             for r in bigram_score(held, model).collect()
             if r.avg_logprob is not None}
    first = {k: (v.n_bigrams, round(v.avg_logprob, 9))
             for k, v in got.items() if v.avg_logprob is not None}
    assert again == first


def test_nb_classifier_train_score(spark):
    """Hashed NB classifier: clearly-separated classes predict
    correctly on held-out docs; empty docs fall back to the prior
    (majority class); train/score are deterministic replays."""
    from pandera_spark.operators.text import nb_score, nb_train

    rows = []
    for i in range(20):
        rows.append((i, "alpha beta alpha quality prose text", "good"))
    for i in range(20, 30):
        rows.append((i, "spam spam gamma delta junk junk", "bad"))
    train = spark.createDataFrame(rows, "doc_id long, text string, y string")
    model = nb_train(train, "y", "text", num_buckets=1024)
    # model shape: priors + defaults for both classes, token rows bounded
    kinds = {r.bucket for r in model.filter("bucket < 0").collect()}
    assert kinds == {-1, -2}
    held = spark.createDataFrame(
        [(100, "alpha beta prose"), (101, "spam junk gamma"), (102, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.predicted
           for r in nb_score(held, model, num_buckets=1024).collect()}
    assert got[100] == "good" and got[101] == "bad"
    assert got[102] == "good"            # empty doc -> majority prior
    # deterministic: retrain + rescore gives identical output
    again = {r.doc_id: (r.predicted, round(r.score, 9))
             for r in nb_score(held, nb_train(
                 train, "y", "text", num_buckets=1024),
                 num_buckets=1024).collect()}
    first = {r.doc_id: (r.predicted, round(r.score, 9))
             for r in nb_score(held, model, num_buckets=1024).collect()}
    assert again == first
    with pytest.raises(ValueError):
        nb_train(train, "y", "text", num_buckets=1)
    with pytest.raises(ValueError):
        nb_train(train, "y", "text", smoothing=0)


def test_lm_score_reference_affinity(spark):
    """Documents resembling the reference corpus score higher; unseen
    vocabulary scores the smoothed floor; empty docs score null."""
    from pandera_spark.operators.text import lm_score, unigram_model

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    model = unigram_model(ref)
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),       # in-distribution
            (2, "zzz qqq xxx www"),           # fully out-of-vocabulary
            (3, ""),                          # empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score(df, model).collect()}
    assert out[1].avg_logprob > out[2].avg_logprob
    assert out[3].avg_logprob is None and out[3].n_tokens is None
    # OOV floor = ln(1 / (N + V)): N=45 tokens, V=8+1
    import math

    assert out[2].avg_logprob == pytest.approx(math.log(1 / (45 + 9)))


def test_hash_embed_properties(spark):
    from pandera_spark.operators.text import hash_embed
    from pandera_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [
            (1, "spark engines process data fast"),
            (2, "spark engines process data fast"),   # identical text
            (3, "completely different words entirely here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.embedding for r in hash_embed(df, dim=32).collect()}
    assert out[1] == out[2]                       # pure function of text
    assert out[1] != out[3]
    assert out[4] == [0] * 32                     # null -> zero vector
    assert len(out[1]) == 32
    # token count conservation: sum |v_i| <= n_tokens (equality unless
    # collisions cancel)
    assert sum(abs(x) for x in out[1]) <= 5
    assert sum(abs(x) for x in out[1]) >= 1
    # embeddings feed the similarity operators directly
    emb = hash_embed(df.filter("text IS NOT NULL"), dim=32)
    a = emb.filter("doc_id = 1").select(
        F.col("embedding").cast("array<double>").alias("e1"))
    b = emb.filter("doc_id = 3").select(
        F.col("embedding").cast("array<double>").alias("e2"))
    sim = a.crossJoin(b).select(
        cosine(F.col("e1"), F.col("e2")).alias("s")).first().s
    assert -1.0 <= sim <= 1.0
    with pytest.raises(ValueError):
        hash_embed(df, dim=0)


def test_semantic_dedup_pipeline(spark):
    """hash_embed -> LSH near-dups -> components -> anti-join: identical
    texts collapse to one kept doc, distinct texts all survive."""
    from pandera_spark.operators.clustering import apply_dedup
    from pandera_spark.operators.similarity import embedding_near_dups
    from pandera_spark.operators.text import hash_embed

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in
            range(3)] + [
        (10, "an entirely different text about distributed engines"),
        (11, "yet another unrelated document with its own words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hash_embed(df, dim=32).select(
        "doc_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pairs = embedding_near_dups(
        emb, id_col="doc_id", threshold=0.95, dim=32, n_planes=16, bands=4,
        corpus_storage=None,
    ).select("id_a", "id_b")
    kept = {r.doc_id for r in
            apply_dedup(df, pairs, id_col="doc_id").collect()}
    assert 0 in kept                 # canonical = min id of the clone set
    assert not {1, 2} & kept         # clones dropped
    assert {10, 11} <= kept          # distinct docs untouched


def test_exact_dedup_stats_binary_payloads(spark):
    """Binary payloads hash raw bytes: two payloads that collide after a
    lossy UTF-8 cast must still count as distinct."""
    import pyspark.sql.types as T

    from pandera_spark.operators.dedup import exact_dedup_stats

    rows = [(bytes([0xC3, 0x28]),), (bytes([0xC3, 0x29]),),
            (bytes([0xC3, 0x28]),)]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("payload", T.BinaryType(), True)])
    )
    r = exact_dedup_stats(df, "payload").first()
    assert r.n_docs == 3 and r.n_distinct == 2 and r.dup_rows == 2


def test_lsh_recall_harness(spark):
    from pandera_spark.operators.similarity import lsh_recall

    import random as _r

    rng = _r.Random(3)
    rows = []
    for i in range(30):
        base = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x + 1e-4) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = lsh_recall(df, threshold=0.999, dim=16, n_planes=16, bands=8).first()
    # twins are exact pairs; near-identical vectors share signatures so
    # banding finds essentially all of them
    assert r.n_exact_pairs >= 30
    assert r.n_lsh_pairs <= r.n_exact_pairs      # verified subset
    assert r.recall >= 0.9
    with pytest.raises(ValueError):
        lsh_recall(df, threshold=0.9, dim=16, max_rows=10)


def test_prepare_training_corpus_end_to_end(spark):
    from pandera_spark.operators.pipeline import prepare_training_corpus

    good = ("the cat and the dog went to the park in a big way for fun "
            "and that is all there is to say about it today really truly")
    rows = (
        [(i, good + f" alpha{i} beta{i} gamma{i} delta{i}") for i in range(3)]  # keepers
        + [(10, good), (11, good)]                                # clones
        + [(20, "!!! ??? ***")]                                   # fails gate
        + [(21, "")]                                              # fails gate
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(
        docs, min_words=10, dedup_threshold=0.999, embed_dim=32,
        chunk_size=60, chunk_overlap=10, n_shards=4, epoch=1,
    )
    report = {r.stage: r.n_docs for r in out["report"].collect()}
    assert report["input"] == 7
    assert report["quality_gate"] == 5            # 20, 21 dropped
    assert report["semantic_dedup"] == 4          # clone 11 dropped
    kept = {r.doc_id for r in out["kept"].collect()}
    assert kept == {0, 1, 2, 10}
    chunks = out["chunks"].collect()
    assert chunks and all(0 <= r.shard < 4 for r in chunks)
    assert all(r.sort_key is not None for r in chunks)
    # deterministic end-to-end: a rerun yields identical chunks
    again = prepare_training_corpus(
        docs, min_words=10, dedup_threshold=0.999, embed_dim=32,
        chunk_size=60, chunk_overlap=10, n_shards=4, epoch=1,
    )["chunks"].collect()
    key = lambda r: (r.doc_id, r.chunk_idx)
    assert sorted(chunks, key=key) == sorted(again, key=key)
    # stage_storage persists reused stages without changing any result
    cached = prepare_training_corpus(
        docs, min_words=10, dedup_threshold=0.999, embed_dim=32,
        chunk_size=60, chunk_overlap=10, n_shards=4, epoch=1,
        stage_storage="MEMORY_AND_DISK",
    )
    assert {r.stage: r.n_docs for r in cached["report"].collect()} == report
    assert {r.doc_id for r in cached["kept"].collect()} == kept
    assert sorted(cached["chunks"].collect(), key=key) == sorted(
        chunks, key=key
    )
    assert cached["kept"].storageLevel.useMemory  # knob actually persisted
    spark.catalog.clearCache()
    with pytest.raises(ValueError):
        prepare_training_corpus(docs, lm_reference=docs)
    with pytest.raises(ValueError):
        prepare_training_corpus(docs, min_words=10, embed_dim=32,
                                stage_storage="NOT_A_LEVEL")
    spark.catalog.clearCache()


def test_prepare_training_corpus_persists_by_default(spark):
    from pandera_spark.operators.pipeline import prepare_training_corpus

    good = ("the cat and the dog went to the park in a big way for fun "
            "and that is all there is to say about it today really truly")
    docs = spark.createDataFrame(
        [(i, good + f" tail{i}") for i in range(4)],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        docs, min_words=10, embed_dim=32, chunk_size=60,
        chunk_overlap=10, n_shards=2
    )
    # default = MEMORY_AND_DISK: reused stages are pinned, and every
    # consumer's plan reads the cache instead of re-running the gate
    assert out["kept"].storageLevel.useMemory
    assert out["kept"].storageLevel.useDisk
    for frame in (out["chunks"], out["report"]):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        # consumers read the pinned stage, not a re-run of its lineage
        assert "InMemoryTableScan" in plan
    # explicit opt-out stays fully lazy (no persisted stage)
    spark.catalog.clearCache()
    lazy = prepare_training_corpus(
        docs, min_words=10, embed_dim=32, chunk_size=60,
        chunk_overlap=10, n_shards=2, stage_storage=None,
    )
    plan = lazy["chunks"]._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan
    spark.catalog.clearCache()


def test_streaming_quality_gate(spark, tmp_path):
    import json

    from pandera_spark.streaming.stateful import streaming_quality_gate

    src = tmp_path / "in"
    src.mkdir()
    good = ("the cat and the dog went to the park in a big way for fun "
            "and that is all there is")
    (src / "a.json").write_text("\n".join(
        json.dumps(r) for r in [
            {"id": 1, "text": good},
            {"id": 2, "text": "!!! ??? ***"},
        ]
    ))
    stream = spark.readStream.schema("id long, text string").json(str(src))
    gated = streaming_quality_gate(stream, min_words=10)
    got = []
    q = (
        gated.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_id = {r.id: r for r in got}
    assert by_id[1].keep is True and by_id[1].failed_rules == ""
    assert by_id[2].keep is False
    assert "punct_ratio" in by_id[2].failed_rules
    # batch frames accepted too
    bdf = spark.createDataFrame([(3, good)], "id long, text string")
    assert streaming_quality_gate(bdf, min_words=10).first().keep is True


def test_session_funnel_resets_across_sessions(spark):
    """A path split across two sessions does NOT convert; within one
    session it does."""
    import datetime as dt

    from pandera_spark.operators.temporal import funnel, sessionize

    T0 = dt.datetime(2024, 1, 1)

    def ev(u, minutes, t):
        return (u, T0 + dt.timedelta(minutes=minutes), t)

    rows = [
        ev(1, 0, "view"), ev(1, 5, "buy"),          # same session: converts
        ev(2, 0, "view"), ev(2, 600, "buy"),        # >gap: buy in session 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    s = sessionize(df, by=["user_id"], ts_col="ts", gap_seconds=1800)
    keyed = s.withColumn(
        "__sk", F.concat_ws(":", F.col("user_id").cast("string"),
                            F.col("session_id").cast("string")))
    out = {r.step: r.n_users
           for r in funnel(keyed, "__sk", "et", "ts",
                           ["view", "buy"]).collect()}
    assert out == {1: 2, 2: 1}          # u2's cross-session path broken


def test_perceptual_hash_near_dups(spark):
    """Real PNG payloads: a re-encoded near-identical image pairs with
    the original; a different image doesn't; corrupt payloads yield
    null hashes and never pair."""
    import numpy as np

    from pandera_spark.operators.codecs import encode_png
    from pandera_spark.operators.multimodal import (
        perceptual_hash, phash_near_dups,
    )

    rng = np.random.default_rng(11)
    base = (rng.random((32, 36, 3)) * 255).astype(np.uint8)
    tweaked = base.copy()
    tweaked[0, 0] = 255 - tweaked[0, 0]          # one-pixel edit
    other = (rng.random((32, 36, 3)) * 255).astype(np.uint8)
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_png(tweaked))),
        (3, bytearray(encode_png(other))),
        (4, bytearray(b"not an image")),
        (5, None),
    ]
    import pyspark.sql.types as T

    media = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("media_id", T.LongType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]),
    )
    hashed = perceptual_hash(media)
    got = {r.media_id: r.phash for r in hashed.collect()}
    assert got[1] == got[2] or bin(got[1] ^ got[2]).count("1") <= 8
    assert got[4] is None and got[5] is None
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in phash_near_dups(hashed, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    with pytest.raises(ValueError):
        phash_near_dups(hashed, max_hamming=64)


@pytest.mark.parametrize("max_hamming", [7, 8, 11, 16, 31])
def test_phash_pigeonhole_boundary_distance(spark, max_hamming):
    """Pigeonhole recall contract at EXACTLY distance == max_hamming with
    one differing bit per block — the adversarial placement that fixed
    ceil(64/nb)-width blocking silently missed for nb where
    (nb-1)*ceil(64/nb) >= 64 (incl. the default max_hamming=8: block 8
    landed at shift 64, which JVM long-shift wraps to 0)."""
    import pyspark.sql.types as T

    from pandera_spark.operators.multimodal import phash_near_dups

    nb = max_hamming + 1
    bounds = [(i * 64) // nb for i in range(nb + 1)]
    h1 = 0
    # flip the LOW bit of each of the first max_hamming blocks: exactly
    # max_hamming differing bits, spread so only the last block matches
    for i in range(max_hamming):
        h1 |= 1 << bounds[i]
    to_signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v  # noqa: E731
    rows = [(1, to_signed(0)), (2, to_signed(h1))]
    hashed = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("media_id", T.LongType(), True),
            T.StructField("phash", T.LongType(), True),
        ]),
    )
    got = phash_near_dups(hashed, max_hamming=max_hamming).collect()
    # exactly ONE row (first-matching-block dedup) at the boundary distance
    assert len(got) == 1
    assert (got[0].id_a, got[0].id_b, got[0].hamming) == (1, 2, max_hamming)
    # distance max_hamming+1 (flip one bit in the last block too) is OUT
    h2 = h1 | (1 << bounds[max_hamming])
    hashed2 = spark.createDataFrame(
        [(1, to_signed(0)), (2, to_signed(h2))],
        T.StructType([
            T.StructField("media_id", T.LongType(), True),
            T.StructField("phash", T.LongType(), True),
        ]),
    )
    assert phash_near_dups(hashed2, max_hamming=max_hamming).count() == 0


def _wav_bytes(samples, rate=8000):
    """Minimal PCM16 mono RIFF/WAVE payload."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    return hdr + fmt + data


def test_audio_fingerprint_near_dups(spark):
    import numpy as np

    from pandera_spark.operators.multimodal import (
        audio_fingerprint, phash_near_dups,
    )
    import pyspark.sql.types as T

    rng = np.random.default_rng(5)
    t = np.linspace(0, 1, 8000)
    tone = (np.sin(2 * np.pi * 440 * t) * (1 + np.sin(2 * np.pi * 3 * t)))
    a = (tone * 8000).astype(np.int16)
    louder = (tone * 12000).astype(np.int16)        # gain change: same shape
    noise = (rng.standard_normal(8000) * 8000).astype(np.int16)
    rows = [
        (1, bytearray(_wav_bytes(a))),
        (2, bytearray(_wav_bytes(louder))),
        (3, bytearray(_wav_bytes(noise))),
        (4, bytearray(b"not audio")),
    ]
    media = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("media_id", T.LongType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]),
    )
    hashed = audio_fingerprint(media)
    got = {r.media_id: r.afp for r in hashed.collect()}
    assert got[4] is None
    # gain-changed copy fingerprints identically (envelope SHAPE hash)
    assert got[1] == got[2]
    pairs = {(r.id_a, r.id_b)
             for r in phash_near_dups(hashed, hash_col="afp",
                                      max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_funnel_conversion_window(spark):
    import datetime as dt

    from pandera_spark.operators.temporal import funnel

    T0 = dt.datetime(2024, 1, 1)

    def ev(u, minutes, t):
        return (u, T0 + dt.timedelta(minutes=minutes), t)

    rows = [
        ev(1, 0, "view"), ev(1, 5, "buy"),       # within 10 min
        ev(2, 0, "view"), ev(2, 30, "buy"),      # outside window
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = {r.step: r.n_users
           for r in funnel(df, "user_id", "et", "ts", ["view", "buy"],
                           within_seconds=600).collect()}
    assert out == {1: 2, 2: 1}
    # no window: both convert
    out2 = {r.step: r.n_users
            for r in funnel(df, "user_id", "et", "ts",
                            ["view", "buy"]).collect()}
    assert out2 == {1: 2, 2: 2}


# ---------------------------------------------------------------------------
# sketch binning + embedding linear algebra


def test_sketch_bins_known_values(spark):
    from pandera_spark.operators.numeric import sketch_bins

    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    out = sketch_bins(df, "v", 4, exact=True)
    counts = {r.bin: r["count"] for r in out.groupBy("bin").count().collect()}
    assert counts == {1: 250, 2: 250, 3: 250, 4: 250}
    # the sketch default lands within its rank-error bound of equal depth
    approx = sketch_bins(df, "v", 4)
    ac = {r.bin: r["count"] for r in approx.groupBy("bin").count().collect()}
    assert set(ac) == {1, 2, 3, 4}
    assert all(abs(c - 250) <= 1000 / 10000 + 2 for c in ac.values())
    # nulls get a null bin; n_bins=1 is the identity bucket
    nl = spark.createDataFrame([(None,), (5.0,)], "v double")
    rows = {r.v: r.bin for r in sketch_bins(nl, "v", 1).collect()}
    assert rows[5.0] == 1 and rows[None] is None
    with pytest.raises(ValueError):
        sketch_bins(df, "v", 0)


def test_sketch_bins_tie_goes_left(spark):
    from pandera_spark.operators.numeric import sketch_bins

    # edges of 1,2,3,4 at (1/2) exact = 2.5; all-tied values stay in
    # ONE bin (bin = 1 + #edges strictly below the value)
    df = spark.createDataFrame([(2.0,)] * 4 + [(3.0,)] * 4, "v double")
    out = {r.v: r.bin for r in sketch_bins(df, "v", 2, exact=True).collect()}
    assert out[2.0] == 1 and out[3.0] == 2


def test_dim_stats_and_corr_known_values(spark):
    from pandera_spark.operators.linalg import dim_corr, dim_stats

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([2.0, 4.0],), ([3.0, 6.0],)],
        "e array<double>",
    )
    st = {r.dim: r for r in dim_stats(df, "e", [0, 1]).collect()}
    assert st[0].mean == pytest.approx(2.0)
    assert st[0].std == pytest.approx(1.0)
    assert st[1].mean == pytest.approx(4.0)
    c = dim_corr(df, "e", [(0, 1)]).first()
    assert c.corr == pytest.approx(1.0)  # perfectly correlated
    # zero-variance dim: ANSI-safe null, not DIVIDE_BY_ZERO
    z = spark.createDataFrame(
        [([1.0, 5.0],), ([2.0, 5.0],)], "e array<double>"
    )
    assert dim_corr(z, "e", [(0, 1)]).first().corr is None


def test_whiten_identity_covariance(spark):
    import numpy as np

    from pandera_spark.operators.linalg import fit_pca, pca_transform, whiten

    rng = np.random.default_rng(7)
    # correlated 6-dim data
    a = rng.normal(size=(400, 3))
    x = np.hstack([a, a @ rng.normal(size=(3, 3)) + 0.1 * rng.normal(size=(400, 3))])
    df = spark.createDataFrame(
        [(row.tolist(),) for row in x], "e array<double>"
    )
    mean, lam, vecs = fit_pca(df, "e", 6)
    assert lam.sum() == pytest.approx(np.trace(np.cov(x.T)), rel=1e-6)
    w = whiten(df, "e", mean, lam, vecs)
    xw = np.array([r.white for r in w.collect()])
    cw = np.cov(xw.T)
    assert np.allclose(np.diag(cw), 1.0, atol=1e-3)
    off = cw - np.diag(np.diag(cw))
    assert np.abs(off).max() < 1e-3
    # top-k projection preserves the leading variance
    p = pca_transform(df, "e", mean, vecs, k=2)
    xp = np.array([r.pca for r in p.collect()])
    assert np.var(xp[:, 0], ddof=1) == pytest.approx(lam[0], rel=1e-6)
    # nulls pass through
    nl = spark.createDataFrame([(None,)], "e array<double>")
    assert whiten(nl, "e", mean, lam, vecs).first().white is None


def test_fit_pca_dim_mismatch_raises(spark):
    from pandera_spark.operators.linalg import fit_pca

    df = spark.createDataFrame([([1.0, 2.0],)], "e array<double>")
    with pytest.raises(ValueError):
        fit_pca(df, "e", 3)


def test_sketch_bins_multi_column_one_agg(spark):
    from pandera_spark.operators.numeric import sketch_bins

    df = spark.range(1, 101).select(
        F.col("id").cast("double").alias("a"),
        (101 - F.col("id")).cast("double").alias("b"),
    )
    out = sketch_bins(df, ["a", "b"], 2, exact=True)
    assert {"a_bin", "b_bin"} <= set(out.columns)
    r = out.where(F.col("a") == 1.0).first()
    assert r.a_bin == 1 and r.b_bin == 2  # b is the reverse ramp
    # all edges come from ONE aggregate: exactly one Aggregate subtree
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate [") + plan.count("Aggregate\n") >= 1
    with pytest.raises(ValueError):
        sketch_bins(df, ["a", "b"], 2, out_col="bin")


def test_whiten_feeds_knn_graph(spark):
    """Composability: whitened embeddings flow straight into the banded
    LSH kNN graph (the intended conditioning→ANN pipeline)."""
    import numpy as np

    from pandera_spark.operators.linalg import fit_pca, whiten
    from pandera_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 16))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "doc_id bigint, e array<double>",
    )
    w = whiten(df, "e", *fit_pca(df, "e", 16), out_col="white")
    g = knn_graph(
        w.select("doc_id", F.col("white").alias("embedding")),
        k=3, id_col="doc_id", vec_col="embedding",
    )
    rows = g.collect()
    assert rows, "kNN graph is empty"
    per_src = {}
    for r in rows:
        per_src.setdefault(r[0], []).append(r)
    assert max(len(v) for v in per_src.values()) <= 3


def test_project_methods_agree(spark):
    """The Arrow (BLAS matmul) and pure-expression projection paths
    produce identical whitened vectors."""
    import numpy as np

    from pandera_spark.operators.linalg import fit_pca, whiten

    rng = np.random.default_rng(11)
    x = rng.normal(size=(60, 5))
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(x)],
        "i bigint, e array<double>",
    )
    fit = fit_pca(df, "e", 5)
    a = {r.i: r.white for r in whiten(df, "e", *fit).collect()}
    b = {r.i: r.white
         for r in whiten(df, "e", *fit, method="expr").collect()}
    for i in a:
        assert a[i] == pytest.approx(b[i], abs=1e-9)
    with pytest.raises(ValueError):
        whiten(df, "e", *fit, method="nope").collect()


def test_group_centroids_known_values(spark):
    from pandera_spark.operators.linalg import (
        centroid_separation,
        group_centroids,
    )

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [3.0, 0.0]),
         ("b", [0.0, 2.0]), ("b", [0.0, 4.0]),
         ("c", [2.0, 0.0])],
        "label string, e array<double>",
    )
    cent = {(r.label, r.dim): r for r in
            group_centroids(df, "e", "label").collect()}
    assert cent[("a", 0)].mean == pytest.approx(2.0)
    assert cent[("a", 0)].n == 2
    assert cent[("b", 1)].mean == pytest.approx(3.0)
    # dims filter prunes output
    only0 = group_centroids(df, "e", "label", dims=[0]).collect()
    assert {r.dim for r in only0} == {0}
    sep = {(r.group_a, r.group_b): r for r in
           centroid_separation(df, "e", "label").collect()}
    # a=(2,0), b=(0,3): orthogonal centroids
    assert sep[("a", "b")].cosine == pytest.approx(0.0)
    assert sep[("a", "b")].distance == pytest.approx((4 + 9) ** 0.5)
    # a=(2,0), c=(2,0): identical centroids
    assert sep[("a", "c")].cosine == pytest.approx(1.0)
    assert sep[("a", "c")].distance == pytest.approx(0.0)


def test_pool_embeddings_modes(spark):
    from pandera_spark.operators.linalg import pool_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (1, [3.0, 20.0]), (2, [5.0, 5.0]),
         (2, None)],
        "doc bigint, e array<double>",
    )
    mean = {r.doc: r.pooled
            for r in pool_embeddings(df, "e", "doc").collect()}
    assert mean[1] == pytest.approx([2.0, 15.0])
    assert mean[2] == pytest.approx([5.0, 5.0])  # null vector ignored
    mx = {r.doc: r.pooled
          for r in pool_embeddings(df, "e", "doc", mode="max").collect()}
    assert mx[1] == pytest.approx([3.0, 20.0])
    sm = {r.doc: r.pooled
          for r in pool_embeddings(df, "e", "doc", mode="sum").collect()}
    assert sm[1] == pytest.approx([4.0, 30.0])
    with pytest.raises(ValueError):
        pool_embeddings(df, "e", "doc", mode="median")


# --- file-level stats index + metadata pruning (operators/filestats.py) ----


@pytest.fixture(scope="module")
def _pruned_dataset(spark, tmp_path_factory):
    """A 3-file parquet dataset with disjoint key ranges per file plus
    one all-null-value file."""
    path = str(tmp_path_factory.mktemp("fsidx") / "data")
    rows = [(i, float(i) if i < 30 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    # one file per 10-key range: repartitionByRange on 4 partitions
    df.repartitionByRange(4, "k").write.parquet(path)
    return path


def test_file_stats_per_file_minmax_nulls(spark, _pruned_dataset):
    from pandera_spark.operators.filestats import file_stats

    df = spark.read.parquet(_pruned_dataset)
    st = file_stats(df, ["k", "v"]).collect()
    assert len(st) == 4
    assert sum(r.row_count for r in st) == 40
    # per-file spans are disjoint and tight
    spans = sorted((r.min_k, r.max_k) for r in st)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # the all-null-v file reports NULL min/max and 10 nulls
    null_file = [r for r in st if r.min_v is None]
    assert len(null_file) == 1
    assert null_file[0].nulls_v == 10
    # full-URI mode keeps the directory prefix
    uri = file_stats(df, ["k"], basename=False).collect()
    assert all("/" in r.file for r in uri)


def test_prune_files_overlap_and_allnull(spark, _pruned_dataset):
    from pandera_spark.operators.filestats import file_stats, prune_files

    st = file_stats(spark.read.parquet(_pruned_dataset), ["k", "v"])
    # k in [12, 18]: exactly one file's span overlaps
    assert prune_files(st, {"k": (12, 18)}).count() == 1
    # half-open: k >= 25 touches two files
    assert prune_files(st, {"k": (25, None)}).count() == 2
    # all-null file can never match a range predicate on v
    kept = prune_files(st, {"v": (0.0, 1e9)}).collect()
    assert all(r.min_v is not None for r in kept)
    # conjunction: k range selecting only the all-null file + v range
    assert prune_files(st, {"k": (31, 39), "v": (0.0, 1e9)}).count() == 0


def test_pruned_read_matches_full_scan(spark, _pruned_dataset):
    from pandera_spark.operators.filestats import file_stats, pruned_read

    full = spark.read.parquet(_pruned_dataset)
    st = file_stats(full, ["k", "v"])
    got = pruned_read(spark, _pruned_dataset, st, {"k": (5, 17)})
    want = full.filter("k >= 5 and k <= 17")
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in want.collect())
    # the pruned scan reads fewer files than exist
    n_files = len({r.file for r in st.collect()})
    read_files = got.select(F.input_file_name()).distinct().count()
    assert read_files < n_files
    # empty result keeps schema
    empty = pruned_read(spark, _pruned_dataset, st, {"k": (1000, 2000)})
    assert empty.columns == full.columns and empty.count() == 0


def test_pruning_report_and_stats_roundtrip(spark, _pruned_dataset, tmp_path):
    from pandera_spark.operators.filestats import (
        file_stats, pruning_report, read_stats, write_stats)

    st = file_stats(spark.read.parquet(_pruned_dataset), ["k"])
    rep = pruning_report(st, {"k": (12, 18)}).first()
    assert rep.files_total == 4 and rep.files_candidate == 1
    assert rep.rows_total == 40 and rep.rows_candidate == 10
    assert rep.row_skip_ratio == pytest.approx(0.75)
    # nothing survives -> candidate counts are zero, ratio 1.0
    rep0 = pruning_report(st, {"k": (999, None)}).first()
    assert rep0.files_candidate == 0 and rep0.rows_candidate == 0
    assert rep0.row_skip_ratio == pytest.approx(1.0)
    out = str(tmp_path / "stats")
    write_stats(st, out)
    back = read_stats(spark, out)
    assert sorted(back.columns) == sorted(st.columns)
    assert back.count() == 4


# --- heavy hitters (operators/heavyhitters.py) -----------------------------


def test_misra_gries_candidate_superset_and_lower_bound(spark):
    from pandera_spark.operators.heavyhitters import misra_gries_candidates

    # one partition, known stream: a x 50, b x 30, c..j x 2 each
    data = ["a"] * 50 + ["b"] * 30 + [c for c in "cdefghij" for _ in range(2)]
    df = spark.createDataFrame([(x,) for x in data], "k string").coalesce(1)
    k = 5
    cand = {r.k: r.mg_count
            for r in misra_gries_candidates(df, "k", counters=k).collect()}
    n = len(data)
    exact = {x: data.count(x) for x in set(data)}
    # every key with freq > n/k survives; counts are lower bounds within W/k
    for key, f in exact.items():
        if f > n / k:
            assert key in cand
    for key, c in cand.items():
        assert c <= exact[key]
        assert c >= exact[key] - n / k
    assert len(cand) <= k
    # nulls ignored
    dfn = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    candn = misra_gries_candidates(dfn, "k", counters=4).collect()
    assert {r.k for r in candn} == {"a"}


def test_heavy_hitters_exact_vs_groupby(spark):
    from pandera_spark.operators.heavyhitters import heavy_hitters

    data = ["x"] * 40 + ["y"] * 25 + ["z"] * 5 + [f"t{i}" for i in range(30)]
    df = spark.createDataFrame([(v,) for v in data], "k string")
    phi = 0.10
    got = {(r.k, r.freq) for r in heavy_hitters(df, "k", phi).collect()}
    n = len(data)
    want = {(x, data.count(x)) for x in set(data) if data.count(x) > phi * n}
    assert got == want
    # share column is freq/total
    row = heavy_hitters(df, "k", phi).first()
    assert row.share == pytest.approx(row.freq / n, abs=1e-6)
    # explicit total skips the count job and changes the threshold base
    got2 = heavy_hitters(df, "k", phi, total=n).collect()
    assert {(r.k, r.freq) for r in got2} == want


def test_heavy_hitters_validation(spark):
    from pandera_spark.operators.heavyhitters import heavy_hitters

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 1.5)
    # counters too small for phi cannot guarantee the superset
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.01, counters=10)


# --- intra-document segment dedup (operators/text.py) ----------------------


def test_intra_doc_dedup_first_occurrence_order(spark):
    from pandera_spark.operators.text import intra_doc_dedup

    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\nx\nx"), (3, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in intra_doc_dedup(df).collect()}
    assert out[1].text == "a\nb\nc"
    assert out[1].n_segments_before == 5 and out[1].n_segments_after == 3
    assert out[2].text == "x"
    # empty text: split yields one empty segment, kept as-is
    assert out[3].text == "" and out[3].n_segments_after == 1


def test_intra_doc_dedup_literal_delimiter_and_out_col(spark):
    from pandera_spark.operators.text import intra_doc_dedup

    # '.' must split literally, not as regex-any
    df = spark.createDataFrame([(1, "ab.cd.ab.ef")],
                               "doc_id bigint, text string")
    out = intra_doc_dedup(df, delimiter=".", out_col="clean",
                          stats=False).first()
    assert out.clean == "ab.cd.ef"
    assert "n_segments_before" not in out.asDict()
    # token mode
    df2 = spark.createDataFrame([(1, "w1 w2 w1 w1 w3 w2")],
                                "doc_id bigint, text string")
    assert intra_doc_dedup(df2, delimiter=" ").first().text == "w1 w2 w3"


# --- persisted HLL distinct sketches (operators/sketches.py) ---------------


def test_distinct_sketches_exact_for_small_cardinality(spark):
    from pandera_spark.operators.sketches import (
        distinct_sketches, rollup_estimates)

    rows = [(g, i % m) for g, m in [("a", 20), ("b", 7)] for i in range(100)]
    df = spark.createDataFrame(rows, "g string, k bigint")
    est = {r.g: r for r in rollup_estimates(
        distinct_sketches(df, "k", "g"), "g").collect()}
    # HLL is exact in sparse mode at tiny cardinalities
    assert est["a"].distinct_est == 20 and est["a"].n_rows == 100
    assert est["b"].distinct_est == 7 and est["b"].n_rows == 100


def test_sketch_rollup_is_lossless_and_ignores_nulls(spark):
    from pandera_spark.operators.sketches import (
        distinct_sketches, merge_sketches, rollup_estimates)

    # two fine segments share keys 0..9; union must not double count
    rows = ([("d1", "x", i) for i in range(10)]
            + [("d2", "x", i) for i in range(5, 15)]
            + [("d1", "x", None)])
    df = spark.createDataFrame(rows, "day string, t string, k bigint")
    fine = distinct_sketches(df, "k", ["day", "t"])
    assert fine.count() == 2
    coarse = rollup_estimates(fine, "t").first()
    assert coarse.distinct_est == 15  # |0..14|, null ignored
    assert coarse.n_rows == 21
    # global (no grouping) rollup
    tot = rollup_estimates(fine).first()
    assert tot.distinct_est == 15
    # hierarchies compose: day+t -> t -> global gives the same answer
    mid = merge_sketches(fine, "t")
    assert rollup_estimates(mid).first().distinct_est == 15


def test_sketch_error_bound_and_roundtrip(spark, tmp_path):
    from pandera_spark.operators.sketches import (
        distinct_sketches, read_sketches, rollup_estimates, write_sketches)

    n = 50_000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"), F.col("id").alias("k"))
    fine = distinct_sketches(df, "k", "g", lgk=12)
    path = str(tmp_path / "sk")
    write_sketches(fine, path)
    back = read_sketches(spark, path)
    est = rollup_estimates(back).first()
    # standard error at lgk=12 is ~1.6%; 5% is a >3-sigma bound
    assert abs(est.distinct_est - n) / n < 0.05
    assert est.n_rows == n


def test_sketch_ledger_append_and_retry_collapse(spark, tmp_path):
    from pandera_spark.operators.sketches import (
        ledger_estimates, sketch_ledger_foreach_batch)

    path = str(tmp_path / "ledger")
    process = sketch_ledger_foreach_batch("u", ["t"], path)
    b0 = spark.createDataFrame(
        [("click", i) for i in range(10)], "t string, u bigint")
    b1 = spark.createDataFrame(
        [("click", i) for i in range(5, 20)] + [("view", 99)],
        "t string, u bigint")
    process(b0, 0)
    process(b1, 1)
    process(b1, 1)  # at-least-once retry: same segment appended twice
    est = {r.t: r for r in ledger_estimates(spark, path, ["t"]).collect()}
    assert est["click"].distinct_est == 20  # |0..19| across batches
    # retry must not double-count rows: 10 + 16
    assert est["click"].n_rows + est["view"].n_rows == 26
    assert est["view"].distinct_est == 1
    # global estimate
    tot = ledger_estimates(spark, path).first()
    assert tot.distinct_est == 21


def test_append_file_stats_scans_only_new_files(spark, tmp_path, monkeypatch):
    import pandera_spark.operators.filestats as fs

    data = str(tmp_path / "data")
    idx = str(tmp_path / "idx")
    spark.createDataFrame([(i,) for i in range(10)], "k bigint") \
        .coalesce(1).write.mode("append").parquet(data)
    # first build indexes the initial file(s)
    st1 = fs.append_file_stats(spark, data, idx, ["k"])
    n1 = st1.count()
    assert n1 >= 1 and st1.agg(F.sum("row_count")).first()[0] == 10

    # second wave of files
    spark.createDataFrame([(i,) for i in range(100, 120)], "k bigint") \
        .coalesce(1).write.mode("append").parquet(data)

    seen_paths = []
    orig = fs.file_stats

    def spying(df, cols, **kw):
        seen_paths.extend(df.inputFiles())
        return orig(df, cols, **kw)

    monkeypatch.setattr(fs, "file_stats", spying)
    st2 = fs.append_file_stats(spark, data, idx, ["k"])
    # the delta scan touched only files NOT in the first index
    first_files = {r.file for r in st1.collect()}
    import posixpath
    assert seen_paths, "second call should scan the new files"
    assert all(posixpath.basename(p) not in first_files for p in seen_paths)
    assert st2.agg(F.sum("row_count")).first()[0] == 30
    # idempotent re-run: nothing new, no rescan, no duplicate rows
    seen_paths.clear()
    st3 = fs.append_file_stats(spark, data, idx, ["k"])
    assert seen_paths == []
    assert st3.count() == st2.count()
    # index prunes correctly across waves
    assert fs.prune_files(st3, {"k": (110, 115)}).count() >= 1
    assert fs.prune_files(st3, {"k": (50, 60)}).count() == 0


def test_zorder_layout_improves_file_skipping(spark, tmp_path):
    """The DEPLOY.md claim wired end-to-end: writing in z-order makes
    the file-stats spans narrow on BOTH keyed columns, so range
    predicates on either column prune files that a layout sorted by
    only one column cannot."""
    from pandera_spark.operators.filestats import file_stats, pruning_report
    from pandera_spark.operators.sharding import zorder_key

    n, nfiles = 4000, 8
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.pmod(F.hash("id"), F.lit(64))).alias("y"),
    )
    base = str(tmp_path)
    # layout A: sorted by x only — y spans stay full-width per file
    (df.repartitionByRange(nfiles, "x")
       .sortWithinPartitions("x").write.parquet(base + "/by_x"))
    # layout B: z-ordered on (x, y)
    z = zorder_key(df, ["x", "y"], bits=6)
    (z.repartitionByRange(nfiles, "zkey")
      .sortWithinPartitions("zkey").drop("zkey")
      .write.parquet(base + "/by_z"))

    pred = {"y": (0.0, 7.0)}  # narrow range on the NON-leading column
    skip = {}
    for name in ("by_x", "by_z"):
        st = file_stats(spark.read.parquet(f"{base}/{name}"), ["x", "y"])
        skip[name] = pruning_report(st, pred).first().row_skip_ratio
    # x-sorted layout cannot skip on y at all; z-order must skip most
    assert skip["by_x"] == pytest.approx(0.0)
    assert skip["by_z"] > 0.5


# --- MAD outlier report ----------------------------------------------------


def test_mad_outlier_known_values(spark):
    from pandera_spark.operators.numeric import mad_outlier_report

    # 0..100 (median 50, MAD 26 once the two planted outliers join the
    # deviation pool) plus one far outlier on each side
    vals = [float(i) for i in range(101)] + [10000.0, -10000.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = mad_outlier_report(df, ["v"], exact=True).first()
    assert r.col_name == "v"
    assert r.n_nonnull == 103
    assert r.median_r == pytest.approx(50.0)
    assert r.mad_r == pytest.approx(26.0)
    # fences: 50 +/- 3.5*1.4826*26 = 50 +/- 134.9 -> only the planted pair
    assert r.n_low == 1 and r.n_high == 1
    # approx default: n=103 << accuracy -> sketch is rank-exact, and the
    # odd-n median IS a data value, so both lanes agree bit-for-bit
    ra = mad_outlier_report(df, ["v"]).first()
    assert (ra.median_r, ra.mad_r, ra.n_low, ra.n_high) == (
        r.median_r, r.mad_r, r.n_low, r.n_high
    )


def test_mad_outlier_null_column_and_errors(spark):
    from pandera_spark.operators.numeric import mad_outlier_report

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 300.0)],
        "a double, b double",
    )
    rows = {r.col_name: r for r in
            mad_outlier_report(df, ["a", "b"], exact=True).collect()}
    assert rows["a"].n_nonnull == 0
    assert rows["a"].median_r is None and rows["a"].mad_r is None
    assert rows["a"].n_low == 0 and rows["a"].n_high == 0
    # b: median 2, MAD 1, fences 2 +/- 5.19 -> 300 is high
    assert rows["b"].n_high == 1 and rows["b"].n_low == 0
    with pytest.raises(ValueError):
        mad_outlier_report(df, [])
    with pytest.raises(ValueError):
        mad_outlier_report(df, ["b"], accuracy=0)


# --- candidate-key discovery -----------------------------------------------


def test_candidate_keys_verdicts(spark):
    from pandera_spark.inference import candidate_keys

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 10), (4, None, 20)],
        "pk int, grp string, val int",
    )
    out = {r.combo: r for r in candidate_keys(
        df, [["pk"], ["grp"], ["val"], ["grp", "val"]]
    ).collect()}
    assert out["pk"].is_key and out["pk"].n_distinct == 4
    assert out["pk"].n_rows == 4 and out["pk"].n_nonnull == 4
    # grp has a null AND dups: distinct skips the null row
    assert out["grp"].n_nonnull == 3 and out["grp"].n_distinct == 2
    assert not out["grp"].is_key
    assert not out["val"].is_key
    # jointly distinct on non-null rows, but the null row sinks the verdict
    assert out["grp,val"].n_distinct == 3
    assert out["grp,val"].n_nonnull == 3
    assert not out["grp,val"].is_key


def test_candidate_keys_approx_lane_and_errors(spark):
    from pandera_spark.inference import candidate_keys

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], "pk int, mod int"
    )
    out = {r.combo: r for r in candidate_keys(
        df, [["pk"], ["mod"]], exact=False, rsd=0.02
    ).collect()}
    # HLL at rsd=0.02: mod's 7 distinct is far from 1000 -> refuted
    assert not out["mod"].is_key
    assert abs(out["pk"].n_distinct - 1000) <= 0.1 * 1000
    with pytest.raises(ValueError):
        candidate_keys(df, [])
    with pytest.raises(ValueError):
        candidate_keys(df, [["pk"], []])


def test_candidate_keys_single_agg_plan(spark):
    """ALL combos resolve in ONE aggregation: Spark plans the n exact
    distincts together via a single Expand (input ×(n+1) pre-shuffle),
    not one scan per combo — no joins, no repeated scans."""
    from pandera_spark.inference import candidate_keys

    df = spark.createDataFrame([(i, i) for i in range(100)], "a int, b int")
    plan = candidate_keys(
        df, [["a"], ["b"], ["a", "b"]]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert "Join" not in plan and plan.count("Scan") == 1
    # one distinct-agg shuffle + the final single-partition merge
    assert plan.count("Exchange") == 2


# --- exact substring (repeated-span) dedup -----------------------------------


def _span_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta unique tail"),
            (2, "prefix alpha beta gamma delta epsilon zeta eta theta more"),
            (3, "totally different content with no overlap at all here now"),
        ],
        "doc_id int, text string",
    )


def test_repeated_span_report_known_values(spark):
    from pandera_spark.operators.dedup import repeated_span_report

    out = {
        r.doc_id: r
        for r in repeated_span_report(
            _span_corpus(spark), "doc_id", "text", k=8
        ).collect()
    }
    # docs 1 and 2 share the 8-token run; doc 3 is clean
    assert out[1].n_spans == 1 and out[1].dup_tokens == 8
    assert out[2].n_spans == 1 and out[2].dup_tokens == 8
    assert out[3].n_spans == 0 and out[3].dup_tokens == 0
    assert out[1].n_tokens == 10
    assert abs(out[1].dup_frac - 0.8) < 1e-12


def test_repeated_span_self_repetition_merges_to_one_span(spark):
    from pandera_spark.operators.dedup import repeated_span_report

    # 12 identical tokens: grams at pos 1..5 all repeat, and their
    # coverage intervals overlap -> ONE maximal span covering all 12
    df = spark.createDataFrame(
        [(1, " ".join(["x"] * 12))], "doc_id int, text string"
    )
    row = repeated_span_report(df, "doc_id", "text", k=8).collect()[0]
    assert row.n_spans == 1
    assert row.dup_tokens == 12
    assert row.dup_frac == 1.0


def test_repeated_span_short_docs_are_clean(spark):
    from pandera_spark.operators.dedup import repeated_span_report

    # both docs are shorter than k: no grams at all (and no
    # sequence(1,0) descending-range blowup), report is all zeros
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id int, text string"
    )
    rows = repeated_span_report(df, "doc_id", "text", k=8).collect()
    assert all(r.n_spans == 0 and r.dup_tokens == 0 for r in rows)
    assert all(r.n_tokens == 3 for r in rows)


def test_repeated_span_min_count_threshold(spark):
    from pandera_spark.operators.dedup import repeated_span_report

    out = {
        r.doc_id: r
        for r in repeated_span_report(
            _span_corpus(spark), "doc_id", "text", k=8, min_count=3
        ).collect()
    }
    # the shared run occurs only twice corpus-wide -> below min_count=3
    assert all(r.n_spans == 0 for r in out.values())


def test_repeated_span_hash_and_string_grams_agree(spark):
    from pandera_spark.operators.dedup import repeated_span_report

    df = _span_corpus(spark)
    a = sorted(
        repeated_span_report(
            df, "doc_id", "text", k=8, hash_grams=True
        ).collect()
    )
    b = sorted(
        repeated_span_report(
            df, "doc_id", "text", k=8, hash_grams=False
        ).collect()
    )
    assert a == b


def test_strip_repeated_spans_keeps_first_occurrence(spark):
    from pandera_spark.operators.dedup import strip_repeated_spans

    out = {
        r.doc_id: r.text
        for r in strip_repeated_spans(
            _span_corpus(spark), "doc_id", "text", k=8, keep="first"
        ).collect()
    }
    # doc 1 holds the globally first occurrence -> untouched;
    # doc 2 loses the shared run but keeps its unique flanks
    assert out[1] == (
        "alpha beta gamma delta epsilon zeta eta theta unique tail"
    )
    assert out[2] == "prefix more"
    assert out[3] == (
        "totally different content with no overlap at all here now"
    )


def test_strip_repeated_spans_keep_none_strips_all_copies(spark):
    from pandera_spark.operators.dedup import strip_repeated_spans

    out = {
        r.doc_id: r.text
        for r in strip_repeated_spans(
            _span_corpus(spark), "doc_id", "text", k=8, keep="none",
            out_col="clean",
        ).select("doc_id", F.col("clean").alias("text")).collect()
    }
    assert out[1] == "unique tail"
    assert out[2] == "prefix more"


def test_repeated_span_rejects_bad_args(spark):
    from pandera_spark.operators.dedup import repeated_span_report

    df = _span_corpus(spark)
    with pytest.raises(ValueError):
        repeated_span_report(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError):
        repeated_span_report(df, "doc_id", "text", keep="last")


# --- rolling_stats / ewma (trailing-window features) --------------------------


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_rolling_stats_known_values(spark):
    from pandera_spark.operators.temporal import rolling_stats

    df = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T00:00:00"), 10.0),
            (2, "u", _ts("2024-01-01T00:30:00"), 20.0),
            (3, "u", _ts("2024-01-01T02:00:00"), 30.0),
            (4, "v", _ts("2024-01-01T00:00:00"), 5.0),
        ],
        "id int, k string, ts timestamp, v double",
    )
    out = {
        r["id"]: r
        for r in rolling_stats(
            df, "ts", "v", keys=["k"], window_seconds=3600
        ).collect()
    }
    # id=2: window [23:30, 00:30] includes id=1 and id=2
    assert out[2]["roll_count"] == 2
    assert out[2]["roll_mean"] == 15.0
    assert out[2]["roll_sum"] == 30.0
    # id=3: 02:00 window [01:00, 02:00] includes only itself
    assert out[3]["roll_count"] == 1
    assert out[3]["roll_min"] == 30.0
    # other key unaffected
    assert out[4]["roll_count"] == 1


def test_rolling_stats_range_frame_includes_ties(spark):
    from pandera_spark.operators.temporal import rolling_stats

    t = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [(1, "u", t, 1.0), (2, "u", t, 2.0)],
        "id int, k string, ts timestamp, v double",
    )
    out = rolling_stats(
        df, "ts", "v", keys=["k"], window_seconds=60
    ).collect()
    # RANGE frame: simultaneous events are both in-frame for both rows
    assert all(r["roll_count"] == 2 and r["roll_sum"] == 3.0 for r in out)


def test_rolling_stats_rejects_unknown_stat(spark):
    from pandera_spark.operators.temporal import rolling_stats

    df = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T00:00:00"), 1.0)],
        "id int, k string, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="unknown rolling"):
        rolling_stats(
            df, "ts", "v", keys=["k"], window_seconds=60,
            stats=("median",),
        )


def test_ewma_constant_series_is_constant(spark):
    from pandera_spark.operators.temporal import ewma

    rows = [
        (i, "u", _ts(f"2024-01-01T00:0{i}:00"), 7.0) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "id int, k string, ts timestamp, v double"
    )
    out = ewma(df, "ts", "v", keys=["k"], alpha=0.4).collect()
    # normalized (adjust=True) EWMA of a constant series is the constant
    assert all(abs(r["ewma"] - 7.0) < 1e-12 for r in out)


def test_ewma_known_values(spark):
    from pandera_spark.operators.temporal import ewma

    df = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T00:00:00"), 1.0),
            (2, "u", _ts("2024-01-01T00:01:00"), 2.0),
            (3, "u", _ts("2024-01-01T00:02:00"), 3.0),
        ],
        "id int, k string, ts timestamp, v double",
    )
    out = {
        r["id"]: r["ewma"]
        for r in ewma(df, "ts", "v", keys=["k"], alpha=0.5).collect()
    }
    assert abs(out[1] - 1.0) < 1e-12
    # y2 = (2 + 0.5*1) / (1 + 0.5)
    assert abs(out[2] - 2.5 / 1.5) < 1e-12
    # y3 = (3 + 0.5*2 + 0.25*1) / (1 + 0.5 + 0.25)
    assert abs(out[3] - 4.25 / 1.75) < 1e-12


def test_ewma_truncates_at_span_rows(spark):
    from pandera_spark.operators.temporal import ewma

    rows = [
        (i, "u", _ts(f"2024-01-01T0{i // 60}:{i % 60:02d}:00"), float(i))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "id int, k string, ts timestamp, v double"
    )
    out = {
        r["id"]: r["ewma"]
        for r in ewma(
            df, "ts", "v", keys=["k"], alpha=0.5, span_rows=2
        ).collect()
    }
    # span_rows=2: only the current + previous value contribute
    # y5 = (5 + 0.5*4) / 1.5
    assert abs(out[5] - 7.0 / 1.5) < 1e-12


def test_ewma_rejects_bad_alpha(spark):
    from pandera_spark.operators.temporal import ewma

    df = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T00:00:00"), 1.0)],
        "id int, k string, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "ts", "v", keys=["k"], alpha=1.0)


def test_compaction_plan_packs_small_files(spark):
    from pandera_spark.operators.filestats import compaction_plan

    stats = spark.createDataFrame(
        [
            ("f01", 100), ("f02", 300), ("f03", 900),  # f03 healthy
            ("f04", 250), ("f05", 100), ("f06", 450),
        ],
        "file string, row_count long",
    )
    plan = compaction_plan(stats, target_rows=500, small_frac=0.75)
    rows = {r.file: (r.is_small, r.group_id) for r in plan.collect()}
    # healthy files (>= 0.75 * target) pass through ungrouped
    assert rows["f03"] == (False, None)
    assert rows["f06"] == (False, None)
    # sequential fill in file-name order over the small ones:
    # f01(100)@0, f02(300)@100, f04(250)@400, f05(100)@750
    assert rows["f01"] == (True, 0)
    assert rows["f02"] == (True, 0)
    assert rows["f04"] == (True, 0)
    assert rows["f05"] == (True, 1)


def test_compaction_plan_group_totals_near_target(spark):
    from pandera_spark.operators.filestats import compaction_plan
    from pyspark.sql import functions as F

    stats = spark.createDataFrame(
        [(f"f{i:03d}", 37 + (i * 13) % 150) for i in range(200)],
        "file string, row_count long",
    )
    plan = compaction_plan(stats, target_rows=1000)
    totals = (
        plan.where(F.col("is_small"))
        .groupBy("group_id")
        .agg(F.sum("row_count").alias("t"))
        .collect()
    )
    # every group except possibly the last holds >= target - max_file
    # and every group overshoots by at most one file
    by_gid = sorted((r.group_id, r.t) for r in totals)
    for gid, t in by_gid[:-1]:
        assert t >= 1000 - 200
    for gid, t in by_gid:
        assert t <= 1000 + 200


def test_compaction_plan_validation(spark):
    import pytest as _pytest

    from pandera_spark.operators.filestats import compaction_plan

    stats = spark.createDataFrame([("f", 1)], "file string, row_count long")
    with _pytest.raises(ValueError, match="target_rows"):
        compaction_plan(stats, target_rows=0)
    with _pytest.raises(ValueError, match="small_frac"):
        compaction_plan(stats, target_rows=10, small_frac=0.0)


def test_gap_report_finds_silences(spark):
    from pandera_spark.operators.temporal import gap_report

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),   # 30m ok
            (1, "2024-01-01 03:00:00"),   # 2.5h gap
            (2, "2024-01-01 00:00:00"),
            (2, "2024-01-03 00:00:00"),   # 48h gap
        ],
        "user_id int, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    gaps = gap_report(df, "ts", keys=["user_id"], min_gap_seconds=3600)
    rows = {(r.user_id, r.gap_seconds) for r in gaps.collect()}
    assert rows == {(1, 9000.0), (2, 172800.0)}


def test_gap_report_keyless_and_boundary(spark):
    from pandera_spark.operators.temporal import gap_report

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-01 01:00:00",)],
        "ts string",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts")
    # gap == threshold is NOT a violation (strict >)
    assert gap_report(df, "ts", min_gap_seconds=3600).count() == 0
    assert gap_report(df, "ts", min_gap_seconds=3599).count() == 1


def test_readability_known_values(spark):
    from pandera_spark.operators.text import readability

    df = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran!"),
            (1, None),
            (2, ""),
            (3, "no terminal punctuation here"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in readability(df).collect()}
    r0 = out[0]
    assert (r0.n_sentences, r0.n_words) == (2, 6)
    # syllables: the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
    assert r0.n_syllables == 6
    wps, spw = 6 / 2, 6 / 6
    assert r0.flesch_reading_ease == pytest.approx(
        206.835 - 1.015 * wps - 84.6 * spw
    )
    assert r0.flesch_kincaid_grade == pytest.approx(
        0.39 * wps + 11.8 * spw - 15.59
    )
    assert out[1].n_words is None and out[1].flesch_reading_ease is None
    assert out[2].n_words == 0 and out[2].flesch_reading_ease is None
    assert out[3].n_sentences == 1  # min one sentence when words exist


def test_readability_is_pure_projection(spark):
    from pandera_spark.operators.text import readability

    df = spark.createDataFrame([(0, "a b.")], "doc_id int, text string")
    raw = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in raw


def test_mmr_rerank_prefers_diversity(spark):
    from pandera_spark.operators.similarity import mmr_rerank

    # three near-identical high scorers + one distinct mid scorer:
    # pure top-k takes the three clones; MMR must interleave the
    # distinct vector at rank 2
    df = spark.createDataFrame(
        [
            (0, 1.00, [1.0, 0.0]),
            (1, 0.99, [1.0, 0.001]),
            (2, 0.98, [1.0, 0.002]),
            (3, 0.60, [0.0, 1.0]),
        ],
        "vec_id int, score double, embedding array<double>",
    )
    got = [
        (r.vec_id, r.mmr_rank)
        for r in mmr_rerank(df, k=3, lam=0.5)
        .orderBy("mmr_rank").collect()
    ]
    assert [v for v, _ in got] == [0, 3, 1]


def test_mmr_rerank_matches_numpy_replay(spark):
    import numpy as np
    from pandera_spark.operators.similarity import mmr_rerank

    rng = np.random.RandomState(3)
    n, d, k, lam = 30, 6, 8, 0.7
    x = rng.randn(n, d)
    scores = rng.rand(n)
    df = spark.createDataFrame(
        [(i, float(scores[i]), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id int, score double, embedding array<double>",
    )
    got = [
        r.vec_id
        for r in mmr_rerank(df, k=k, lam=lam).orderBy("mmr_rank").collect()
    ]
    xh = x / np.linalg.norm(x, axis=1)[:, None]
    sim = xh @ xh.T
    picked, max_sim, ref = set(), np.zeros(n), []
    for _ in range(k):
        best, bv = None, -np.inf
        for j in range(n):
            if j in picked:
                continue
            v = lam * scores[j] - (1 - lam) * (max_sim[j] if picked else 0)
            if v > bv or (v == bv and j < best):
                best, bv = j, v
        picked.add(best)
        ref.append(best)
        max_sim = np.maximum(max_sim, sim[:, best])
    assert got == ref


def test_mmr_rerank_guards(spark):
    from pandera_spark.operators.similarity import mmr_rerank

    df = spark.createDataFrame(
        [(i, 1.0, [1.0, 0.0]) for i in range(20)],
        "vec_id int, score double, embedding array<double>",
    )
    with pytest.raises(ValueError, match="max_candidates"):
        mmr_rerank(df, k=2, max_candidates=10)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, k=2, lam=1.5)
    empty = df.where("vec_id < 0")
    assert mmr_rerank(empty, k=3).count() == 0


def test_vocab_richness_known_values(spark):
    from pandera_spark.operators.text import vocab_richness

    df = spark.createDataFrame(
        [
            (0, "the cat and the dog and a bird"),
            (1, None),
            (2, ""),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in vocab_richness(df).collect()}
    r0 = out[0]
    # tokens: the,cat,and,the,dog,and,a,bird -> 8; types: 6
    assert (r0.n_tokens, r0.n_types) == (8, 6)
    assert r0.ttr == pytest.approx(6 / 8)
    # hapax: cat,dog,a,bird (4 of 6 types)
    assert r0.hapax_frac == pytest.approx(4 / 6)
    assert out[1].n_tokens is None
    assert out[2].n_tokens == 0 and out[2].ttr is None


def test_corpus_vocab_stats(spark):
    from pandera_spark.operators.text import corpus_vocab_stats

    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, None)], "doc_id int, text string"
    )
    r = corpus_vocab_stats(df).first()
    assert (r.n_tokens, r.n_types, r.n_hapax) == (5, 3, 1)  # only 'c'
    assert r.hapax_frac_r == pytest.approx(1 / 3, abs=1e-6)


def test_cross_source_dup_matrix(spark):
    from pandera_spark.operators.dedup import cross_source_dup_matrix

    df = spark.createDataFrame(
        [
            ("A", "x"), ("A", "x"),       # within-A dup of x
            ("A", "y"), ("B", "y"),       # A-B share y
            ("B", "z"), ("C", "z"),       # B-C share z
            ("C", "w"),                   # unique
            ("C", None), (None, "x"),     # nulls ignored
        ],
        "source string, text string",
    )
    got = {
        (r.src_a, r.src_b): r.shared_contents
        for r in cross_source_dup_matrix(df).collect()
    }
    assert got == {("A", "A"): 1, ("A", "B"): 1, ("B", "C"): 1}


def test_cross_source_dup_matrix_no_row_grain_join(spark):
    from pandera_spark.operators.dedup import cross_source_dup_matrix

    df = spark.createDataFrame(
        [("A", "x")] * 50 + [("B", "x")] * 50, "source string, text string"
    )
    out = cross_source_dup_matrix(df)
    rows = {(r.src_a, r.src_b): r.shared_contents for r in out.collect()}
    # 100 rows of identical content still produce exactly these pairs:
    # per-source distinct collapses BEFORE the join
    assert rows == {("A", "A"): 1, ("B", "B"): 1, ("A", "B"): 1}


def test_zipf_fit_recovers_powerlaw(spark):
    from pandera_spark.operators.text import zipf_fit

    # synthesize a corpus whose word w_r appears round(1000/r) times:
    # slope must come out near -1
    rows = []
    for r in range(1, 51):
        rows.extend([(f"w{r:03d}",)] * max(1, round(1000 / r)))
    df = spark.createDataFrame(
        [(" ".join(w for (w,) in rows),)], "text string"
    )
    fit = zipf_fit(df).first()
    assert fit.n_types == 50
    assert -1.1 < fit.slope_r < -0.9
    assert fit.r2_r > 0.99


def test_zipf_fit_uniform_corpus_slope_zero(spark):
    from pandera_spark.operators.text import zipf_fit

    df = spark.createDataFrame(
        [(" ".join(f"t{i}" for i in range(100)),)], "text string"
    )
    fit = zipf_fit(df).first()
    assert fit.slope_r == 0.0  # every freq identical


def test_weighted_sample_python_replay_and_proportionality(spark):
    import hashlib
    import math

    from pandera_spark.operators.curation import weighted_sample

    rows = [(i, 10.0 if i % 10 == 0 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = sorted(r.k for r in weighted_sample(df, "k", "w", 60).collect())

    def h28(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    def key(i, w):
        u = (h28(str(i)) + 0.5) / (1 << 28)
        return -math.log(u) / w

    exp = sorted(
        i for i, _ in sorted(rows, key=lambda t: (key(*t), t[0]))[:60]
    )
    assert got == exp
    # determinism + independent redraw under a different salt
    again = sorted(r.k for r in weighted_sample(df, "k", "w", 60).collect())
    assert again == got
    other = sorted(
        r.k for r in weighted_sample(df, "k", "w", 60, salt="x").collect()
    )
    assert other != got
    # proportionality: the 50 heavy keys (w=10) should dominate the
    # draw far beyond their 10% population share
    heavy = sum(1 for i in got if i % 10 == 0)
    assert heavy >= 25


def test_weighted_sample_excludes_bad_weights(spark):
    from pandera_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None), (None, 1.0), (5, 2.0)],
        "k long, w double",
    )
    got = {r.k for r in weighted_sample(df, "k", "w", 10).collect()}
    assert got == {1, 5}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        weighted_sample(df, "k", "w", 0)


def test_weighted_sample_plan_is_take_ordered(spark):
    from pandera_spark.operators.curation import weighted_sample

    df = spark.createDataFrame([(i, 1.0) for i in range(100)], "k long, w double")
    plan = weighted_sample(df, "k", "w", 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_top_k_per_group_values_and_pushdown(spark):
    from pandera_spark.operators.relational import top_k_per_group

    rows = [(g, i, float((i * 13) % 97)) for g in "ab" for i in range(50)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = top_k_per_group(df, "g", "v", 3, tiebreak_cols=["i"]).collect()
    assert len(out) == 6
    for g in "ab":
        vals = [r.v for r in sorted(
            (r for r in out if r.g == g), key=lambda r: r.rank)]
        exp = sorted((v for gg, i, v in rows if gg == g), reverse=True)[:3]
        assert vals == exp
    asc = top_k_per_group(
        df, "g", "v", 2, descending=False, tiebreak_cols=["i"]
    ).collect()
    assert all(r.v <= 1.0 or r.rank for r in asc) and len(asc) == 4
    # WindowGroupLimit: local top-k before the shuffle
    plan = top_k_per_group(df, "g", "v", 3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        top_k_per_group(df, "g", "v", 0)
