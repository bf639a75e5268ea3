"""Distributed BPE training: pair counts, merge loop, encoding."""

import collections

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.tokenize import (
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    word_counts,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (0, "low low low low low"),
            (1, "lower lower"),
            (2, "newest newest newest"),
            (3, "widest  widest"),  # double space -> empty fragment
        ],
        "doc_id int, text string",
    )


# ---- pure-Python reference BPE (Sennrich-style, word-frequency form) ----

def _py_word_counts(texts):
    wc = collections.Counter()
    for t in texts:
        wc.update(w for w in t.split() if w)
    return wc


def _py_pairs(vocab):
    pairs = collections.Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    return pairs


def _py_merge_word(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_bpe(texts, n_merges, min_pair_count=2):
    vocab = {
        tuple(w): n for w, n in _py_word_counts(texts).items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = _py_pairs(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        vocab = {
            _py_merge_word(s, (a, b)): n for s, n in vocab.items()
        }
    return merges


def test_word_counts_drops_empty_fragments(spark):
    wc = {r.word: r.n for r in word_counts(_corpus(spark), "text").collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 3, "widest": 2}


def test_pair_counts_weighted_by_word_frequency(spark):
    words = word_counts(_corpus(spark), "text").select(
        "word", "n", F.split("word", "").alias("syms")
    )
    pc = {
        (r.left, r.right): r.pair_count
        for r in bpe_pair_counts(words).collect()
    }
    # 'lo' appears in low(5) and lower(2)
    assert pc[("l", "o")] == 7
    # 'es' in newest(3) and widest(2)
    assert pc[("e", "s")] == 5
    # repeated adjacency inside one word counts per occurrence
    words2 = spark.createDataFrame(
        [("aaa", 2)], "word string, n long"
    ).select("word", "n", F.split("word", "").alias("syms"))
    pc2 = {
        (r.left, r.right): r.pair_count
        for r in bpe_pair_counts(words2).collect()
    }
    assert pc2[("a", "a")] == 4  # two adjacencies x weight 2


def test_bpe_train_matches_python_reference(spark):
    texts = [r.text for r in _corpus(spark).collect()]
    expected = _py_bpe(texts, n_merges=8)
    got = bpe_train(_corpus(spark), "text", n_merges=8)
    assert got == expected


def test_bpe_train_deterministic_tiebreak(spark):
    # 'ab' and 'cd' both appear twice; smallest pair label must win
    df = spark.createDataFrame([(0, "cd ab cd ab")], "i int, text string")
    merges = bpe_train(df, "text", n_merges=1)
    assert merges == [(1, "a", "b", 2)]


def test_bpe_train_stops_below_min_pair_count(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "i int, text string")
    assert bpe_train(df, "text", n_merges=5, min_pair_count=2) == []


def test_bpe_encode_replays_merges_in_rank_order(spark):
    corpus = _corpus(spark)
    merges = bpe_train(corpus, "text", n_merges=6)
    enc = bpe_encode(corpus, merges, "text")
    toks = {r.doc_id: r.tokens for r in enc.collect()}
    # python replay of the same merges over doc 0
    texts = {r.doc_id: r.text for r in corpus.collect()}
    for did, text in texts.items():
        words = [tuple(w) for w in text.split() if w]
        for _rank, a, b, _c in merges:
            words = [_py_merge_word(w, (a, b)) for w in words]
        flat = [s for w in words for s in w]
        assert toks[did] == flat, did


def test_bpe_encode_checkpoint_path(spark):
    corpus = _corpus(spark)
    merges = bpe_train(corpus, "text", n_merges=6)
    a = bpe_encode(corpus, merges, "text", checkpoint_every=2)
    b = bpe_encode(corpus, merges, "text", checkpoint_every=None)
    assert sorted(map(tuple, (r.tokens for r in a.collect()))) == sorted(
        map(tuple, (r.tokens for r in b.collect()))
    )


def test_bpe_train_rejects_bad_args(spark):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(_corpus(spark), "text", n_merges=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_bpe_differential_random_corpus(spark, seed):
    import random

    rng = random.Random(seed)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    assert bpe_train(df, "text", n_merges=10) == _py_bpe(texts, 10)


def test_bpe_unicode_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "héé héé héé"), (1, ""), (2, None), (3, "  ")],
        "doc_id int, text string",
    )
    merges = bpe_train(df, "text", n_merges=3)
    # (h,é) and (é,é) tie at 3; the lexicographically smaller label wins
    assert merges[0] == (1, "h", "é", 3)
    enc = bpe_encode(df, merges, "text")
    toks = {r.doc_id: r.tokens for r in enc.collect()}
    assert toks[1] == [] and toks[3] == []


def test_merge_list_roundtrip(spark, tmp_path):
    from pandera_spark.operators.tokenize import load_merges, save_merges

    merges = bpe_train(_corpus(spark), "text", n_merges=5)
    path = str(tmp_path / "merges")
    save_merges(spark, merges, path)
    assert load_merges(spark, path) == merges
    # encoding with the loaded list is identical
    a = bpe_encode(_corpus(spark), merges, "text").collect()
    b = bpe_encode(
        _corpus(spark), load_merges(spark, path), "text"
    ).collect()
    assert sorted(map(tuple, (r.tokens for r in a))) == sorted(
        map(tuple, (r.tokens for r in b))
    )


def test_bpe_train_unpersists_word_table(spark):
    # bpe_train rebinds its working frame per merge round; the PERSISTED
    # base word table must still be released on exit
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        [("low lower lowest",), ("low low newer",)], "text string"
    )
    bpe_train(df, n_merges=3, min_pair_count=2)
    after = sc._jsc.getPersistentRDDs().size()
    assert after <= before
