"""Unicode text normalization (text.normalize_text)."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from pandera_spark.operators.text import normalize_text


def _df(spark):
    return spark.createDataFrame(
        [
            (0, "café time"),      # decomposed é
            (1, "café time"),        # precomposed é
            (2, "ﬁne   ﬂour"),  # ligatures + runs of spaces
            (3, "ASCII only"),
            (4, None),
            (5, "  edge  \t whitespace \n "),
        ],
        "doc_id int, text string",
    )


def test_nfc_unifies_composed_and_decomposed(spark):
    out = normalize_text(_df(spark), "text")
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows[0] == rows[1] == "café time"


def test_nfkc_folds_ligatures(spark):
    out = normalize_text(_df(spark), "text", form="NFKC")
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows[2] == "fine flour"


def test_nfc_keeps_ligatures(spark):
    out = normalize_text(_df(spark), "text", form="NFC")
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows[2] == "ﬁne ﬂour"  # ws collapsed, ligature kept


def test_strip_accents_and_lowercase(spark):
    df = spark.createDataFrame(
        [(0, "Ångström naïve"), (1, "ño")], "doc_id int, text string"
    )
    out = normalize_text(df, "text", strip_accents=True, lowercase=True)
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows == {0: "angstrom naive", 1: "no"}


def test_null_and_whitespace_handling(spark):
    out = normalize_text(_df(spark), "text")
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows[4] is None
    assert rows[5] == "edge whitespace"


def test_out_col_preserves_original(spark):
    out = normalize_text(_df(spark), "text", out_col="norm")
    row = out.where(F.col("doc_id") == 0).first()
    assert row.text == "café time" and row.norm == "café time"


def test_invalid_form_rejected(spark):
    with pytest.raises(ValueError, match="form"):
        normalize_text(_df(spark), "text", form="NFX")


def test_matches_duckdb_nfc(spark):
    import duckdb

    texts = [
        "café", "ﬁn ﬃ", "Ångström", "ｆｕｌｌ", "½¼", "å",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.text
        for r in normalize_text(df, "text", collapse_ws=False).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want == unicodedata.normalize("NFC", t)
