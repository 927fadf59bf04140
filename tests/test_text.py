"""Text analysis function tests over the driver documents table."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import text as T

from conftest import TESTDATA_SF


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA_SF}/documents.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["a b  c", "", None, " x "]}))
    got = [r["n"] for r in df.select(T.token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_lang_id_basic(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the cat is on the mat and it is happy",
                    "der Hund ist nicht mit der Katze und das ist gut",
                    "le chat est dans la maison et il est content",
                    "zzz qqq",
                ]
            }
        )
    )
    got = [r["l"] for r in df.select(T.lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_rolling_fingerprint_matches_duckdb(spark):
    texts = ["hello world", "Grüße", "", "a"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r["fp"] for r in df.select(T.rolling_fingerprint(F.col("text")).alias("fp")).collect()]
    con = duckdb.connect()
    for t, g in zip(texts, got):
        exp = con.execute(
            "SELECT list_reduce(list_prepend(0::BIGINT, "
            "list_transform(string_split(?, ''), c -> ascii(c)::BIGINT)), "
            "(acc, c) -> (acc * 31 + c) % 2147483647)",
            [t],
        ).fetchone()[0]
        assert g == exp, (t, g, exp)


def test_quality_score_range(docs):
    stats = docs.select(T.quality_score(F.col("text")).alias("q")).agg(
        F.min("q"), F.max("q")
    ).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_with_text_analysis_on_driver_docs(docs):
    out = T.with_text_analysis(docs)
    row = out.filter(F.col("n_tokens") > 0).first()
    assert row["n_tokens_bpe"] >= row["n_tokens"]
    assert row["fingerprint"] >= 0
    # lang_pred should mostly agree with the table's lang label for en/de
    both = out.filter(F.col("lang").isin("en", "de")).select(
        (F.col("lang") == F.col("lang_pred")).cast("int").alias("ok")
    )
    acc = both.agg(F.avg("ok")).collect()[0][0]
    assert acc is None or acc > 0.5  # heuristic, not a classifier
