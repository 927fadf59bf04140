"""Dedup operator tests: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import dedup as dd

from conftest import TESTDATA_SF


@pytest.fixture(scope="module")
def docs(spark):
    """Driver documents plus planted duplicates with known ids."""
    base = spark.read.parquet(f"{TESTDATA_SF}/documents.parquet").select("doc_id", "text")
    first = base.orderBy("doc_id").limit(3).collect()
    planted = [
        (100001, first[0]["text"]),  # exact dup of first doc
        (100002, first[1]["text"]),  # exact dup of second
        # near-dup: one word changed at the end
        (100003, " ".join(first[2]["text"].split()[:-1] + ["changed"])),
    ]
    extra = spark.createDataFrame(pd.DataFrame(planted, columns=["doc_id", "text"]))
    return base.unionByName(extra).cache(), {
        "exact": {(first[0]["doc_id"], 100001), (first[1]["doc_id"], 100002)},
        "near": (first[2]["doc_id"], 100003),
    }


def test_exact_dedup(docs):
    df, expected = docs
    pairs = {(r["kept_id"], r["dup_id"]) for r in dd.exact_dup_pairs(df).collect()}
    assert expected["exact"] <= pairs
    kept = dd.exact_dedup(df)
    assert kept.count() == df.count() - len(pairs)
    # representatives are the lowest ids
    assert kept.filter(F.col("doc_id").isin([100001, 100002])).count() == 0


def test_ngram_jaccard_finds_near_dup(docs):
    df, expected = docs
    pairs = dd.ngram_jaccard_pairs(df, n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    a, b = expected["near"]
    assert (min(a, b), max(a, b)) in got
    assert all(0.5 <= j <= 1.0 for j in got.values())


def test_minhash_lsh_matches_exact_jaccard_at_high_threshold(docs):
    df, expected = docs
    exact = {
        (r["id_a"], r["id_b"])
        for r in dd.ngram_jaccard_pairs(df, n=3, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dd.minhash_lsh_pairs(df, n=3, threshold=0.8).collect()
    }
    # LSH verifies candidates with exact jaccard -> no false positives
    assert lsh <= exact
    # at 0.8 similarity with 16 bands x 4 rows, collision prob ~1-(1-0.8^4)^16 ≈ 0.9996
    a, b = expected["near"]
    near_pair_sim = [
        r["jaccard"] for r in dd.ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
        if (r["id_a"], r["id_b"]) == (min(a, b), max(a, b))
    ]
    if near_pair_sim and near_pair_sim[0] >= 0.8:
        assert (min(a, b), max(a, b)) in lsh
    # exact dups always collide
    for pair in expected["exact"]:
        assert pair in lsh


def test_simhash_near_dup(docs):
    df, expected = docs
    sh = {r["id"]: r["sh"] for r in dd.simhash_fingerprints(df).collect()}
    # identical texts -> identical simhash
    pairs = {(r["id_a"], r["id_b"]) for r in dd.simhash_near_dup_pairs(df, max_hamming=3).collect()}
    assert expected["exact"] <= pairs
    a, b = expected["near"]
    ham = bin((sh[a] & (1 << 64) - 1) ^ (sh[b] & (1 << 64) - 1)).count("1")
    if ham <= 3:
        assert (min(a, b), max(a, b)) in pairs
