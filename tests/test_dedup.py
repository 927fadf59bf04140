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


def test_bucket_cap_chunking_preserves_pairs(spark):
    """_bucket_candidates with a cap must emit exactly the uncapped
    pair set, just never as one giant per-bucket array."""
    rows = [(i, 0, 7) for i in range(50)] + [(100 + i, 1, 9) for i in range(5)]
    banded = spark.createDataFrame(rows, "id long, band int, bucket long")
    uncapped = {
        (r["id_a"], r["id_b"]) for r in dd._bucket_candidates(banded, None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]) for r in dd._bucket_candidates(banded, 8).collect()
    }
    assert capped == uncapped
    assert len(capped) == 50 * 49 // 2 + 5 * 4 // 2


def test_minhash_degenerate_bucket_pre_dedup(spark):
    """~1k byte-identical docs (the boilerplate scenario): the exact
    pre-pass collapses them to ONE representative before LSH, so no
    bucket array grows with the duplicate count, while the output pair
    set still equals the exact ground truth."""
    boiler = "server error page not found please try again later contact support team"
    uniq = [
        (50000 + i, f"unique document number {i} about topic{i} with words w{i} x{i} y{i} z{i}")
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1000)] + uniq, "doc_id long, text string"
    )
    # (a) with pre-dedup, every rep-level LSH bucket holds exactly 1 id
    members = dd.exact_groups(docs)
    rep_docs = docs.join(
        members.filter(F.col("keep") == F.col("id")).select("id"),
        on=[F.col("doc_id") == F.col("id")],
        how="left_semi",
    )
    banded = dd._lsh_banded(rep_docs, 3, 64, 16, "text", "doc_id")
    max_bucket_size = (
        banded.groupBy("band", "bucket").count().agg(F.max("count")).first()[0]
    )
    assert max_bucket_size == 1
    # (b) pair output unchanged vs the exact ground truth:
    # all C(1000,2) identical pairs at jaccard 1.0, nothing else
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.9)
    assert pairs.count() == 1000 * 999 // 2
    assert pairs.filter(F.col("jaccard") != 1.0).count() == 0
    assert pairs.filter((F.col("id_a") >= 1000) | (F.col("id_b") >= 1000)).count() == 0
    # (c) the corpus-level dedup keeps exactly one of the cluster
    kept = dd.near_dedup_corpus(docs, threshold=0.9)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {0} | {u[0] for u in uniq}


def test_connected_components_star_logn_on_chain(spark):
    """large-star/small-star converges in O(log n) rounds on a 1k-node
    chain (plain min-label propagation would need ~n rounds, silently
    truncated by max_iters)."""
    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels, iters = dd.connected_components(pairs, return_iterations=True)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert iters <= 25  # O(log n); propagation would take ~1000


def test_connected_components_random_vs_union_find(spark):
    """Random sparse graph: star CC labels equal a driver union-find."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    expected = {x: find(x) for x in nodes}
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in dd.connected_components(pairs).collect()}
    assert got == expected


def test_connected_components_chains(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a long, id_b long",
    )
    comp = {r["id"]: r["component"] for r in dd.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_near_dedup_corpus_collapses_clusters(spark):
    """A~B and B~C collapse to one kept doc even when A~C alone is
    below threshold (the cluster semantics pairwise dedup misses)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    a = " ".join(toks)
    b = " ".join(toks[:-1] + ["changedone"])          # ~B close to A
    c = " ".join(toks[:-2] + ["changedone", "two"])   # close to B, farther from A
    d = "completely different words about unrelated things entirely here now"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string"
    )
    exact = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    got_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert (1, 2) in got_pairs and (2, 3) in got_pairs
    kept = {r["doc_id"] for r in dd.near_dedup_corpus(docs, threshold=0.5).collect()}
    assert kept == {1, 4}  # the whole 1-2-3 chain collapsed to doc 1


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
