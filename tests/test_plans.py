"""Plan-shape regression tests (crawler_spark.plans.audit).

Pins the physical properties the 100 TB design depends on, so a
refactor that silently de-optimizes a plan (filter stops reaching the
scan, a text op falls back to Python, the anti-join degrades) fails CI
rather than only showing up in EXPLAIN.md.
"""

import __spark_entry__ as entrymod
from crawler_spark.plans.audit import audit_plan

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entrymod.queries()[name](spark, SF)


def test_id_range_filter_reaches_scan(spark):
    res = audit_plan(
        "id_range_scan",
        _q(spark, "id_range_scan"),
        required=[r"PushedFilters: \[.*GreaterThanOrEqual\(doc_id,100\)"],
        forbidden=[r"ArrowEvalPython"],
    )
    assert res.ok, res.summary


def test_text_analysis_stays_jvm_side(spark):
    res = audit_plan(
        "text_analysis",
        _q(spark, "text_analysis"),
        required=[],
        forbidden=[r"ArrowEvalPython", r"BatchEvalPython"],
    )
    assert res.ok, res.summary


def test_seen_dedup_is_anti_join(spark):
    res = audit_plan(
        "seen_anti_join",
        _q(spark, "seen_anti_join"),
        required=[r"LeftAnti"],
        forbidden=[],
    )
    assert res.ok, res.summary


def test_keyword_titles_broadcasts_dimension(spark):
    res = audit_plan(
        "keyword_titles",
        _q(spark, "keyword_titles"),
        required=[r"BroadcastHashJoin"],
        forbidden=[],
    )
    assert res.ok, res.summary


def test_minhash_signatures_native(spark):
    """The signature pipeline (shingle -> xxhash64 -> band) must stay
    JVM-native. Audited on the banded relation directly: the full
    minhash_lsh query localCheckpoints the bucket relation (the
    degenerate-bucket chunk self-join must not re-run the signature
    pipeline), which truncates lineage to an ExistingRDD scan — the
    final plan no longer shows the upstream stages, so pinning there
    would be vacuous."""
    from crawler_spark.operators.dedup import _lsh_banded

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    banded = _lsh_banded(docs, n=3, n_hashes=64, bands=16, text_col="text", id_col="doc_id")
    res = audit_plan(
        "minhash_banded",
        banded,
        required=[r"xxhash64"],
        forbidden=[r"ArrowEvalPython", r"BatchEvalPython"],
    )
    assert res.ok, res.summary
    # and the post-checkpoint half (bucket grouping + verify) must not
    # introduce a Python stage either
    res2 = audit_plan(
        "minhash_lsh",
        _q(spark, "minhash_lsh"),
        required=[],
        forbidden=[r"ArrowEvalPython", r"BatchEvalPython"],
    )
    assert res2.ok, res2.summary


def test_exact_dedup_partial_agg_on_hash(spark):
    """Representative selection must be a HashAggregate over the
    xxhash64-led key with a left-semi join back — never a Window whose
    partition key is the raw text (round-1 anti-pattern)."""
    res = audit_plan(
        "exact_dedup",
        _q(spark, "exact_dedup"),
        required=[r"HashAggregate", r"xxhash64", r"LeftSemi"],
        forbidden=[r"Window", r"ArrowEvalPython", r"BatchEvalPython"],
    )
    assert res.ok, res.summary


def test_simhash_fingerprints_stay_jvm_side(spark):
    """The bit-vote fingerprint is explode + xxhash64 + one
    HashAggregate — the round-1 per-character Python loop must never
    come back."""
    res = audit_plan(
        "simhash",
        _q(spark, "simhash"),
        required=[r"xxhash64", r"HashAggregate"],
        forbidden=[r"ArrowEvalPython", r"BatchEvalPython"],
    )
    assert res.ok, res.summary


def test_ann_bucket_joins_broadcast_queries(spark):
    """LSH and IVF probe joins broadcast the (tiny) query side; the
    only Python stage is the intended Arrow bucketize UDF."""
    for name in ("cosine_topk_lsh", "cosine_topk_ivf"):
        res = audit_plan(
            name,
            _q(spark, name),
            required=[r"ArrowEvalPython", r"BroadcastHashJoin", r"Window"],
            forbidden=[],
        )
        assert res.ok, f"{name}: {res.summary}"
