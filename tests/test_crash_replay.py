"""Mid-commit crash replay: the round's table commits are ordered
(bridge, pages, seen, bloom, lineage, frontier-last), so a crash
between any two leaves the frontier manifest at round r and the next
run REPLAYS round r over partially-committed state. Every sink must
be idempotent under that replay: pages and seen are url-keyed merges,
bridge is read through distinct(), the frontier overwrite is the
commit point. bridge-before-pages matters: the replay's pages url
anti-join empties `stored` for already-committed pages, so bridge
rows appended AFTER pages could never be re-derived.

Equivalent reference behavior: re-running harvest after a crash skips
already-stored URLs via advertisement_exists (src/harvester.py:133-177).
"""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.sources.synth import corpus_to_spark, gen_corpus
from crawler_spark.storage import SnapshotCatalog


@pytest.fixture(scope="module")
def crash_corpus(spark):
    return corpus_to_spark(spark, gen_corpus(n_pages=300, n_hosts=4, urlset_size=50))


def _mk(spark, corpus, wh):
    return CrawlEngine(
        spark,
        SnapshotCatalog(spark, wh),
        seed_pages=corpus["seed_pages"],
        sitemap_entries=corpus["sitemap_entries"],
        robots_rules=corpus["robots_rules"],
        keywords=corpus["keywords"],
        round_duration=3600.0,
        store_payload=False,
    )


def test_replayed_half_round_is_idempotent(spark, crash_corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("crash_wh"))
    engine = _mk(spark, crash_corpus, wh)
    engine.bootstrap()

    # snapshot the frontier manifest (the commit point) before round 0
    manifest = f"{wh}/frontier/_manifest.json"
    shutil.copy(manifest, manifest + ".bak")

    engine.run_round()
    pages_after = engine.pages().count()
    seen_after = engine.seen().count()
    assert pages_after == seen_after > 0

    # simulate a crash AFTER pages/bridge/seen committed but BEFORE the
    # frontier commit: restore the pre-round frontier manifest
    shutil.copy(manifest + ".bak", manifest)
    with open(manifest) as f:
        assert json.load(f)["properties"]["round"] == 0

    # a fresh process resumes and replays round 0 over the partial state
    engine2 = _mk(spark, crash_corpus, wh)
    assert engine2.current_round() == 0
    engine2.run(max_rounds=20)

    assert engine2.pending_count() == 0
    pages = engine2.pages()
    # no duplicate URLs, counts consistent, per-portal ids still dense
    assert pages.count() == pages.select("url").distinct().count()
    assert engine2.seen().count() == engine2.seen().select("url").distinct().count()
    assert pages.count() == engine2.seen().count()
    pdf = pages.select("portal", "id").toPandas()
    for _, grp in pdf.groupby("portal"):
        ids = sorted(grp["id"])
        assert ids == list(range(1, len(ids) + 1))
    # the replayed round inserted nothing new: every round-0 page row
    # survives from the first (crashed) run, none were re-stored
    assert pages.filter(F.col("round") == 0).count() == pages_after


def test_crash_between_bridge_and_pages_is_lossless(
    spark, crash_corpus, tmp_path_factory
):
    """ADVICE round 2: a crash after the bridge append but before the
    pages append must not lose (or double) keyword matches on replay.
    With the bridge-first commit order, the replayed round re-derives
    the same pages (identical ids — the round is deterministic given
    the frontier snapshot) and re-appends the same bridge rows, which
    collapse in the distinct() read."""
    from crawler_spark.functions.keywords import keywords_as_rows, make_keyword_matcher

    wh = str(tmp_path_factory.mktemp("crash_wh2"))
    engine = _mk(spark, crash_corpus, wh)
    engine.bootstrap()

    orig_append = engine.catalog.append

    def crash_after_bridge(name, df, *a, **k):
        orig_append(name, df, *a, **k)
        if name == "bridge":
            raise RuntimeError("simulated crash after bridge append")

    engine.catalog.append = crash_after_bridge
    with pytest.raises(RuntimeError, match="simulated crash"):
        engine.run_round()
    engine.catalog.append = orig_append
    assert engine.pages().count() == 0  # pages never committed
    assert engine.catalog.read("bridge", __import__("crawler_spark").schemas.BRIDGE).count() > 0

    # fresh process resumes: round 0 replays over the dangling bridge rows
    engine2 = _mk(spark, crash_corpus, wh)
    assert engine2.current_round() == 0
    engine2.run(max_rounds=20)
    assert engine2.pending_count() == 0

    pages = engine2.pages()
    matcher = make_keyword_matcher(
        keywords_as_rows(engine2.keywords), title_only=False
    )
    expected = (
        pages.withColumn(
            "m",
            matcher(F.col("caption"), F.lit(None).cast("string"), F.lit(None).cast("string")),
        )
        .select("portal", F.col("id").alias("page_id"), F.explode("m").alias("keyword_id"))
    )
    got = {
        (r["keyword_id"], r["page_id"], r["portal"]) for r in engine2.bridge().collect()
    }
    want = {
        (r["keyword_id"], r["page_id"], r["portal"]) for r in expected.collect()
    }
    assert got == want  # nothing lost, nothing dangling, nothing doubled
