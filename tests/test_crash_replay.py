"""Mid-commit crash replay: the round's table commits are ordered
(pages, bridge, seen, bloom, lineage, frontier-last), so a crash
between any two leaves the frontier manifest at round r and the next
run REPLAYS round r over partially-committed state. Every sink must
be idempotent under that replay: pages and seen are url-keyed merges,
bridge is read through distinct(), the frontier overwrite is the
commit point.

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
