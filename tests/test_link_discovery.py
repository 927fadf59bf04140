"""In-page link discovery + keyword-score priority (north rule:
"priority = depth/keyword-score analog of the reference's per-page
keyword matcher").

Deep pages are never sitemap-listed; they are only reachable through
outlinks of stored pages (some only through a chain of two links), so
a drained crawl storing every deep page proves multi-hop discovery.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.sources.synth import corpus_to_spark, gen_corpus
from crawler_spark.storage import SnapshotCatalog


@pytest.fixture(scope="module")
def deep_corpus_pd():
    return gen_corpus(
        n_pages=240, n_hosts=3, urlset_size=40, fault_frac=0.0, deep_frac=0.2
    )


@pytest.fixture(scope="module")
def deep_engine(spark, deep_corpus_pd, tmp_path_factory):
    corpus = corpus_to_spark(spark, deep_corpus_pd)
    eng = CrawlEngine(
        spark,
        SnapshotCatalog(spark, str(tmp_path_factory.mktemp("deep_wh"))),
        seed_pages=corpus["seed_pages"],
        sitemap_entries=corpus["sitemap_entries"],
        robots_rules=corpus["robots_rules"],
        keywords=corpus["keywords"],
        round_duration=3600.0,
        store_payload=False,
    )
    eng.bootstrap()
    return eng


def test_children_enter_frontier_with_priority(spark, deep_engine, deep_corpus_pd):
    deep_engine.run_round()  # round 0: sitemap-listed pages only
    frontier = deep_engine.frontier()
    children = frontier.filter(F.col("depth") == 1)
    assert children.count() > 0
    # priority = (depth+1-th band) minus parent keyword score: depth-1
    # rows live in (0, 1000]; keyword-rich parents push lower values
    pr = [r["priority"] for r in children.select("priority").collect()]
    assert all(0 < p <= 1000 for p in pr)
    assert len(set(pr)) > 1  # keyword scores actually differentiate


def test_all_deep_pages_discovered_and_stored(spark, deep_engine, deep_corpus_pd):
    deep_engine.run(max_rounds=20)
    assert deep_engine.pending_count() == 0
    seed = deep_corpus_pd["seed_pages"]
    stored = {r["url"] for r in deep_engine.pages().select("url").collect()}
    assert stored == set(seed.url)  # every page incl. all deep pages


def test_depth2_pages_need_the_chain(deep_corpus_pd, spark, deep_engine):
    seed = deep_corpus_pd["seed_pages"]
    deep_urls = set(seed[seed.url.str.contains("/detail/")].url)
    # depth-2 pages are linked only from other deep pages
    linked_from_deep = {
        u
        for _, row in seed[seed.url.isin(deep_urls)].iterrows()
        for u in (row["outlinks"] or [])
    }
    assert linked_from_deep, "corpus should contain depth-2 pages"
    stored = {r["url"] for r in deep_engine.pages().select("url").collect()}
    assert linked_from_deep <= stored


def test_no_duplicate_urls_with_links(deep_engine):
    pages = deep_engine.pages()
    assert pages.count() == pages.select("url").distinct().count()
