"""Full REP robots semantics in the crawl path.

The reference delegates robots evaluation to Protego
(src/harvester.py:405-410) and applies it per candidate link
(src/harvester.py:1079-1083): longest matching rule wins, Allow wins
length ties, ``*``/``$`` wildcards apply. These tests pin the engine's
discover() and link-discovery admission to exactly can_fetch,
row-by-row — including the ``Disallow: /`` + ``Allow: /jobs/`` case a
prefix-only filter would get wrong.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.sources.sitemap_xml import RobotsRules, can_fetch
from crawler_spark.storage import SnapshotCatalog

HOST_A = "portal0.example.at"   # Disallow: /  +  Allow: /jobs/
HOST_B = "portal1.example.de"   # wildcard + $ rules
RULES = {
    HOST_A: RobotsRules(allow=["/jobs/"], disallow=["/"]),
    HOST_B: RobotsRules(allow=[], disallow=["/*.pdf$", "/tmp/*"]),
}
URLS_A = [
    f"https://{HOST_A}/jobs/{i}" for i in range(5)
] + [
    f"https://{HOST_A}/private/0",
    f"https://{HOST_A}/private/1",
    f"https://{HOST_A}/jobs",  # NOT under /jobs/ -> Disallow:/ wins
]
URLS_B = [
    f"https://{HOST_B}/docs/a.pdf",      # blocked by /*.pdf$
    f"https://{HOST_B}/docs/a.pdfx",     # $ anchor: allowed
    f"https://{HOST_B}/tmp/cache/1",     # blocked by /tmp/*
    f"https://{HOST_B}/jobs/9",          # allowed
    f"https://{HOST_B}/page?x=1.pdf",    # query is part of the REP path -> blocked
]
DEEP_OK = f"https://{HOST_A}/jobs/deep1"
DEEP_BLOCKED = f"https://{HOST_A}/secret/deep2"


@pytest.fixture(scope="module")
def rep_corpus(spark):
    pages = []
    for i, url in enumerate(URLS_A + URLS_B + [DEEP_OK]):
        host = HOST_A if HOST_A in url else HOST_B
        portal = "karriere_0" if host == HOST_A else "karriere_1"
        outlinks = [DEEP_OK, DEEP_BLOCKED] if url.endswith("/jobs/0") else []
        pages.append(
            (f"img_{i}", url, host, portal, 16, 16, "raw", f"caption {i}", 200, False, 0, outlinks)
        )
    seed_pages = spark.createDataFrame(
        pd.DataFrame(
            pages,
            columns=[
                "image_id", "url", "host", "portal", "w", "h", "fmt",
                "caption", "http_status", "transient", "phash", "outlinks",
            ],
        ),
        schema=schemas.SEED_PAGES,
    )
    sm = [
        ("karriere_0", f"https://{HOST_A}/sitemap-jobs-0.xml", 0, i, u)
        for i, u in enumerate(URLS_A)
    ] + [
        ("karriere_1", f"https://{HOST_B}/sitemap-jobs-0.xml", 0, i, u)
        for i, u in enumerate(URLS_B)
    ]
    sitemap_entries = spark.createDataFrame(
        pd.DataFrame(sm, columns=["portal", "sitemap_url", "sitemap_seq", "loc_seq", "url"]),
        schema=schemas.SITEMAP_ENTRIES,
    )
    rb = [
        (HOST_A, "karriere_0", 6000, None, 5,
         [f"https://{HOST_A}/sitemap-jobs-0.xml"], RULES[HOST_A].disallow, RULES[HOST_A].allow),
        (HOST_B, "karriere_1", 6000, None, 5,
         [f"https://{HOST_B}/sitemap-jobs-0.xml"], RULES[HOST_B].disallow, RULES[HOST_B].allow),
    ]
    robots_rules = spark.createDataFrame(
        pd.DataFrame(
            rb,
            columns=[
                "host", "portal", "requests_per_minute", "robots_crawl_delay",
                "retry_timeout_min", "sitemap_urls", "disallow", "allow",
            ],
        ),
        schema=schemas.ROBOTS_RULES,
    )
    keywords = spark.createDataFrame(
        pd.DataFrame([(1, "Caption", r"caption", False)],
                     columns=["id", "title", "search", "case_sensitive"]),
        schema=schemas.KEYWORDS,
    )
    return {
        "seed_pages": seed_pages,
        "sitemap_entries": sitemap_entries,
        "robots_rules": robots_rules,
        "keywords": keywords,
    }


@pytest.fixture(scope="module")
def rep_engine(spark, rep_corpus, tmp_path_factory):
    eng = CrawlEngine(
        spark,
        SnapshotCatalog(spark, str(tmp_path_factory.mktemp("rep_wh"))),
        seed_pages=rep_corpus["seed_pages"],
        sitemap_entries=rep_corpus["sitemap_entries"],
        robots_rules=rep_corpus["robots_rules"],
        keywords=rep_corpus["keywords"],
        round_duration=3600.0,
        store_payload=False,
        validate_payload=False,
    )
    return eng


def test_discover_matches_can_fetch_row_by_row(rep_engine):
    admitted = {r["url"] for r in rep_engine.discover().select("url").collect()}
    for url in URLS_A + URLS_B:
        host = HOST_A if HOST_A in url else HOST_B
        expected = can_fetch(RULES[host], url)
        assert (url in admitted) == expected, f"{url}: engine={url in admitted} REP={expected}"


def test_allow_overrides_broader_disallow(rep_engine):
    """Disallow: / + Allow: /jobs/ admits exactly the /jobs/ subtree."""
    admitted = {r["url"] for r in rep_engine.discover().select("url").collect()}
    a_urls = {u for u in admitted if HOST_A in u}
    assert a_urls == {f"https://{HOST_A}/jobs/{i}" for i in range(5)}


def test_wildcard_and_anchor_rules(rep_engine):
    admitted = {r["url"] for r in rep_engine.discover().select("url").collect()}
    assert f"https://{HOST_B}/docs/a.pdf" not in admitted
    assert f"https://{HOST_B}/docs/a.pdfx" in admitted
    assert f"https://{HOST_B}/tmp/cache/1" not in admitted
    assert f"https://{HOST_B}/page?x=1.pdf" not in admitted


def test_outlink_admission_applies_rep(rep_engine):
    """Discovered outlinks run through the same REP gate: the allowed
    deep link is crawled, the disallowed one never enters the system."""
    rep_engine.bootstrap()
    rep_engine.run(max_rounds=10)
    urls = {r["url"] for r in rep_engine.pages().select("url").collect()}
    assert DEEP_OK in urls
    assert DEEP_BLOCKED not in urls
    seen = {r["url"] for r in rep_engine.seen().select("url").collect()}
    assert DEEP_BLOCKED not in seen
    assert rep_engine.pending_count() == 0
