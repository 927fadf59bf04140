"""Structured Streaming seed ingestion (SeedStream) tests.

Seeds stream in as parquet micro-batches; each batch merges into the
frontier (deduped against open work AND the seen set) and triggers
scheduling rounds. The harvested result must equal a plain batch
crawl of the same URLs.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.frontier import CrawlEngine
from crawler_spark.sources.synth import corpus_to_spark, gen_corpus
from crawler_spark.storage import SnapshotCatalog
from crawler_spark.streaming.seed_stream import SeedStream


@pytest.fixture(scope="module")
def stream_corpus(spark):
    return corpus_to_spark(
        spark,
        gen_corpus(n_pages=240, n_hosts=3, urlset_size=40, fault_frac=0.0),
    )


def _mk_engine(spark, corpus, path):
    return CrawlEngine(
        spark,
        SnapshotCatalog(spark, path),
        seed_pages=corpus["seed_pages"],
        sitemap_entries=corpus["sitemap_entries"],
        robots_rules=corpus["robots_rules"],
        keywords=corpus["keywords"],
        round_duration=3600.0,
        store_payload=False,
    )


def test_streamed_seeds_equal_batch_crawl(spark, stream_corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("stream_wh"))
    seed_dir = str(tmp_path_factory.mktemp("seed_drop"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    engine = _mk_engine(spark, stream_corpus, wh)
    engine.catalog.overwrite("frontier", engine.discover().limit(0), properties={"round": 0})

    urls = stream_corpus["seed_pages"].select("portal", "url").toPandas()
    half = len(urls) // 2
    # two micro-batches, second overlaps the first (re-seeded URLs must
    # be dropped by the seen-set dedup, src/harvester.py:133-177)
    batch1 = urls.iloc[:half]
    batch2 = urls.iloc[half - 20:]

    stream = SeedStream(engine, seed_dir, rounds_per_batch=4)
    spark.createDataFrame(batch1).coalesce(1).write.mode("append").parquet(seed_dir)
    q = stream.start(ckpt)
    q.awaitTermination(120)

    n_after_b1 = engine.pages().count()
    assert n_after_b1 == half

    spark.createDataFrame(batch2).coalesce(1).write.mode("append").parquet(seed_dir)
    q = stream.start(ckpt)
    q.awaitTermination(120)

    assert stream.batches >= 1
    pages = engine.pages()
    assert pages.count() == len(urls)
    assert pages.select("url").distinct().count() == len(urls)
    # every stored page decoded: phash present and non-null
    assert pages.filter(F.col("phash").isNull()).count() == 0


def test_empty_batch_is_noop(spark, stream_corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("stream_wh2"))
    seed_dir = str(tmp_path_factory.mktemp("seed_drop2"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt2"))
    engine = _mk_engine(spark, stream_corpus, wh)
    engine.catalog.overwrite("frontier", engine.discover().limit(0), properties={"round": 0})

    stream = SeedStream(engine, seed_dir, rounds_per_batch=2)
    spark.createDataFrame([], "portal string, url string").coalesce(1).write.mode(
        "append"
    ).parquet(seed_dir)
    q = stream.start(ckpt)
    q.awaitTermination(120)
    assert engine.pages().count() == 0
