"""Continuous seed ingestion: Structured Streaming -> scheduling rounds.

The reference is a batch program: one `crawler.py harvest` run walks
the configured portals once (src/crawler.py:36-146). The streaming
front-end generalizes that to a LIVE frontier: new seed-URL files
landing in a directory become micro-batches; each batch's URLs are
canonicalized/fingerprinted, deduped against the frontier AND the
seen set, merged into the frontier, and the engine then runs
scheduling rounds for the new work.

Why ``foreachBatch`` rather than a fully streaming pipeline: a
scheduling round is a multi-table transaction (pages/seen/bridge/
lineage/frontier snapshots must commit together, SURVEY §2.9), which
is exactly the contract ``foreachBatch`` provides — the batch function
runs once per epoch with a consistent DataFrame, and the snapshot
catalog supplies the atomicity. Watermark/event-time operators are
unnecessary: frontier work has no event time, only arrival order.

At cluster scale the same code runs against a Kafka source (seed URLs
as messages) by swapping ``readStream.format``; the batch body is
source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.functions.urls import with_url_identity_native


class SeedStream:
    """Watch ``seed_dir`` for parquet files of (portal, url) seeds and
    feed them into a :class:`~crawler_spark.operators.frontier.CrawlEngine`.
    """

    def __init__(self, engine, seed_dir: str, rounds_per_batch: int = 4):
        self.engine = engine
        self.seed_dir = seed_dir
        self.rounds_per_batch = rounds_per_batch
        self.batches = 0

    # ---------------------------------------------------------- batch body
    def process_batch(self, seeds: DataFrame, epoch_id: int) -> None:
        """Merge a seed micro-batch into the frontier, then schedule.

        Dedup is two-stage like the engine's own discovery: URLs
        already open in the frontier are dropped (first-occurrence
        wins), URLs already harvested are dropped via the seen set —
        the reference's ``advertisement_exists`` re-run semantics
        (src/harvester.py:133-177).
        """
        engine = self.engine
        if seeds.isEmpty():
            return
        new = (
            with_url_identity_native(
                seeds.filter(F.col("url").isNotNull() & (F.trim(F.col("url")) != ""))
                .withColumn("url", F.trim(F.col("url")))
                .dropDuplicates(["url"])
            )
            .withColumn("sitemap_seq", F.lit(0))
            # streamed seeds carry no document order; the admission
            # window's url tiebreaker (politeness.ORDER_COLS) makes
            # per-host order deterministic anyway
            .withColumn("loc_seq", F.lit(0))
            .withColumn("depth", F.lit(0))
            .withColumn("priority", F.lit(0))
            .withColumn("attempt", F.lit(0))
            .withColumn("retry_round", F.lit(engine.current_round()))
            .select(*[f.name for f in schemas.FRONTIER.fields])
        )
        frontier = engine.frontier()
        seen = engine.seen()
        additions = (
            new.join(frontier.select("url"), on="url", how="left_anti")
            .join(seen.select("url"), on="url", how="left_anti")
        )
        engine.catalog.overwrite(
            "frontier",
            frontier.unionByName(additions),
            properties={"round": engine.current_round()},
        )
        engine.run(max_rounds=self.rounds_per_batch)
        self.batches += 1

    # ------------------------------------------------------------- driving
    def start(self, checkpoint_dir: str, available_now: bool = True):
        """Build and start the streaming query.

        ``available_now`` processes everything currently in the
        directory then stops — the batch-test mode; pass False for a
        continuously running query.
        """
        spark = self.engine.spark
        stream = (
            spark.readStream.schema("portal string, url string")
            .parquet(self.seed_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
