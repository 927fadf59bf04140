"""The crawl engine: discovery + round-based scheduling loop.

Replaces the reference's thread-per-portal pull pipeline
(src/crawler.py:65-131 driving src/harvester.py:187-366) with a
driver loop of SCHEDULING ROUNDS, all state in snapshot-committed
tables:

    discover (explode sitemaps, regex-filter, empty-skip, dedup)
      -> anti-join seen (exact + bloom prefilter)     [O-13]
      -> window-rank politeness admission             [O-37]
      -> fetch (vectorized synthetic fetch UDF)       [O-4]
      -> status routing: store / retry-once / drop    [O-14, O-38]
      -> parse+validate payload (decode, phash, PSNR) [O-19/O-20 analog]
      -> keyword match -> bridge rows                 [O-18, O-28]
      -> commit: pages, seen, bridge, lineage, frontier snapshots

Every round ends in one atomic snapshot per table; resume = read the
frontier manifest's round property and continue (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Ordering fidelity: within a portal the admission order is strictly
(priority, sitemap_seq, loc_seq) — the reference's sitemap document
order (src/harvester.py:1132-1152, 1234-1311). Across portals the
reference interleaves by wall-clock thread scheduling, i.e. is itself
nondeterministic, so equality is asserted per portal exactly like the
reference's own tests (tests/test_harvester.py:301, 394).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.functions.keywords import keywords_as_rows, make_keyword_matcher
from crawler_spark.functions.payload import parse_payload, synth_fetch_bytes
from crawler_spark.functions.urls import with_url_identity
from crawler_spark.operators import politeness, routing, seen as seen_ops
from crawler_spark.storage import SnapshotCatalog

# Which sitemap names each portal style walks:
# StepStone: sitemap-index entries matching listings-[0-9]+
#   (src/harvester.py:1135), Karriere: robots-listed sitemaps matching
#   sitemap-jobs (src/harvester.py:1250).
STYLE_SITEMAP_FILTER = {
    "stepstone": r".*listings-[0-9]+.*",
    "karriere": r".*sitemap-jobs.*",
}


@dataclass
class CrawlEngine:
    spark: SparkSession
    catalog: SnapshotCatalog
    seed_pages: DataFrame
    sitemap_entries: DataFrame
    robots_rules: DataFrame
    keywords: DataFrame
    round_duration: float = 60.0
    use_bloom: bool = True
    n_salt: int = 8
    store_payload: bool = True
    _matcher: object = field(default=None, repr=False)

    # ------------------------------------------------------------ tables
    def frontier(self) -> DataFrame:
        return self.catalog.read("frontier", schemas.FRONTIER)

    def seen(self) -> DataFrame:
        return self.catalog.read("seen", schemas.SEEN)

    def pages(self) -> DataFrame:
        return self.catalog.read("pages", schemas.PAGES)

    def bridge(self) -> DataFrame:
        # distinct: replays of a partially-committed round may re-append
        return self.catalog.read("bridge", schemas.BRIDGE).distinct()

    def lineage(self) -> DataFrame:
        return self.catalog.read("lineage", schemas.LINEAGE)

    # --------------------------------------------------------- discovery
    def discover(self) -> DataFrame:
        """Walk the sitemap structure into the initial frontier.

        Reproduces: regex filtering of sitemap names per portal style
        (src/harvester.py:1135, 1250), skipping empty/whitespace <loc>
        entries (src/harvester.py:1303-1307), robots disallow rules,
        and first-occurrence dedup of URLs listed in several sitemaps
        (the reference's seen-set makes later occurrences no-ops).
        """
        style = F.regexp_extract(F.col("portal"), r"^([a-z]+)_", 1)
        eligible = (
            self.robots_rules.select(
                "portal", "disallow", F.explode("sitemap_urls").alias("sitemap_url")
            )
            .withColumn("style", style)
            .filter(
                (
                    (F.col("style") == "stepstone")
                    & F.col("sitemap_url").rlike(STYLE_SITEMAP_FILTER["stepstone"])
                )
                | (
                    (F.col("style") == "karriere")
                    & F.col("sitemap_url").rlike(STYLE_SITEMAP_FILTER["karriere"])
                )
            )
        )

        entries = (
            self.sitemap_entries.join(
                F.broadcast(eligible), on=["portal", "sitemap_url"], how="inner"
            )
            .filter(F.col("url").isNotNull() & (F.trim(F.col("url")) != ""))
            .withColumn("url", F.trim(F.col("url")))
            # robots disallow: drop URLs whose path starts with a rule
            .withColumn("path", F.parse_url(F.col("url"), F.lit("PATH")))
            .filter(
                F.col("disallow").isNull()
                | ~F.exists("disallow", lambda d: F.col("path").startswith(d))
            )
        )

        # first-occurrence-wins dedup across sitemaps
        w = Window.partitionBy("url").orderBy("portal", "sitemap_seq", "loc_seq")
        entries = (
            entries.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "path", "disallow", "style", "sitemap_url")
        )

        return (
            with_url_identity(entries)
            .withColumn("depth", F.lit(0))
            .withColumn("priority", F.lit(0))
            .withColumn("attempt", F.lit(0))
            .withColumn("retry_round", F.lit(0))
            .withColumn("state", F.lit("pending"))
            .select(*[f.name for f in schemas.FRONTIER.fields])
        )

    def bootstrap(self) -> None:
        self.catalog.overwrite("frontier", self.discover(), properties={"round": 0})

    # ------------------------------------------------------------ rounds
    def current_round(self) -> int:
        return int(self.catalog.properties("frontier").get("round", 0))

    def _keyword_matcher(self):
        if self._matcher is None:
            # harvest path matches caption with title_only=False
            # (src/harvester.py:368-385 passes title_only=False)
            self._matcher = make_keyword_matcher(
                keywords_as_rows(self.keywords), title_only=False
            )
        return self._matcher

    def run_round(self) -> dict:
        """Execute one scheduling round; returns round metrics."""
        r = self.current_round()
        frontier = self.frontier()
        seen = self.seen()
        bloom = (
            self.catalog.read("seen_bloom", seen_ops.BLOOM_SCHEMA) if self.use_bloom else None
        )

        pending = frontier.filter(
            (F.col("state") == "pending") & (F.col("retry_round") <= F.lit(r))
        )
        # Exact URL-seen anti-join (+ bloom prefilter). Also reconciles
        # rows a crashed run stored but never flipped in the frontier.
        unseen = seen_ops.filter_unseen(pending, seen, bloom)
        admitted = politeness.admit(
            unseen, self.robots_rules, self.round_duration, self.n_salt
        )

        # ---- fetch: join the corpus (the synthetic web) on url.
        corpus = self.seed_pages.select(
            "url",
            "image_id",
            F.col("w").alias("w"),
            F.col("h").alias("h"),
            "fmt",
            "caption",
            F.col("http_status"),
            "transient",
            F.col("phash").alias("expected_phash"),
        )
        fetched = admitted.join(corpus, on="url", how="left").withColumn(
            "transient", F.coalesce(F.col("transient"), F.lit(False))
        )
        routed = routing.route(routing.effective_status(fetched)).cache()

        # ---- stored pages: materialize payload, decode+validate, match.
        stored = routed.filter(F.col("outcome") == routing.OUT_STORE)
        payload = stored.withColumn(
            "bytes", synth_fetch_bytes("image_id", "w", "h", "fmt")
        ).withColumn(
            "parsed", parse_payload("bytes", "w", "h", "fmt", "image_id")
        )

        # per-portal dense id continuation (reference AUTOINCREMENT analog,
        # src/harvester.py:63-79): base = max stored id per portal so far.
        base = (
            self.pages()
            .groupBy("portal")
            .agg(F.max("id").alias("_base"))
        )
        w_portal = Window.partitionBy("portal").orderBy("admit_rank", "url")
        new_pages = (
            payload.join(F.broadcast(base), on="portal", how="left")
            .withColumn(
                "id", F.row_number().over(w_portal) + F.coalesce(F.col("_base"), F.lit(0))
            )
            .select(
                "id",
                "portal",
                "url",
                "fp",
                F.col("status").alias("http_status"),
                "image_id",
                (F.col("bytes") if self.store_payload else F.lit(None).cast("binary")).alias(
                    "bytes"
                ),
                "w",
                "h",
                "fmt",
                "caption",
                F.col("parsed.phash").alias("phash"),
                F.lit(r).cast("int").alias("round"),
                "attempt",
                F.lit(None).cast("string").alias("filename"),
            )
        ).cache()

        matcher = self._keyword_matcher()
        new_bridge = (
            new_pages.withColumn(
                "matched",
                matcher(
                    F.col("caption"),
                    F.lit(None).cast("string"),
                    F.lit(None).cast("string"),
                ),
            )
            .select("portal", F.col("id").alias("page_id"), F.explode("matched").alias("keyword_id"))
            .select("keyword_id", "page_id", "portal")
        )

        # host_hash comes from the frontier so seen/bloom bucketing
        # matches the politeness partitioning exactly.
        new_seen = new_pages.join(
            frontier.select("url", "host_hash"), on="url", how="inner"
        ).select("fp", "url", "host_hash", F.lit(r).cast("int").alias("first_round"))

        # ---- lineage metrics per host (the ads/min log analog,
        # src/harvester.py:318-326, as queryable rows).
        lineage = routed.groupBy("host").agg(
            F.lit(r).cast("int").alias("round"),
            F.count("*").alias("scheduled"),
            F.sum(F.when(F.col("status").isNotNull(), 1).otherwise(0)).alias("fetched"),
            F.sum(F.when(F.col("outcome") == routing.OUT_STORE, 1).otherwise(0)).alias("stored"),
            F.sum(F.when(F.col("outcome") == routing.OUT_RETRY, 1).otherwise(0)).alias("retried"),
            F.sum(F.when(F.col("outcome") == routing.OUT_DROP, 1).otherwise(0)).alias("dropped"),
            F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("errors"),
        ).select(*[f.name for f in schemas.LINEAGE.fields])

        # ---- frontier state updates
        # Reconciliation: pending rows already in the seen set (a
        # replayed half-round, or a re-bootstrap over an existing
        # warehouse — the reference's harvest re-run just skips seen
        # work, src/harvester.py:133-177) flip to stored so the
        # frontier drains instead of spinning empty rounds.
        reconciled = pending.join(
            seen.select("fp", "url"), on=["fp", "url"], how="left_semi"
        ).select(
            "url",
            F.lit("stored").alias("_state"),
            F.col("attempt").alias("_attempt"),
            F.lit(None).cast("int").alias("_retry_round"),
        )
        updates = routing.with_retry_round(routed, r, self.round_duration).select(
            "url",
            F.when(F.col("outcome") == routing.OUT_STORE, "stored")
            .when(F.col("outcome") == routing.OUT_RETRY, "pending")
            .otherwise("dropped")
            .alias("_state"),
            F.when(F.col("outcome") == routing.OUT_RETRY, F.col("attempt") + 1)
            .otherwise(F.col("attempt"))
            .alias("_attempt"),
            F.when(F.col("outcome") == routing.OUT_RETRY, F.col("retry_round"))
            .otherwise(F.lit(None))
            .cast("int")
            .alias("_retry_round"),
        ).unionByName(reconciled)
        new_frontier = (
            frontier.join(updates, on="url", how="left")
            .select(
                *[
                    c
                    for c in frontier.columns
                    if c not in ("state", "attempt", "retry_round")
                ],
                F.coalesce(F.col("_state"), F.col("state")).alias("state"),
                F.coalesce(F.col("_attempt"), F.col("attempt")).cast("int").alias("attempt"),
                F.coalesce(F.col("_retry_round"), F.col("retry_round"))
                .cast("int")
                .alias("retry_round"),
            )
            .select(*[f.name for f in schemas.FRONTIER.fields])
        )

        # ---- commit (order: pages, bridge, seen, bloom, lineage, frontier;
        # merge_insert on pages makes a replayed half-round idempotent).
        self.catalog.merge_insert("pages", new_pages, key="url", schema=schemas.PAGES)
        self.catalog.append("bridge", new_bridge)
        self.catalog.append("seen", new_seen)
        if self.use_bloom:
            self.catalog.overwrite(
                "seen_bloom", seen_ops.update_blooms(bloom, new_seen)
            )
        self.catalog.append("lineage", lineage)
        self.catalog.overwrite("frontier", new_frontier, properties={"round": r + 1})

        counts = {
            row["outcome"]: row["n"]
            for row in routed.groupBy("outcome").agg(F.count("*").alias("n")).collect()
        }
        routed.unpersist()
        new_pages.unpersist()
        return {
            "round": r,
            "scheduled": sum(counts.values()),
            "stored": counts.get(routing.OUT_STORE, 0),
            "retried": counts.get(routing.OUT_RETRY, 0),
            "dropped": counts.get(routing.OUT_DROP, 0),
        }

    def pending_count(self) -> int:
        return self.frontier().filter(F.col("state") == "pending").count()

    def run(self, max_rounds: int = 1000) -> list[dict]:
        """Run rounds until the frontier drains (or max_rounds)."""
        metrics = []
        for _ in range(max_rounds):
            if self.pending_count() == 0:
                break
            metrics.append(self.run_round())
        return metrics
