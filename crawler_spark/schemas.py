"""Table schemas for the engine's state and input tables.

Maps the reference's SQLite schema (advertisements:
src/harvester.py:63-79; keywords + keyword_advertisement:
src/keyword_manager.py:36-58) onto Spark StructTypes, with the
payload columns per BASELINE.json input_hint:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- inputs

# The crawlable corpus: ground truth a synthetic "fetch" reads from.
# Analog of the portal websites behind requests.get
# (src/harvester.py:428-442). Image bytes are NOT stored here — the
# fetch stage materializes them deterministically from image_id
# (keeps seed tables payload-light; at 10^10 the corpus would be the
# real web).
SEED_PAGES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("portal", StringType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), True),
        StructField("http_status", IntegerType(), False),
        # transient=True: first fetch returns 5xx, the single retry
        # (src/harvester.py:1087-1096) succeeds with 200.
        StructField("transient", BooleanType(), False),
        StructField("phash", LongType(), False),
        # URLs this page links to (the in-page discovery source for
        # depth>0 crawling; [] for leaf pages).
        StructField("outlinks", ArrayType(StringType()), True),
    ]
)

# Discovery structure: sitemap-index -> urlset entries in document
# order (src/harvester.py:1118-1154 StepStone; 1206-1349 Karriere).
SITEMAP_ENTRIES = StructType(
    [
        StructField("portal", StringType(), False),
        StructField("sitemap_url", StringType(), False),
        StructField("sitemap_seq", IntegerType(), False),
        StructField("loc_seq", IntegerType(), False),
        StructField("url", StringType(), True),  # nullable: empty <loc> entries
    ]
)

# Politeness config per host (etc/config.yml:1-16 + robots
# Crawl-delay, src/harvester.py:420-423).
ROBOTS_RULES = StructType(
    [
        StructField("host", StringType(), False),
        StructField("portal", StringType(), False),
        StructField("requests_per_minute", IntegerType(), False),
        StructField("robots_crawl_delay", DoubleType(), True),
        StructField("retry_timeout_min", IntegerType(), False),
        StructField("sitemap_urls", ArrayType(StringType()), True),
        StructField("disallow", ArrayType(StringType()), True),
        # Allow rules: REP longest-match, Allow wins length ties
        # (Protego semantics the reference delegates to,
        # src/harvester.py:405-410).
        StructField("allow", ArrayType(StringType()), True),
    ]
)

# Keyword patterns (src/keyword_manager.py:36-45, etc/config.yml:17-121).
KEYWORDS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("title", StringType(), False),
        StructField("search", StringType(), False),
        StructField("case_sensitive", BooleanType(), False),
    ]
)

# Export filter config (etc/config.yml:122-156;
# src/advert_exporter.py:588-656).
EXPORT_FILTERS = StructType(
    [
        StructField("category", StringType(), False),
        StructField("category_seq", IntegerType(), False),
        StructField("filter_name", StringType(), False),
        StructField("filter_seq", IntegerType(), False),
        StructField("pattern", StringType(), False),
        StructField("catch_all", BooleanType(), False),
        StructField("case_sensitive", BooleanType(), False),
    ]
)

# ---------------------------------------------------------------- state

# The frontier: OPEN work only (a delta table). Rows leave when they
# are stored, dropped, or found in the seen set; retries re-enter with
# a future retry_round. Keeping only pending work means each round's
# snapshot write is O(remaining), not O(all-ever-discovered) — at
# 10^10 URLs the closed rows live in pages/seen/lineage, never
# rewritten round over round.
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canon_url", StringType(), False),
        StructField("fp", LongType(), False),  # 64-bit fingerprint of verbatim url
        StructField("host", StringType(), False),
        StructField("host_hash", IntegerType(), False),
        StructField("portal", StringType(), False),
        StructField("sitemap_seq", IntegerType(), False),
        StructField("loc_seq", IntegerType(), False),
        StructField("depth", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("retry_round", IntegerType(), False),  # earliest round eligible
    ]
)

# URL-seen set: only status-200 + non-empty payload counts as seen
# (src/harvester.py:133-166).
SEEN = StructType(
    [
        StructField("fp", LongType(), False),
        StructField("url", StringType(), False),
        StructField("host_hash", IntegerType(), False),
        StructField("first_round", IntegerType(), False),
    ]
)

# Stored pages — analog of `advertisements` (src/harvester.py:63-79)
# with the image+caption payload.
PAGES = StructType(
    [
        StructField("id", LongType(), False),  # per-portal dense crawl order
        StructField("portal", StringType(), False),
        StructField("url", StringType(), False),
        StructField("fp", LongType(), False),
        StructField("http_status", IntegerType(), False),
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), False),
        StructField("round", IntegerType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("filename", StringType(), True),
    ]
)

# Exported-filename sidecar, keyed by url. The reference UPDATEs
# pages.filename in place (src/advert_exporter.py:402-405); at 100 TB
# the pages table IS the payload table, so recording one string per
# exported row must not rewrite it — exports upsert this thin table
# instead and reads join it back (export.pages_with_filenames).
FILENAMES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("filename", StringType(), False),
    ]
)

# keyword_advertisement bridge (src/keyword_manager.py:48-58).
BRIDGE = StructType(
    [
        StructField("keyword_id", LongType(), False),
        StructField("page_id", LongType(), False),
        StructField("portal", StringType(), False),
    ]
)

# Per-partition lineage/metrics rows — the engine's throughput +
# resume evidence (replaces the ads/min log, src/harvester.py:318-326).
LINEAGE = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("host", StringType(), False),
        StructField("scheduled", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("stored", LongType(), False),
        StructField("retried", LongType(), False),
        StructField("dropped", LongType(), False),
        StructField("errors", LongType(), False),
    ]
)
