"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship scheduling pipeline on
sf0.001.  ``queries()`` exposes one entry per implemented operator
from SURVEY.md §2 (plus the training-data operators), each running the
REAL engine code (crawler_spark.*) over the driver's parquet tables;
``oracle_sql()`` gives the DuckDB twin for every SQL-expressible one.

Column names and numeric types are aligned on both sides (driver
compares row-count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Keyword table over the documents vocabulary (same shape as the
# reference's etc/config.yml:17-121 keywords; 'Spark' is the
# case-sensitivity trap — documents are lowercase, so it never hits).
DOC_KEYWORDS = [
    (1, "Join", r"join", False),
    (2, "Hash", r"\bhash\b", False),
    (3, "WindowAgg", r"window\s+(agg|sort)", False),
    (4, "SparkCS", r"Spark", True),
    (5, "MergeBatch", r"merge batch", False),
    (6, "Scan", r"\bscan\b", False),
]

# Export filter config over the documents vocabulary (reference
# etc/config.yml:122-156 shape): category "size" has a catch-all,
# category "speed" does not (rows matching neither fast nor slow get
# no part for it — src/advert_exporter.py:547-586 semantics).
DOC_FILTERS = [
    ("size", 0, "big_docs", 0, r"\bbig\b", False, False),
    ("size", 0, "small_docs", 1, r"\bsmall\b", False, False),
    ("size", 0, "any_size", 2, r".*", True, False),
    ("speed", 1, "fast_docs", 0, r"\bfast\b", False, False),
    ("speed", 1, "slow_docs", 1, r"\bslow\b", False, False),
]

_CAT1_SQL = (
    "CASE WHEN regexp_matches(text, '\\bbig\\b') THEN 'big_docs' "
    "WHEN regexp_matches(text, '\\bsmall\\b') THEN 'small_docs' "
    "ELSE 'any_size' END"
)
_CAT2_SQL = (
    "CASE WHEN regexp_matches(text, '\\bfast\\b') THEN 'fast_docs' "
    "WHEN regexp_matches(text, '\\bslow\\b') THEN 'slow_docs' "
    "ELSE NULL END"
)

# documents ∪ synthetic duplicates/near-duplicates (the driver corpus
# has no duplicate texts, so dedup inputs are constructed in-query,
# identically on both sides).
_DUP_BASE_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""
_NEARDUP_BASE_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS doc_id,
           regexp_replace(text, '^[a-z]+', 'zzz') AS text
    FROM documents WHERE doc_id % 20 = 0
"""


def _dup_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return docs.unionByName(dups)


def _neardup_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    nd = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"^[a-z]+", "zzz").alias("text"),
    )
    return docs.unionByName(nd)


def _events_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events mapped onto the frontier shape the scheduler operates on."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("event_id").cast("string").alias("url"),
        F.col("event_id").alias("fp"),
        F.pmod(F.col("user_id"), F.lit(32)).cast("int").alias("host_hash"),
        F.col("user_id").alias("host"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("sitemap_seq"),
        F.col("event_id").alias("loc_seq"),
    )


# ---------------------------------------------------------------- queries


def q_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-13/O-29: exact URL-seen anti-join with the per-bucket bloom
    prefilter in the loop (crawler_spark.operators.seen)."""
    from crawler_spark.operators import seen as seen_ops

    frontier = _events_frontier(spark, sf_dir)
    seen = frontier.filter(F.col("event_type").isin("click", "view")).select(
        "fp", "url", "host_hash"
    )
    empty_bloom = spark.createDataFrame([], seen_ops.BLOOM_SCHEMA)
    bloom = seen_ops.update_blooms(empty_bloom, seen)
    out = seen_ops.filter_unseen(frontier, seen.select("fp", "url"), bloom)
    return out.select("event_id", "event_type")


def q_politeness_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-37: window-ranked per-host token admission (two-phase salted
    top-k, crawler_spark.operators.politeness.admit)."""
    from crawler_spark.operators import politeness

    frontier = _events_frontier(spark, sf_dir)
    robots = (
        frontier.select("host").distinct()
        .withColumn(
            "requests_per_minute",
            (F.pmod(F.col("host"), F.lit(5)) + 1).cast("double"),
        )
        .withColumn("robots_crawl_delay", F.lit(None).cast("double"))
        .withColumn("retry_timeout_min", F.lit(5).cast("int"))
    )
    admitted = politeness.admit(frontier, robots, round_duration=60.0, n_salt=8)
    return admitted.select(
        "event_id", "user_id", F.col("admit_rank").cast("long").alias("admit_rank")
    )


def q_status_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-14/O-38: HTTP status routing incl. null->404 and the
    transient-5xx retry-once path (crawler_spark.operators.routing)."""
    from crawler_spark.operators import routing

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", 503)
        .when(F.col("event_type") == "signup", 410)
        .when(F.col("event_type") == "purchase", 404)
        .when(F.col("event_type") == "view", 200)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("http_status"),
        (F.col("event_id") % 2).cast("int").alias("attempt"),
        (F.col("value") > 5).alias("transient"),
    )
    routed = routing.route(routing.effective_status(ev))
    return routed.select("event_id", F.col("status").cast("long").alias("status"), "outcome")


def q_keyword_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-18/O-28: fused regex keyword matcher (pandas UDF; title_only
    semantics of src/keyword_manager.py:124-193) -> exploded bridge."""
    from crawler_spark.functions.keywords import make_keyword_matcher

    docs = _t(spark, sf_dir, "documents")
    matcher = make_keyword_matcher(
        [(k[0], k[2], k[3]) for k in DOC_KEYWORDS], title_only=True
    )
    return (
        docs.withColumn(
            "matched",
            matcher(F.col("text"), F.lit(None).cast("string"), F.lit(None).cast("string")),
        )
        .select("doc_id", F.explode("matched").alias("keyword_id"))
    )


def q_keyword_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-17+O-25+O-27: keyword-presence semi-join + broadcast join +
    id-ordered '; '-joined titles (crawler_spark.operators.export)."""
    from crawler_spark.operators.export import with_keyword_titles

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("source").alias("portal"), F.col("doc_id").alias("id"), "text"
    )
    bridge = q_keyword_match(spark, sf_dir).join(
        docs.select("doc_id", F.col("source").alias("portal")), on="doc_id"
    ).select("keyword_id", F.col("doc_id").alias("page_id"), "portal")
    keywords = spark.createDataFrame(
        [(k[0], k[1]) for k in DOC_KEYWORDS], "id long, title string"
    )
    out = with_keyword_titles(pages, bridge, keywords)
    return out.select(F.col("id").alias("doc_id"), "related_keywords")


def q_filter_labeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-21: first-match-wins category labeling with catch-all fallback
    (crawler_spark.functions.filters + operators.export.label_pages)."""
    from crawler_spark.operators.export import label_pages

    docs = _t(spark, sf_dir, "documents")
    labeled = label_pages(docs, DOC_FILTERS, text_col="text")
    return labeled.select("doc_id", "cat1", "cat2")


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-11: hierarchical per-directory counts as ROLLUP(cat1, cat2)."""
    from crawler_spark.operators.export import label_pages, rollup_counts

    docs = _t(spark, sf_dir, "documents")
    return rollup_counts(label_pages(docs, DOC_FILTERS, text_col="text"))


def q_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-31: per-filter match counts during labeling."""
    from crawler_spark.operators.export import category_counts, label_pages

    docs = _t(spark, sf_dir, "documents")
    return category_counts(label_pages(docs, DOC_FILTERS, text_col="text"))


def q_portal_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-22/O-24: portal-name derivation + filename format, all native
    JVM expressions (crawler_spark.operators.export)."""
    from crawler_spark.operators.export import portal_name

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("source"), F.lit("Advertisement")))
        .when(F.col("doc_id") % 3 == 1, F.lit(""))
        .otherwise(F.lit(None))
        .alias("ad_type"),
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/jobs/"), F.col("doc_id")
        ).alias("url"),
    )
    out = docs.withColumn("portal", portal_name(F.col("ad_type"), F.col("url")))
    return out.select(
        "doc_id",
        "portal",
        F.format_string("%s_%05d.html", F.col("portal"), F.col("doc_id")).alias("filename"),
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-23 graft extension: RFC-3986 canonicalization Arrow UDF
    (upper-case scheme/host, default port, fragment all normalized)."""
    from crawler_spark.functions.urls import canonicalize_udf, host_udf

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.upper("source"),
            F.lit(".EXAMPLE.COM:443/jobs/"),
            F.col("doc_id"),
            F.lit("#frag"),
        ).alias("url"),
    )
    return docs.select(
        "doc_id",
        canonicalize_udf(F.col("url")).alias("canon_url"),
        host_udf(F.col("url")).alias("host"),
    )


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data text ops: token counts, ratios, quality score —
    all native Spark SQL expressions (crawler_spark.functions.text)."""
    from crawler_spark.functions import text as T

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(t).cast("long").alias("n_tokens"),
        T.bpe_ish_token_count(t).cast("long").alias("n_tokens_bpe"),
        F.round(T.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(T.mean_word_len(t), 6).alias("mean_word_len"),
        F.round(T.quality_score(t), 6).alias("quality"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang vs n-gram heuristic."""
    from crawler_spark.functions import text as T

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint (oracle-reproducible)."""
    from crawler_spark.functions.text import rolling_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint"))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: min-id representative per identical text."""
    from crawler_spark.operators.dedup import exact_dedup

    return exact_dedup(_dup_base(spark, sf_dir)).select("doc_id")


def q_exact_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dup pairs (kept_id, dup_id)."""
    from crawler_spark.operators.dedup import exact_dup_pairs

    return exact_dup_pairs(_dup_base(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs (exact, shingle self-join).

    Runs on a deterministic quarter of the corpus (doc_id % 4 = 0,
    which contains every planted near-dup: plants are doc_id % 20 = 0
    and their +10000 copies, both ≡ 0 mod 4) with shingling capped to
    the first 40 tokens per document: the all-pairs-sharing-a-shingle
    join is the GROUND-TRUTH twin, deliberately not the scale path —
    its cost grows with sum(shingle_count^2), so the exact check runs
    on a bounded sample while minhash_lsh covers the full corpus. The
    oracle SQL applies the identical sample and token cap, so oracle
    equality is preserved by construction.
    """
    from crawler_spark.operators.dedup import ngram_jaccard_pairs

    base = _neardup_base(spark, sf_dir).filter(F.col("doc_id") % 4 == 0)
    return ngram_jaccard_pairs(base, n=3, threshold=0.6, max_tokens=40)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Oracle-checked against the exact all-pairs Jaccard SQL on the
    planted-duplicate base: every planted pair has jaccard 1.0, so
    every band collides and LSH recall on qualifying pairs is exactly
    1 — the LSH output provably equals the exact twin. (xxhash64
    signatures themselves are not DuckDB-expressible; the equality of
    the RESULT is what the oracle pins.)
    """
    from crawler_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _dup_base(spark, sf_dir), n=3, n_hashes=64, bands=16, threshold=0.9
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash duplicate pairs (Hamming 0) via quadrant blocking.

    Oracle: identical texts hash to identical fingerprints (recall 1
    at hamming 0), and the verify_exact step removes lossy collisions
    (the corpus has built-in near-dup docs differing by one token
    that tie every bit vote), so the verified output equals the
    text-equality pair relation. The near-dup regime (hamming <= 3)
    is exercised in tests/test_dedup.py.
    """
    from crawler_spark.operators.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(_dup_base(spark, sf_dir), max_hamming=0, verify_exact=True)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table (broadcast
    nested-loop + per-query window; crawler_spark.operators.similarity)."""
    from crawler_spark.operators.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk_bruteforce(emb, queries, k=5)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")


_ANN_SCALES = [2.0, 4.0, 8.0, 16.0, 32.0]  # powers of 2: scaling is FP-exact

# Enough queries that brute force O(N x Q) visibly loses to the ANN
# paths' O(N + candidates) — at Q=8 a full scan of the test corpus is
# trivially fast and the comparison says nothing.
_ANN_N_QUERIES = 64

# Brute-force exact top-k over embeddings ∪ scaled copies — the shared
# oracle for every ANN variant (LSH, IVF): planted copies pin recall.
_ANN_ORACLE_SQL = (
    "WITH sc(j, s) AS (VALUES (0, 2.0), (1, 4.0), (2, 8.0), (3, 16.0), (4, 32.0)), "
    "base AS ("
    "  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
    "  UNION ALL "
    "  SELECT 20000 + sc.j + vec_id * 5, "
    "         list_transform(embedding::DOUBLE[], x -> x * sc.s) "
    "  FROM embeddings, sc WHERE vec_id < 64), "
    "q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 64), "
    "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
    "  round(list_dot_product(e.v, q.qv) / "
    "        (sqrt(list_dot_product(e.v, e.v)) * "
    "         sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
    "  FROM base e, q WHERE e.vec_id != q.qid) "
    "SELECT query_id, rank, neighbor_id, cosine FROM ("
    "  SELECT *, row_number() OVER ("
    "    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s) "
    "WHERE rank <= 5"
)


def _ann_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings (as double) ∪ 5 scaled copies of each query vector.

    Positive scaling preserves both the exact cosine (== 1.0 against
    the original) and every hyperplane sign, so each query's true
    top-5 = its 5 planted copies, LSH recall on them is exactly 1,
    and the approximate result provably equals the brute-force SQL
    oracle. Max natural pairwise cosine in the corpus is ~0.51, far
    below the tie at 1.0.
    """
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    qsrc = emb.filter(F.col("vec_id") < _ANN_N_QUERIES)

    def scaled(s: float):
        # closure, NOT a two-arg lambda: transform passes (elem, index)
        # to binary lambdas, which would silently rebind a default arg
        return F.transform("embedding", lambda x: x * F.lit(s)).alias("embedding")

    base = emb
    for j, s in enumerate(_ANN_SCALES):
        base = base.unionByName(
            qsrc.select((F.lit(20000 + j) + F.col("vec_id") * 5).alias("vec_id"), scaled(s))
        )
    return base


def _ann_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8 query vectors straight from the raw table (identical to
    _ann_base.filter(vec_id < _ANN_N_QUERIES) but without re-evaluating the union)."""
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _ANN_N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("query_vec"),
        )
    )


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (scale path), oracle-checked
    against the brute-force SQL twin via planted scaled copies."""
    from crawler_spark.operators.similarity import cosine_topk_lsh

    base = _ann_base(spark, sf_dir)
    # queries = the original query vectors; reading them from
    # the raw table (not base.filter) avoids re-evaluating the 6-way
    # union on the (broadcast) query side of the bucket join
    queries = _ann_queries(spark, sf_dir)
    out = cosine_topk_lsh(base, queries, k=5, n_planes=6, n_tables=2)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(-Flat) approximate top-k: spherical-kmeans coarse quantizer,
    nearest-cell assignment, n_probe-cell probes. Oracle-checked
    against the brute-force SQL twin: cell assignment is
    scale-invariant, so each query's 5 planted scaled copies share its
    top probe cell and IVF recall on the true top-5 is exactly 1.
    """
    from crawler_spark.operators.similarity import cosine_topk_ivf

    base = _ann_base(spark, sf_dir)
    queries = _ann_queries(spark, sf_dir)
    out = cosine_topk_ivf(base, queries, k=5, n_cells=16, n_probe=4)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane LSH.

    The driver's embeddings have no natural near-dups (max pairwise
    cosine ~0.51), so scaled copies (cosine == 1, identical hyperplane
    signs -> LSH recall 1) are constructed in-query; with threshold
    0.95 the LSH output equals the exact all-pairs oracle.
    """
    from crawler_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    scaled = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2).alias("embedding"),
    )
    return embedding_near_dup_pairs(emb.unionByName(scaled), threshold=0.95, n_planes=6)


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-2/O-3: sitemap XML parsing — build one urlset document per
    source from the documents table, parse it with the engine's
    namespace-aware pandas UDF, posexplode in document order. The
    oracle derives the same (portal, loc_seq, url) relation without
    XML, so the check validates the parse round-trip exactly."""
    from crawler_spark.sources.sitemap_xml import explode_sitemap_documents

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.concat(
            F.lit("<url><loc>https://www."),
            F.col("source"),
            F.lit(".example.com/jobs/"),
            F.col("doc_id"),
            F.lit("</loc></url>"),
        ).alias("frag"),
    )
    xml_docs = docs.groupBy("source").agg(
        F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "frag"))),
                    lambda s: s["frag"],
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    ).select(
        F.col("source").alias("portal"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/sitemap.xml")).alias(
            "sitemap_url"
        ),
        "xml",
    )
    return explode_sitemap_documents(xml_docs).select(
        "portal", F.col("loc_seq").cast("long").alias("loc_seq"), "url"
    )


def q_id_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-15: id-range predicate pushed to the parquet scan (the
    reference's only 'pushdown', src/analyzer.py:247-262; Catalyst
    pushes it into the file source — see PushedFilters in .explain)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") <= 250)).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_export_csv_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-9: the fixed 8-column CSV row shape
    (src/advert_exporter.py:172-181) over the documents graft."""
    from crawler_spark.operators.export import with_keyword_titles

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("source").alias("portal"),
        F.col("doc_id").alias("id"),
        F.col("text").alias("caption"),
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/jobs/"), F.col("doc_id")
        ).alias("url"),
    )
    bridge = q_keyword_match(spark, sf_dir).join(
        docs.select("doc_id", F.col("source").alias("portal")), on="doc_id"
    ).select("keyword_id", F.col("doc_id").alias("page_id"), "portal")
    keywords = spark.createDataFrame(
        [(k[0], k[1]) for k in DOC_KEYWORDS], "id long, title string"
    )
    out = with_keyword_titles(pages, bridge, keywords)
    return out.select(
        F.col("caption").alias("job_title"),
        F.lit(None).cast("string").alias("company_name"),
        F.lit(None).cast("string").alias("location"),
        "url",
        "portal",
        "related_keywords",
        F.format_string("%s_%05d.html", F.col("portal"), F.col("id")).alias("filename"),
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload -> typed features via
    mapInPandas (decode, mean RGB, grayscale std; phash rides inside
    the operator and is pinned in tests/test_multimodal.py).

    Payload bytes are synthesized from doc ids with the
    SQL-reproducible gradient generator (payload.pixels_gradient), so
    a DuckDB oracle regenerates the exact pixels with generate_series
    and re-derives the features — the full binary round-trip
    (encode -> Arrow -> decode -> numpy features) is oracle-checked.
    """
    from crawler_spark.functions.payload import make_fetch_parse_udf, pixels_gradient
    from crawler_spark.operators.multimodal import image_features

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.lit(32).alias("w"),
        F.lit(32).alias("h"),
        F.lit("raw").alias("fmt"),
    )
    fetch = make_fetch_parse_udf(store_bytes=True, validate=False, pixel_fn=pixels_gradient)
    with_bytes = docs.withColumn(
        "bytes", fetch("image_id", "w", "h", "fmt")["bytes"]
    )
    return image_features(with_bytes).select(
        "image_id",
        "w",
        "h",
        F.round(F.col("mean_rgb")[0], 6).alias("mean_r"),
        F.round(F.col("mean_rgb")[1], 6).alias("mean_g"),
        F.round(F.col("mean_rgb")[2], 6).alias("mean_b"),
        F.round("std_gray", 6).alias("std_gray"),
        F.col("decode_ok").cast("long").alias("decode_ok"),
    )


def q_jpeg_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG codec (functions/jpeg.py) as a contract query:
    48 noise+gradient images (pixels_for — the crawl corpus' own
    generator; smooth gradients have near-zero DCT coefficients whose
    phash signs jitter under loss, structured noise does not) ride
    encode->decode through the fused fetch UDF at the crawl's quality
    point, and a row counts as ok only if PSNR >= 40 dB AND its
    decoded phash is within 4 bits of the lossless ground truth
    (computed by the same UDF on fmt='raw').
    The oracle regenerates the per-width row counts — a codec
    regression (psnr drop, phash drift, decode error) loses rows on
    the Spark side and fails the value hash. Reference twin: the
    parser handles the portals' real JPEG payloads
    (src/advert.py:188-381); PSNR >= 40 is the input_hint contract.
    """
    from crawler_spark.functions.payload import make_fetch_parse_udf

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 48).select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        (F.lit(24) + (F.col("doc_id") % 3) * 8).cast("int").alias("w"),
        F.lit(32).alias("h"),
    )
    fetch = make_fetch_parse_udf(store_bytes=False, validate=True)
    both = (
        docs.withColumn("jp", fetch("image_id", "w", "h", F.lit("jpeg")))
        .withColumn("raw", fetch("image_id", "w", "h", F.lit("raw")))
    )
    return (
        both.select(
            F.col("w").cast("long").alias("w"),
            F.col("jp.decode_ok").alias("ok"),
            F.col("jp.psnr_db").alias("psnr"),
            F.bit_count(F.col("jp.phash").bitwiseXOR(F.col("raw.phash"))).alias("dist"),
        )
        .groupBy("w")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.when(F.col("ok") & (F.col("psnr") >= 40.0), 1).otherwise(0)).alias(
                "n_psnr_ok"
            ),
            F.sum(F.when(F.col("dist") <= 4, 1).otherwise(0)).alias("n_phash_close"),
        )
        .select("w", "n_images", "n_psnr_ok", "n_phash_close")
    )


def q_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive JPEG (SOF2, functions/jpeg.py) as a contract query.

    The same 48 noise+gradient images ride encode->decode through the
    fused fetch UDF twice — once as baseline (fmt='jpeg'), once as
    progressive (fmt='jpeg_progressive', a 10-scan spectral-selection
    + successive-approximation script). Because progressive transmits
    the SAME quantized coefficients, the two decodes must be
    bit-identical: a row counts only if both decode ok, the phashes
    are EQUAL (distance 0, stronger than jpeg_fidelity's <=4 pin) and
    the PSNR-vs-ground-truth values agree to 1e-9 dB. The oracle pins
    the per-width counts; any drift in either codec direction (scan
    script, EOB-run coding, refinement bits, coefficient accumulation)
    loses rows and fails the value hash. Reference twin: the parsers
    consume whatever JPEG flavor the portals serve
    (src/advert.py:188-381) — a large share of real web JPEGs are
    progressive.
    """
    from crawler_spark.functions.payload import make_fetch_parse_udf

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 48).select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        (F.lit(24) + (F.col("doc_id") % 3) * 8).cast("int").alias("w"),
        F.lit(32).alias("h"),
    )
    fetch = make_fetch_parse_udf(store_bytes=False, validate=True)
    both = (
        docs.withColumn("jp", fetch("image_id", "w", "h", F.lit("jpeg")))
        .withColumn("pr", fetch("image_id", "w", "h", F.lit("jpeg_progressive")))
    )
    return (
        both.select(
            F.col("w").cast("long").alias("w"),
            (F.col("jp.decode_ok") & F.col("pr.decode_ok")).alias("ok"),
            F.bit_count(F.col("jp.phash").bitwiseXOR(F.col("pr.phash"))).alias("dist"),
            (F.abs(F.col("jp.psnr_db") - F.col("pr.psnr_db")) < 1e-9).alias("psnr_eq"),
        )
        .groupBy("w")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(
                F.when(F.col("ok") & (F.col("dist") == 0) & F.col("psnr_eq"), 1)
                .otherwise(0)
            ).alias("n_identical"),
        )
        .select("w", "n_images", "n_identical")
    )


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video modality end-to-end: 8 MJPEG-in-AVI clips (functions/
    video.py — real RIFF container, every frame an independent
    baseline JPEG) synthesized executor-side, frame-sampled every 3rd
    frame via mapInPandas (operators/multimodal.frame_sample), each
    SAMPLED frame decoded and phash-checked against its ground-truth
    pixels. The oracle pins the per-clip sampled-frame counts and the
    claim that every sampled frame decodes with phash within 4 bits —
    a codec or sampling regression loses rows / flips counts and
    fails the value hash. Like jpeg_fidelity, the count pin rides on
    a computation the SQL engine cannot run.
    """
    import pandas as pd

    from crawler_spark.functions.payload import phash64, pixels_for
    from crawler_spark.functions.video import encode_avi_mjpeg
    from crawler_spark.operators.multimodal import frame_sample

    @F.pandas_udf("binary")
    def make_avi(video_id: pd.Series, n_frames: pd.Series) -> pd.Series:
        out = []
        for vid, n in zip(video_id, n_frames):
            frames = [pixels_for(f"{vid}_f{i}", 32, 24) for i in range(int(n))]
            out.append(encode_avi_mjpeg(frames, fps=12, quality=98))
        return pd.Series(out)

    @F.pandas_udf("long")
    def gt_phash(video_id: pd.Series, frame_idx: pd.Series) -> pd.Series:
        return pd.Series(
            [
                phash64(pixels_for(f"{vid}_f{int(i)}", 32, 24))
                for vid, i in zip(video_id, frame_idx)
            ]
        )

    vids = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 8).select(
        F.concat(F.lit("vid_"), F.col("doc_id").cast("string")).alias("video_id"),
        (F.lit(6) + F.col("doc_id") % 5).cast("int").alias("n_frames"),
        F.lit(12.0).alias("fps"),
        F.lit("avi").alias("fmt"),
    )
    clips = vids.withColumn("bytes", make_avi("video_id", "n_frames"))
    sampled = frame_sample(clips, every_n=3)
    return (
        sampled.withColumn("gt", gt_phash("video_id", "frame_idx"))
        .groupBy("video_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_ok"),
            F.sum(
                F.when(
                    F.bit_count(F.col("phash").bitwiseXOR(F.col("gt"))) <= 4, 1
                ).otherwise(0)
            ).alias("n_phash_close"),
        )
        .select("video_id", "n_sampled", "n_ok", "n_phash_close")
    )


def q_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF frame sampling end-to-end: 8 multi-frame GIF89a
    animations (functions/gif.py — full-canvas opaque frames, real
    LZW) synthesized executor-side, sampled every 3rd frame via the
    SAME frame_sample operator as AVI/MJPEG; only sampled frames'
    LZW payloads are entropy-decoded (the container walk hops the
    rest by length prefix). Because the codec is lossless over its
    palette, the pin is STRICT: every sampled frame's phash must
    EQUAL the ground truth's (distance 0, vs video_frames' <=4).
    The oracle regenerates per-clip sampled counts; a sampling or
    LZW regression loses rows / flips counts and fails the hash.
    """
    import pandas as pd

    from crawler_spark.functions.gif import encode_gif_animation, quantize_332
    from crawler_spark.functions.payload import phash64, pixels_for
    from crawler_spark.operators.multimodal import frame_sample

    @F.pandas_udf("binary")
    def make_gif(video_id: pd.Series, n_frames: pd.Series) -> pd.Series:
        out = []
        for vid, n in zip(video_id, n_frames):
            frames = [
                quantize_332(pixels_for(f"{vid}_f{i}", 32, 24)) for i in range(int(n))
            ]
            out.append(encode_gif_animation(frames, [8] * int(n)))
        return pd.Series(out)

    @F.pandas_udf("long")
    def gt_phash(video_id: pd.Series, frame_idx: pd.Series) -> pd.Series:
        return pd.Series(
            [
                phash64(quantize_332(pixels_for(f"{vid}_f{int(i)}", 32, 24)))
                for vid, i in zip(video_id, frame_idx)
            ]
        )

    vids = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 8).select(
        F.concat(F.lit("gifv_"), F.col("doc_id").cast("string")).alias("video_id"),
        (F.lit(6) + F.col("doc_id") % 5).cast("int").alias("n_frames"),
        F.lit(12.5).alias("fps"),
        F.lit("gif").alias("fmt"),
    )
    clips = vids.withColumn("bytes", make_gif("video_id", "n_frames"))
    sampled = frame_sample(clips, every_n=3)
    return (
        sampled.withColumn("gt", gt_phash("video_id", "frame_idx"))
        .groupBy("video_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("decode_ok").cast("long")).alias("n_ok"),
            F.sum(
                F.when(F.col("phash") == F.col("gt"), 1).otherwise(0)
            ).alias("n_exact"),
        )
        .select("video_id", "n_sampled", "n_ok", "n_exact")
    )


def q_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF codec (functions/gif.py — real variable-width LZW) as a
    contract query with a FULL value oracle.

    64 SQL-reproducible gradient images ride palettize (3-3-2
    quantize) -> LZW encode -> decode through the fused fetch UDF and
    image_features; even ids encode plain, odd ids interlaced (the
    spec's 4-pass row order), and since interlacing only permutes
    storage the features must be identical. The DuckDB oracle
    regenerates the quantized pixels with generate_series (the
    quantizer is integer arithmetic: (c//32)*255//7, (b//64)*255//3)
    and re-derives mean RGB + grayscale std — any LZW/palette/
    deinterlace defect changes decoded bytes and fails the value
    hash. Reference twin: the parsers consume whatever image bytes
    the portals serve (src/advert.py:188-381); GIF is part of that
    real-payload surface.
    """
    from crawler_spark.functions.payload import make_fetch_parse_udf, pixels_gradient
    from crawler_spark.operators.multimodal import image_features

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.lit(32).alias("w"),
        F.lit(32).alias("h"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("gif"))
        .otherwise(F.lit("gif_interlaced"))
        .alias("fmt"),
    )
    fetch = make_fetch_parse_udf(store_bytes=True, validate=False, pixel_fn=pixels_gradient)
    with_bytes = docs.withColumn("bytes", fetch("image_id", "w", "h", "fmt")["bytes"])
    return image_features(with_bytes).select(
        "image_id",
        "w",
        "h",
        F.round(F.col("mean_rgb")[0], 6).alias("mean_r"),
        F.round(F.col("mean_rgb")[1], 6).alias("mean_g"),
        F.round(F.col("mean_rgb")[2], 6).alias("mean_b"),
        F.round("std_gray", 6).alias("std_gray"),
        F.col("decode_ok").cast("long").alias("decode_ok"),
    )


def q_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP codec (functions/bmp.py) as a contract query with a FULL
    value oracle, branched per format: even ids ride lossless 24-bit
    BI_RGB (features must equal the raw gradient's, like
    image_features), odd ids ride 8-bit BI_RLE8 over the 3-3-2
    palettization (features must equal the quantized gradient's, like
    gif_features). Any scanline-padding, BGR-order, palette or RLE
    defect changes decoded bytes and fails the value hash.
    """
    from crawler_spark.functions.payload import make_fetch_parse_udf, pixels_gradient
    from crawler_spark.operators.multimodal import image_features

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
        F.lit(32).alias("w"),
        F.lit(32).alias("h"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("bmp"))
        .otherwise(F.lit("bmp_rle8"))
        .alias("fmt"),
    )
    fetch = make_fetch_parse_udf(store_bytes=True, validate=False, pixel_fn=pixels_gradient)
    with_bytes = docs.withColumn("bytes", fetch("image_id", "w", "h", "fmt")["bytes"])
    return image_features(with_bytes).select(
        "image_id",
        "w",
        "h",
        F.round(F.col("mean_rgb")[0], 6).alias("mean_r"),
        F.round(F.col("mean_rgb")[1], 6).alias("mean_g"),
        F.round(F.col("mean_rgb")[2], 6).alias("mean_b"),
        F.round("std_gray", 6).alias("std_gray"),
        F.col("decode_ok").cast("long").alias("decode_ok"),
    )


def q_image_stream_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-decode image triage (operators/multimodal.image_stream_
    metadata + functions/image_meta.py) as a contract query with a
    FULL value oracle: 64 payloads cycle through jpeg / progressive-
    jpeg-with-EXIF / png / interlaced-gif / rle8-bmp (every header
    walk and the IFD parser on real spliced APP1 bytes), and the last
    8 are truncated to exercise the parse_ok=0 lane. Every output
    field is a deterministic function of doc_id, so the oracle is
    pure CASE arithmetic — a sniffing, marker-walk, IHDR, block-hop,
    DIB or EXIF regression flips a value and fails the hash.
    """
    import pandas as pd

    from crawler_spark.functions.image_meta import attach_exif, build_exif_app1
    from crawler_spark.functions.payload import encode_payload, pixels_gradient
    from crawler_spark.operators.multimodal import image_stream_metadata

    fmts = ["jpeg", "jpeg_progressive", "png", "gif_interlaced", "bmp_rle8"]

    @F.pandas_udf("binary")
    def make_bytes(image_id: pd.Series) -> pd.Series:
        out = []
        for iid in image_id:
            s = int(str(iid).rsplit("_", 1)[-1])
            w = 24 + (s % 3) * 8
            px = pixels_gradient(iid, w, 32)
            data = encode_payload(px, fmts[s % 5])
            if s % 5 == 1:  # progressive lane carries EXIF
                data = attach_exif(
                    data,
                    build_exif_app1(
                        orientation=1 + s % 8,
                        make=f"Cam_{s}",
                        big_endian=s % 2 == 1,
                    ),
                )
            if s >= 56:  # corruption lane: header cut mid-signature
                data = data[:6]
            out.append(data)
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string")).alias("image_id"),
    )
    with_bytes = docs.withColumn("bytes", make_bytes("image_id"))
    meta = image_stream_metadata(with_bytes)
    return meta.select(
        "image_id",
        "fmt_detected",
        F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("bit_depth").cast("long").alias("bit_depth"),
        F.col("progressive").cast("long").alias("progressive"),
        F.col("interlaced").cast("long").alias("interlaced"),
        F.col("exif_orientation").cast("long").alias("exif_orientation"),
        "exif_make",
        F.col("parse_ok").cast("long").alias("parse_ok"),
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing: raw int16 PCM payloads -> typed features
    (duration, RMS, peak, zero-crossing rate) via mapInPandas
    (crawler_spark.operators.multimodal.audio_features).

    PCM bytes are synthesized with the SQL-reproducible integer
    pattern (multimodal.synth_pcm), so the DuckDB oracle regenerates
    the exact samples with generate_series and re-derives every
    feature — the binary round-trip is fully oracle-checked, like
    image_features.
    """
    from crawler_spark.operators.multimodal import audio_features, synth_pcm

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        return pd.Series([synth_pcm(i) for i in ids])

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("au_"), F.col("doc_id").cast("string")).alias("audio_id"),
        F.lit(8000).alias("sample_rate"),
        F.lit(1).alias("n_channels"),
        F.lit("pcm16").alias("fmt"),
    )
    with_bytes = docs.withColumn("bytes", gen("audio_id"))
    return audio_features(with_bytes).select(
        "audio_id",
        "sample_rate",
        F.col("n_samples").cast("long").alias("n_samples"),
        "duration_s",
        "rms",
        F.col("peak").cast("long").alias("peak"),
        "zcr",
        F.col("decode_ok").cast("long").alias("decode_ok"),
    )


def q_flac_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC codec (functions/flac.py) under the FULL value oracle:
    the PCM is the SQL-reproducible synth_pcm pattern, FLAC is
    lossless, and audio_features decodes fmt='flac' — so DuckDB
    regenerates the exact samples and every derived feature must
    match to the digit (stronger than jpeg_fidelity's count pin,
    which a lossy codec cannot offer)."""
    from crawler_spark.functions.flac import encode_flac
    from crawler_spark.operators.multimodal import audio_features, synth_pcm

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for i in ids:
            pcm = np.frombuffer(synth_pcm(i), dtype="<i2").reshape(-1, 1)
            out.append(encode_flac(pcm, 8000, block_size=256))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("fl_"), F.col("doc_id").cast("string")).alias("audio_id"),
        F.lit(8000).alias("sample_rate"),
        F.lit(1).alias("n_channels"),
        F.lit("flac").alias("fmt"),
    )
    with_bytes = docs.withColumn("bytes", gen("audio_id"))
    return audio_features(with_bytes).select(
        "audio_id",
        "sample_rate",
        F.col("n_samples").cast("long").alias("n_samples"),
        "duration_s",
        "rms",
        F.col("peak").cast("long").alias("peak"),
        "zcr",
        F.col("decode_ok").cast("long").alias("decode_ok"),
    )


def q_audio_stream_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame grammar (functions/mpeg_audio) under a FULL value
    oracle: 64 byte-valid Layer III streams are synthesized with knobs
    (rate/bitrate/channels/frame-count/VBR/Xing/CRC/ID3) that are pure
    integer functions of doc_id, the REAL parser walks every frame
    (verifying lengths, CRCs and Xing counts), and DuckDB re-derives
    every output — duration, VBR-ness, total frame bytes — from the
    same arithmetic (ISO 11172-3 frame-length formula 144*kbps/rate).
    A parser regression in any grammar branch (sync walk, LSF tables,
    Xing exclusion, ID3 skip) lands as a value mismatch.

    Reference twin: per-payload field extraction, src/advert.py:188-381.
    """
    from crawler_spark.functions.mpeg_audio import encode_mp3_shell
    from crawler_spark.operators.multimodal import audio_stream_metadata

    RATES = [44100, 48000, 32000]
    KBPS = [64, 96, 128, 160]

    @F.pandas_udf("binary")
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for aid in ids:
            s = int(str(aid).rsplit("_", 1)[-1])
            out.append(
                encode_mp3_shell(
                    n_frames=10 + s % 7,
                    sample_rate=RATES[s % 3],
                    bitrate_kbps=KBPS[(s // 3) % 4],
                    channels=1 + s % 2,
                    vbr_alt_kbps=192 if s % 5 == 0 else None,
                    with_xing=s % 4 == 0,
                    with_crc=s % 2 == 0,
                    id3v2_size=(s % 3) * 37,
                    id3v1=s % 2 == 1,
                )
            )
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("mp_"), F.col("doc_id").cast("string")).alias("audio_id"),
        F.lit("mp3").alias("fmt"),
    )
    with_bytes = docs.withColumn("bytes", gen("audio_id"))
    return audio_stream_metadata(with_bytes).select(
        "audio_id",
        "container",
        "sample_rate",
        "channels",
        "n_frames",
        "duration_s",
        F.col("vbr").cast("long").alias("vbr"),
        "bitrate_kbps",
        "total_frame_bytes",
        F.col("parse_ok").cast("long").alias("parse_ok"),
    )


def q_favicon_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO/favicon containers (functions/ico.py) through the no-decode
    triage operator: 64 icons carry 1 + s%3 directory entries (16/32/
    48 px, alternating header-less 32-bit DIB and embedded PNG
    storage); the operator reports the directory walk's entry count
    and largest-entry dims with zero pixel work. The >=56 lane is cut
    mid-ICONDIR and pins parse_ok=0. Every field is CASE arithmetic
    on doc_id in the oracle.
    """
    import pandas as pd

    from crawler_spark.functions.ico import encode_ico
    from crawler_spark.functions.payload import pixels_gradient
    from crawler_spark.operators.multimodal import image_stream_metadata

    @F.pandas_udf("binary")
    def make_ico(image_id: pd.Series) -> pd.Series:
        out = []
        for iid in image_id:
            s = int(str(iid).rsplit("_", 1)[-1])
            n = 1 + s % 3
            entries = [
                (pixels_gradient(iid, d, d), "bmp32" if (s + j) % 2 == 0 else "png")
                for j, d in enumerate([16, 32, 48][:n])
            ]
            data = encode_ico(entries)
            out.append(data[:5] if s >= 56 else data)
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("ico_"), F.col("doc_id").cast("string")).alias("image_id"),
    )
    meta = image_stream_metadata(docs.withColumn("bytes", make_ico("image_id")))
    return meta.select(
        "image_id",
        "fmt_detected",
        F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("bit_depth").cast("long").alias("bit_depth"),
        F.col("parse_ok").cast("long").alias("parse_ok"),
    )


def q_mp3_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 text-frame extraction (functions/mpeg_audio.build_id3v2 /
    parse_id3v2) as a contract query: 64 real MP3 streams carry real
    ID3v2.3 (plain frame sizes) or ID3v2.4 (syncsafe) tags with
    TIT2/TPE1/TALB text frames — except the s%8==7 lane, which has no
    tag and pins the absent-tag path. Every output field is CASE
    arithmetic on doc_id in the oracle; the Spark side actually walks
    the tag grammar (both frame-size conventions, padding, v2.3
    latin-1 vs v2.4 utf-8 encodings). The audio analog of
    image_stream_meta's EXIF pin.
    """
    import pandas as pd

    from crawler_spark.functions.mpeg_audio import encode_mp3_shell, parse_id3v2

    @F.pandas_udf(
        "struct<version:int,title:string,artist:string,album:string,parse_ok:int>"
    )
    def tags(ids: pd.Series) -> pd.DataFrame:
        rows = []
        for aid in ids:
            s = int(str(aid).rsplit("_", 1)[-1])
            frames = (
                None
                if s % 8 == 7
                else {
                    "TIT2": f"Track {s}",
                    "TPE1": f"Artist_{s % 7}",
                    "TALB": f"Album_{s % 5}",
                }
            )
            data = encode_mp3_shell(
                n_frames=4,
                id3v2_frames=frames,
                id3v2_version=3 + s % 2,
                # padding on top of real frames; the no-tag lane must
                # not even get the legacy skip-blob (it parses as an
                # empty tag)
                id3v2_size=0 if frames is None else (s % 3) * 11,
            )
            try:
                got = parse_id3v2(data)
                f = got["frames"]
                rows.append(
                    {
                        "version": got["version"],
                        "title": f.get("TIT2"),
                        "artist": f.get("TPE1"),
                        "album": f.get("TALB"),
                        "parse_ok": 1,
                    }
                )
            except ValueError:
                rows.append(
                    {"version": None, "title": None, "artist": None,
                     "album": None, "parse_ok": 0}
                )
        return pd.DataFrame(rows)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        F.concat(F.lit("mp_"), F.col("doc_id").cast("string")).alias("audio_id"),
    )
    t = docs.withColumn("t", tags("audio_id"))
    return t.select(
        "audio_id",
        F.col("t.version").cast("long").alias("id3_version"),
        F.col("t.title").alias("title"),
        F.col("t.artist").alias("artist"),
        F.col("t.album").alias("album"),
        F.col("t.parse_ok").cast("long").alias("parse_ok"),
    )


def q_near_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup: minhash LSH pairs -> connected components
    -> keep the min-id representative per duplicate CLUSTER. The
    training-pipeline deliverable (cleaned corpus), oracle-checked via
    a recursive-CTE transitive closure over the exact pair relation
    (which minhash provably reproduces on this base, see minhash_lsh).
    """
    from crawler_spark.operators.dedup import near_dedup_corpus

    out = near_dedup_corpus(_dup_base(spark, sf_dir), threshold=0.9)
    return out.select("doc_id")


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-17/O-30: left-semi keyword-presence analog over orders⋉lineitem."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li.select(F.col("l_orderkey").alias("o_orderkey")), on="o_orderkey", how="left_semi"
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-32/O-33: per-type counts + grand total (lineage metrics shape)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("value_dec", F.col("value").cast("decimal(18,2)"))
        .rollup("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value_dec").cast("double"), 2).alias("sum_value"),
        )
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational agg parity (TPC-H Q1 shape) — decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_crawl_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl: full engine loop (discover -> anti-join ->
    politeness -> fetch -> route -> parse -> MERGE) on the deterministic
    synthetic corpus; returns per-host lineage totals. Non-SQL-expressible
    (stateful rounds) -> rows-only check."""
    import tempfile

    from crawler_spark.operators.frontier import CrawlEngine
    from crawler_spark.sources.synth import corpus_to_spark, gen_corpus
    from crawler_spark.storage import SnapshotCatalog

    corpus = corpus_to_spark(spark, gen_corpus(n_pages=300, n_hosts=4, seed=42))
    with tempfile.TemporaryDirectory() as tmp:
        engine = CrawlEngine(
            spark=spark,
            catalog=SnapshotCatalog(spark, tmp),
            seed_pages=corpus["seed_pages"],
            sitemap_entries=corpus["sitemap_entries"],
            robots_rules=corpus["robots_rules"],
            keywords=corpus["keywords"],
            round_duration=3600.0,
            store_payload=False,
        )
        engine.bootstrap()
        # Run to frontier drain (engine stops early once nothing is
        # pending) so the per-host totals equal the independent twin's
        # full-crawl totals pinned in oracle_sql().
        engine.run(max_rounds=200)
        out = (
            engine.lineage()
            .groupBy("host")
            .agg(
                F.sum("scheduled").alias("scheduled"),
                F.sum("stored").alias("stored"),
                F.sum("retried").alias("retried"),
                F.sum("dropped").alias("dropped"),
            )
            .orderBy("host")
        )
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the scheduler core (seen anti-join + bloom prefilter +
    politeness window admission) over sf0.001, per-host admitted counts."""
    sf_dir = "/root/testdata/sf0.001"
    from crawler_spark.operators import politeness
    from crawler_spark.operators import seen as seen_ops

    frontier = _events_frontier(spark, sf_dir)
    seen = frontier.filter(F.col("event_type").isin("click", "view")).select(
        "fp", "url", "host_hash"
    )
    empty_bloom = spark.createDataFrame([], seen_ops.BLOOM_SCHEMA)
    bloom = seen_ops.update_blooms(empty_bloom, seen)
    unseen = seen_ops.filter_unseen(frontier, seen.select("fp", "url"), bloom)
    robots = (
        frontier.select("host").distinct()
        .withColumn("requests_per_minute", (F.pmod(F.col("host"), F.lit(5)) + 1).cast("double"))
        .withColumn("robots_crawl_delay", F.lit(None).cast("double"))
        .withColumn("retry_timeout_min", F.lit(5).cast("int"))
    )
    admitted = politeness.admit(unseen, robots, round_duration=60.0, n_salt=8)
    return admitted.groupBy("host").agg(F.count("*").alias("admitted")).orderBy("host")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "seen_anti_join": q_seen_anti_join,
        "politeness_admission": q_politeness_admission,
        "status_routing": q_status_routing,
        "keyword_match": q_keyword_match,
        "keyword_titles": q_keyword_titles,
        "filter_labeling": q_filter_labeling,
        "rollup_counts": q_rollup_counts,
        "category_counts": q_category_counts,
        "portal_filename": q_portal_filename,
        "url_canonicalize": q_url_canonicalize,
        "text_analysis": q_text_analysis,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup": q_exact_dedup,
        "exact_dup_pairs": q_exact_dup_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "near_dedup_corpus": q_near_dedup_corpus,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "cosine_topk_lsh": q_cosine_topk_lsh,
        "cosine_topk_ivf": q_cosine_topk_ivf,
        "embedding_near_dup": q_embedding_near_dup,
        "sitemap_parse": q_sitemap_parse,
        "id_range_scan": q_id_range_scan,
        "export_csv_shape": q_export_csv_shape,
        "image_features": q_image_features,
        "jpeg_fidelity": q_jpeg_fidelity,
        "jpeg_progressive": q_jpeg_progressive,
        "video_frames": q_video_frames,
        "gif_features": q_gif_features,
        "gif_frames": q_gif_frames,
        "bmp_features": q_bmp_features,
        "image_stream_meta": q_image_stream_meta,
        "mp3_id3_tags": q_mp3_id3_tags,
        "favicon_meta": q_favicon_meta,
        "audio_features": q_audio_features,
        "flac_features": q_flac_features,
        "audio_stream_meta": q_audio_stream_meta,
        "semi_join": q_semi_join,
        "events_rollup": q_events_rollup,
        "tpch_q1": q_tpch_q1,
        "crawl_lineage": q_crawl_lineage,
    }


def oracle_sql() -> dict[str, str]:
    kw_match_union = " UNION ALL ".join(
        f"SELECT doc_id, {kid} AS keyword_id FROM documents "
        f"WHERE regexp_matches(text, '{'' if cs else '(?i)'}{pat}')"
        for kid, _title, pat, cs in DOC_KEYWORDS
    )
    kw_titles = ", ".join(f"({k[0]}, '{k[1]}')" for k in DOC_KEYWORDS)
    return {
        "seen_anti_join": (
            "SELECT event_id, event_type FROM events "
            "WHERE event_type NOT IN ('click', 'view')"
        ),
        "politeness_admission": (
            "SELECT event_id, user_id, rn AS admit_rank FROM ("
            "  SELECT event_id, user_id, "
            "         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn "
            "  FROM events) "
            "WHERE rn <= user_id % 5 + 1"
        ),
        "status_routing": (
            "WITH st AS ("
            "  SELECT event_id, "
            "    CASE WHEN event_type = 'click' THEN 404 "
            "         WHEN value > 5 AND event_id % 2 = 1 THEN 200 "
            "         WHEN event_type = 'error' THEN 503 "
            "         WHEN event_type = 'signup' THEN 410 "
            "         WHEN event_type = 'purchase' THEN 404 "
            "         ELSE 200 END AS status, "
            "    event_id % 2 AS attempt "
            "  FROM events) "
            "SELECT event_id, status::BIGINT AS status, "
            "  CASE WHEN status = 200 THEN 'store' "
            "       WHEN status BETWEEN 500 AND 504 AND attempt = 0 THEN 'retry' "
            "       ELSE 'drop' END AS outcome "
            "FROM st"
        ),
        "keyword_match": kw_match_union,
        "keyword_titles": (
            f"WITH bridge AS ({kw_match_union}), "
            f"kw(id, title) AS (VALUES {kw_titles}) "
            "SELECT b.doc_id, string_agg(k.title, '; ' ORDER BY k.id) AS related_keywords "
            "FROM bridge b JOIN kw k ON k.id = b.keyword_id "
            "GROUP BY b.doc_id"
        ),
        "filter_labeling": (
            f"SELECT doc_id, {_CAT1_SQL} AS cat1, {_CAT2_SQL} AS cat2 FROM documents"
        ),
        "rollup_counts": (
            f"WITH lab AS (SELECT {_CAT1_SQL} AS cat1, {_CAT2_SQL} AS cat2 FROM documents) "
            "SELECT cat1, cat2, count(*) AS n_rows FROM lab GROUP BY ROLLUP(cat1, cat2)"
        ),
        "category_counts": (
            f"WITH lab AS (SELECT {_CAT1_SQL} AS cat1, {_CAT2_SQL} AS cat2 FROM documents), "
            "parts AS (SELECT cat1 AS filter_name FROM lab "
            "          UNION ALL SELECT cat2 FROM lab WHERE cat2 IS NOT NULL) "
            "SELECT filter_name, count(*) AS n FROM parts GROUP BY filter_name"
        ),
        "portal_filename": (
            "WITH base AS ("
            "  SELECT doc_id, source, "
            "    CASE WHEN doc_id % 3 = 0 THEN source || 'Advertisement' "
            "         WHEN doc_id % 3 = 1 THEN '' ELSE NULL END AS ad_type "
            "  FROM documents), "
            "p AS (SELECT doc_id, "
            "  COALESCE(NULLIF(regexp_replace(lower(ad_type), 'advertisement$', ''), ''), "
            "           'example') AS portal "
            "  FROM base) "
            "SELECT doc_id, portal, printf('%s_%05d.html', portal, doc_id) AS filename FROM p"
        ),
        "url_canonicalize": (
            "SELECT doc_id, "
            "  'https://' || lower(source) || '.example.com/jobs/' || doc_id AS canon_url, "
            "  lower(source) || '.example.com' AS host "
            "FROM documents"
        ),
        "text_analysis": (
            "WITH t AS (SELECT doc_id, text, "
            "  regexp_split_to_array(trim(text), '\\s+') AS toks, "
            "  regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS bpe, "
            "  regexp_extract_all(lower(text), "
            "    '\\b(the|and|of|to|in|is|a|der|die|das|und|ist|le|la|et)\\b') AS stops, "
            "  length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]-]', '', 'g')) AS n_punct "
            "  FROM documents) "
            "SELECT doc_id, "
            "  (CASE WHEN trim(text) = '' THEN 0 ELSE len(toks) END)::BIGINT AS n_tokens, "
            "  len(bpe)::BIGINT AS n_tokens_bpe, "
            "  round(CASE WHEN len(toks) > 0 AND trim(text) != '' "
            "        THEN len(stops)::DOUBLE / len(toks) ELSE 0.0 END, 6) AS stopword_ratio, "
            "  round(CASE WHEN trim(text) = '' THEN 0.0 "
            "        ELSE list_sum(list_transform(toks, w -> length(w)))::DOUBLE / len(toks) "
            "        END, 6) AS mean_word_len, "
            "  round(((CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) + "
            "         (CASE WHEN n_punct::DOUBLE / length(text) <= 0.3 THEN 1.0 ELSE 0.0 END) + "
            "         (CASE WHEN len(stops)::DOUBLE / len(toks) >= 0.05 THEN 1.0 ELSE 0.0 END)"
            "        ) / 3.0, 6) AS quality "
            "FROM t"
        ),
        "lang_id": (
            "WITH s AS (SELECT lang, "
            "  len(regexp_extract_all(lower(text), "
            "    '\\b(the|and|of|to|in|is|that|for|with)\\b')) AS en, "
            "  len(regexp_extract_all(lower(text), "
            "    '\\b(der|die|das|und|ist|nicht|mit|für|von|zu)\\b')) AS de, "
            "  len(regexp_extract_all(lower(text), "
            "    '\\b(le|la|les|et|est|pas|pour|avec|dans)\\b')) AS fr "
            "  FROM documents), "
            "p AS (SELECT lang, CASE "
            "  WHEN greatest(en, de, fr) = 0 THEN 'und' "
            "  WHEN en = greatest(en, de, fr) THEN 'en' "
            "  WHEN de = greatest(en, de, fr) THEN 'de' "
            "  ELSE 'fr' END AS lang_pred FROM s) "
            "SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY lang, lang_pred"
        ),
        "doc_fingerprint": (
            "SELECT doc_id, "
            "  list_reduce(list_prepend(0::BIGINT, "
            "    list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)), "
            "    (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint "
            "FROM documents"
        ),
        "exact_dedup": (
            f"WITH base AS ({_DUP_BASE_SQL}) "
            "SELECT doc_id FROM ("
            "  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep FROM base) "
            "WHERE doc_id = keep"
        ),
        "exact_dup_pairs": (
            f"WITH base AS ({_DUP_BASE_SQL}) "
            "SELECT keep AS kept_id, doc_id AS dup_id FROM ("
            "  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep FROM base) "
            "WHERE doc_id != keep"
        ),
        "ngram_jaccard": (
            f"WITH base AS (SELECT * FROM ({_NEARDUP_BASE_SQL}) WHERE doc_id % 4 = 0), "
            "tok AS (SELECT doc_id AS id, "
            "        (regexp_split_to_array(lower(trim(text)), '\\s+'))[1:40] AS t FROM base), "
            "sh AS (SELECT id, list_distinct(CASE WHEN len(t) >= 3 "
            "       THEN list_transform(generate_series(1, len(t) - 2), "
            "            i -> array_to_string(t[i:i+2], ' ')) "
            "       ELSE [array_to_string(t, ' ')] END) AS shingles FROM tok), "
            "ex AS (SELECT id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh), "
            "inter AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b, "
            "          count(*) AS i FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id "
            "          GROUP BY 1, 2, 3, 4) "
            "SELECT id_a, id_b, round(i::DOUBLE / (n_a + n_b - i), 6) AS jaccard "
            "FROM inter WHERE i::DOUBLE / (n_a + n_b - i) >= 0.6"
        ),
        "cosine_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv "
            "           FROM embeddings WHERE vec_id < 64), "
            "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
            "  round(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
            "        (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
            "         sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
            "  FROM embeddings e, q WHERE e.vec_id != q.qid) "
            "SELECT query_id, rank, neighbor_id, cosine FROM ("
            "  SELECT *, row_number() OVER ("
            "    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s) "
            "WHERE rank <= 5"
        ),
        "sitemap_parse": (
            "SELECT source AS portal, "
            "  (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) AS loc_seq, "
            "  'https://www.' || source || '.example.com/jobs/' || doc_id AS url "
            "FROM documents"
        ),
        "id_range_scan": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE doc_id BETWEEN 100 AND 250"
        ),
        "export_csv_shape": (
            f"WITH bridge AS ({kw_match_union}), "
            f"kw(id, title) AS (VALUES {kw_titles}) "
            "SELECT d.text AS job_title, NULL::VARCHAR AS company_name, "
            "  NULL::VARCHAR AS location, "
            "  'https://www.' || d.source || '.example.com/jobs/' || d.doc_id AS url, "
            "  d.source AS portal, "
            "  string_agg(k.title, '; ' ORDER BY k.id) AS related_keywords, "
            "  printf('%s_%05d.html', d.source, d.doc_id) AS filename "
            "FROM bridge b JOIN kw k ON k.id = b.keyword_id "
            "JOIN documents d ON d.doc_id = b.doc_id "
            "GROUP BY d.doc_id, d.text, d.source"
        ),
        "embedding_near_dup": (
            "WITH base AS ("
            "  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
            "  UNION ALL "
            "  SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], x -> x * 2) "
            "  FROM embeddings WHERE vec_id % 5 = 0), "
            "s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "  round(list_dot_product(a.v, b.v) / "
            "        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), "
            "        6) AS cosine "
            "  FROM base a JOIN base b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.95"
        ),
        "semi_join": (
            "SELECT o_orderstatus, count(*) AS n_orders FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) "
            "GROUP BY o_orderstatus"
        ),
        "events_rollup": (
            "SELECT event_type, count(*) AS n, "
            "  round(sum(value::DECIMAL(18,2))::DOUBLE, 2) AS sum_value "
            "FROM events GROUP BY ROLLUP(event_type)"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus, "
            "  round(sum(l_quantity::DECIMAL(18,2))::DOUBLE, 2) AS sum_qty, "
            "  round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE, 2) AS sum_base_price, "
            "  count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= DATE '2000-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "minhash_lsh": (
            # exact all-pairs Jaccard >= 0.9 over the planted-dup base:
            # LSH recall on these pairs is 1 (planted pairs share every
            # band; the verify step is exact), so LSH == exact twin.
            f"WITH base AS ({_DUP_BASE_SQL}), "
            "tok AS (SELECT doc_id AS id, "
            "        regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM base), "
            "sh AS (SELECT id, list_distinct(CASE WHEN len(t) >= 3 "
            "       THEN list_transform(generate_series(1, len(t) - 2), "
            "            i -> array_to_string(t[i:i+2], ' ')) "
            "       ELSE [array_to_string(t, ' ')] END) AS shingles FROM tok), "
            "ex AS (SELECT id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh), "
            "inter AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b, "
            "          count(*) AS i FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id "
            "          GROUP BY 1, 2, 3, 4) "
            "SELECT id_a, id_b, round(i::DOUBLE / (n_a + n_b - i), 6) AS jaccard "
            "FROM inter WHERE i::DOUBLE / (n_a + n_b - i) >= 0.9"
        ),
        "near_dedup_corpus": (
            # transitive closure (recursive CTE) over the exact >= 0.9
            # pair relation; docs whose component root is a smaller id
            # are the removed duplicates.
            f"WITH RECURSIVE base AS ({_DUP_BASE_SQL}), "
            "tok AS (SELECT doc_id AS id, "
            "        regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM base), "
            "sh AS (SELECT id, list_distinct(CASE WHEN len(t) >= 3 "
            "       THEN list_transform(generate_series(1, len(t) - 2), "
            "            i -> array_to_string(t[i:i+2], ' ')) "
            "       ELSE [array_to_string(t, ' ')] END) AS shingles FROM tok), "
            "ex AS (SELECT id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh), "
            "inter AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b, "
            "          count(*) AS i FROM ex a JOIN ex b ON a.s = b.s AND a.id < b.id "
            "          GROUP BY 1, 2, 3, 4), "
            "pairs AS (SELECT id_a, id_b FROM inter "
            "          WHERE i::DOUBLE / (n_a + n_b - i) >= 0.9), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
            "          UNION SELECT id_b, id_a FROM pairs), "
            "reach(a, b) AS (SELECT a, b FROM edges "
            "  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), "
            "comp AS (SELECT a AS id, least(a, min(b)) AS root FROM reach GROUP BY a) "
            "SELECT doc_id FROM base "
            "WHERE doc_id NOT IN (SELECT id FROM comp WHERE root < id)"
        ),
        "simhash": (
            # identical texts -> identical fingerprints -> hamming 0
            f"WITH base AS ({_DUP_BASE_SQL}) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming "
            "FROM base a JOIN base b ON a.text = b.text AND a.doc_id < b.doc_id"
        ),
        # brute-force exact top-k over embeddings ∪ scaled copies; the
        # 5 copies tie at cosine 1.0 >> max natural 0.51, so both the
        # LSH and the IVF approximate results equal this exact ranking.
        "cosine_topk_lsh": _ANN_ORACLE_SQL,
        "cosine_topk_ivf": _ANN_ORACLE_SQL,
        "image_features": (
            # regenerate the gradient pixels with generate_series and
            # re-derive mean RGB + grayscale population std.
            "WITH ids AS (SELECT doc_id AS s, 'img_' || doc_id AS image_id "
            "             FROM documents WHERE doc_id < 64), "
            "px AS (SELECT image_id, "
            "  ((s     + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 7)  % 256) AS r, "
            "  ((2 * s + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 11) % 256) AS g, "
            "  ((3 * s + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 13) % 256) AS b "
            "  FROM ids, generate_series(0, 31) AS gx(x), generate_series(0, 31) AS gy(y)) "
            "SELECT image_id, 32::INT AS w, 32::INT AS h, "
            "  round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g, "
            "  round(avg(b), 6) AS mean_b, "
            "  round(stddev_pop(0.299 * r + 0.587 * g + 0.114 * b), 6) AS std_gray, "
            "  1::BIGINT AS decode_ok "
            "FROM px GROUP BY image_id"
        ),
        "jpeg_fidelity": (
            # the oracle pins the CLAIM (every image decodes at
            # PSNR>=40 with phash within 4 bits) by regenerating the
            # per-width counts; the Spark side actually runs the
            # codec, so any regression loses rows and fails the hash
            "SELECT (24 + (doc_id % 3) * 8)::BIGINT AS w, "
            "  count(*)::BIGINT AS n_images, "
            "  count(*)::BIGINT AS n_psnr_ok, "
            "  count(*)::BIGINT AS n_phash_close "
            "FROM documents WHERE doc_id < 48 GROUP BY 1"
        ),
        "favicon_meta": (
            # directory-walk pins: n_frames = 1 + s%3 entries, largest
            # dim 16/32/48 accordingly, bpp 32 for both storage kinds;
            # the >=56 lane is cut mid-ICONDIR -> parse_ok 0
            "SELECT 'ico_' || doc_id AS image_id, "
            "  CASE WHEN doc_id >= 56 THEN NULL ELSE 'ico' END AS fmt_detected, "
            "  (CASE WHEN doc_id >= 56 THEN NULL "
            "        ELSE 16 * (1 + doc_id % 3) END)::BIGINT AS w, "
            "  (CASE WHEN doc_id >= 56 THEN NULL "
            "        ELSE 16 * (1 + doc_id % 3) END)::BIGINT AS h, "
            "  (CASE WHEN doc_id >= 56 THEN NULL "
            "        ELSE 1 + doc_id % 3 END)::BIGINT AS n_frames, "
            "  (CASE WHEN doc_id >= 56 THEN NULL ELSE 32 END)::BIGINT AS bit_depth, "
            "  (CASE WHEN doc_id < 56 THEN 1 ELSE 0 END)::BIGINT AS parse_ok "
            "FROM documents WHERE doc_id < 64"
        ),
        "mp3_id3_tags": (
            # pure CASE arithmetic; the Spark side walks real ID3v2.3
            # (plain frame sizes, latin-1) and v2.4 (syncsafe, utf-8)
            # tags inside byte-valid MP3 streams; s%8==7 has no tag
            "SELECT 'mp_' || doc_id AS audio_id, "
            "  (CASE WHEN doc_id % 8 = 7 THEN NULL "
            "        ELSE 3 + doc_id % 2 END)::BIGINT AS id3_version, "
            "  CASE WHEN doc_id % 8 = 7 THEN NULL "
            "       ELSE 'Track ' || doc_id END AS title, "
            "  CASE WHEN doc_id % 8 = 7 THEN NULL "
            "       ELSE 'Artist_' || (doc_id % 7) END AS artist, "
            "  CASE WHEN doc_id % 8 = 7 THEN NULL "
            "       ELSE 'Album_' || (doc_id % 5) END AS album, "
            "  (CASE WHEN doc_id % 8 = 7 THEN 0 ELSE 1 END)::BIGINT AS parse_ok "
            "FROM documents WHERE doc_id < 64"
        ),
        "image_stream_meta": (
            # every field is a deterministic function of doc_id: the
            # oracle is pure CASE arithmetic while the Spark side
            # actually sniffs magic bytes, walks JPEG markers to SOF,
            # parses the spliced EXIF IFDs (both byte orders), reads
            # IHDR/DIB headers and hops GIF blocks — and the >=56
            # lane pins the parse_ok=0 path (truncated signatures)
            "WITH ids AS (SELECT doc_id AS s, 'img_' || doc_id AS image_id "
            "             FROM documents WHERE doc_id < 64) "
            "SELECT image_id, "
            "  CASE WHEN s >= 56 THEN NULL "
            "       WHEN s % 5 IN (0, 1) THEN 'jpeg' WHEN s % 5 = 2 THEN 'png' "
            "       WHEN s % 5 = 3 THEN 'gif' ELSE 'bmp' END AS fmt_detected, "
            "  (CASE WHEN s >= 56 THEN NULL ELSE 24 + (s % 3) * 8 END)::BIGINT AS w, "
            "  (CASE WHEN s >= 56 THEN NULL ELSE 32 END)::BIGINT AS h, "
            "  (CASE WHEN s >= 56 THEN NULL ELSE 1 END)::BIGINT AS n_frames, "
            "  (CASE WHEN s >= 56 OR s % 5 = 3 THEN NULL ELSE 8 END)::BIGINT AS bit_depth, "
            "  (CASE WHEN s < 56 AND s % 5 = 0 THEN 0 "
            "        WHEN s < 56 AND s % 5 = 1 THEN 1 END)::BIGINT AS progressive, "
            "  (CASE WHEN s < 56 AND s % 5 = 2 THEN 0 "
            "        WHEN s < 56 AND s % 5 = 3 THEN 1 END)::BIGINT AS interlaced, "
            "  (CASE WHEN s < 56 AND s % 5 = 1 THEN 1 + s % 8 END)::BIGINT "
            "    AS exif_orientation, "
            "  CASE WHEN s < 56 AND s % 5 = 1 THEN 'Cam_' || s END AS exif_make, "
            "  (CASE WHEN s < 56 THEN 1 ELSE 0 END)::BIGINT AS parse_ok "
            "FROM ids"
        ),
        "bmp_features": (
            # parity-branched full value oracle: even ids (24-bit
            # BI_RGB, lossless) re-derive features from the RAW
            # gradient pixels; odd ids (BI_RLE8 over the 3-3-2
            # palette) from the quantized pixels
            "WITH ids AS (SELECT doc_id AS s, 'img_' || doc_id AS image_id, "
            "             doc_id % 2 AS par FROM documents WHERE doc_id < 64), "
            "px AS (SELECT image_id, par, "
            "  ((s     + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 7)  % 256) AS r, "
            "  ((2 * s + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 11) % 256) AS g, "
            "  ((3 * s + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 13) % 256) AS b "
            "  FROM ids, generate_series(0, 31) AS gx(x), generate_series(0, 31) AS gy(y)), "
            "q AS (SELECT image_id, "
            "  CASE WHEN par = 0 THEN r ELSE ((r // 32) * 255) // 7 END AS r, "
            "  CASE WHEN par = 0 THEN g ELSE ((g // 32) * 255) // 7 END AS g, "
            "  CASE WHEN par = 0 THEN b ELSE ((b // 64) * 255) // 3 END AS b FROM px) "
            "SELECT image_id, 32::INT AS w, 32::INT AS h, "
            "  round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g, "
            "  round(avg(b), 6) AS mean_b, "
            "  round(stddev_pop(0.299 * r + 0.587 * g + 0.114 * b), 6) AS std_gray, "
            "  1::BIGINT AS decode_ok "
            "FROM q GROUP BY image_id"
        ),
        "gif_frames": (
            # per-clip sampled-frame counts: n_frames = 6 + doc_id % 5,
            # every 3rd -> ceil(n/3); the lossless-codec claim is
            # pinned as n_ok = n_exact = n_sampled (phash EQUALITY,
            # not closeness — the Spark side runs the real LZW walk)
            "SELECT 'gifv_' || doc_id AS video_id, "
            "  CAST(ceil((6 + doc_id % 5) / 3.0) AS BIGINT) AS n_sampled, "
            "  CAST(ceil((6 + doc_id % 5) / 3.0) AS BIGINT) AS n_ok, "
            "  CAST(ceil((6 + doc_id % 5) / 3.0) AS BIGINT) AS n_exact "
            "FROM documents WHERE doc_id < 8"
        ),
        "gif_features": (
            # regenerate the gradient pixels, apply the SAME integer
            # 3-3-2 palettization the gif export path uses, and
            # re-derive the features — a full value oracle through
            # LZW encode/decode (+ the interlace permutation for odd
            # ids, which must not change any feature)
            "WITH ids AS (SELECT doc_id AS s, 'img_' || doc_id AS image_id "
            "             FROM documents WHERE doc_id < 64), "
            "px AS (SELECT image_id, "
            "  ((s     + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 7)  % 256) AS r, "
            "  ((2 * s + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 11) % 256) AS g, "
            "  ((3 * s + x * (s % 5 + 1) + y * (s % 7 + 2) + (x * y) % 13) % 256) AS b "
            "  FROM ids, generate_series(0, 31) AS gx(x), generate_series(0, 31) AS gy(y)), "
            "q AS (SELECT image_id, "
            "  ((r // 32) * 255) // 7 AS r, ((g // 32) * 255) // 7 AS g, "
            "  ((b // 64) * 255) // 3 AS b FROM px) "
            "SELECT image_id, 32::INT AS w, 32::INT AS h, "
            "  round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g, "
            "  round(avg(b), 6) AS mean_b, "
            "  round(stddev_pop(0.299 * r + 0.587 * g + 0.114 * b), 6) AS std_gray, "
            "  1::BIGINT AS decode_ok "
            "FROM q GROUP BY image_id"
        ),
        "jpeg_progressive": (
            # pins the claim that progressive and baseline decodes of
            # the same image are bit-identical (phash distance 0, equal
            # PSNR); the Spark side runs BOTH codec paths for real
            "SELECT (24 + (doc_id % 3) * 8)::BIGINT AS w, "
            "  count(*)::BIGINT AS n_images, "
            "  count(*)::BIGINT AS n_identical "
            "FROM documents WHERE doc_id < 48 GROUP BY 1"
        ),
        "video_frames": (
            # per-clip sampled-frame counts: n_frames = 6 + doc_id % 5,
            # sampled every 3rd -> ceil(n_frames / 3); the claim that
            # every sampled frame decodes phash-close is pinned as
            # n_ok = n_phash_close = n_sampled (the Spark side runs
            # the real container walk + JPEG decode)
            "SELECT 'vid_' || doc_id AS video_id, "
            "  CAST(ceil((6 + doc_id % 5) / 3.0) AS BIGINT) AS n_sampled, "
            "  CAST(ceil((6 + doc_id % 5) / 3.0) AS BIGINT) AS n_ok, "
            "  CAST(ceil((6 + doc_id % 5) / 3.0) AS BIGINT) AS n_phash_close "
            "FROM documents WHERE doc_id < 8"
        ),
        "audio_features": (
            # regenerate the int16 PCM with generate_series and
            # re-derive duration/RMS/peak/zero-crossing rate.
            "WITH ids AS (SELECT doc_id AS s, 'au_' || doc_id AS audio_id "
            "             FROM documents WHERE doc_id < 64), "
            "v AS (SELECT audio_id, i, "
            "  ((s * 7 + 3) * i + s) % 2001 - 1000 AS x "
            "  FROM ids, generate_series(0, 799) AS g(i)), "
            "w AS (SELECT audio_id, i, x, "
            "  lag(x) OVER (PARTITION BY audio_id ORDER BY i) AS px FROM v) "
            "SELECT audio_id, 8000::INT AS sample_rate, "
            "  count(*)::BIGINT AS n_samples, "
            "  round(count(*) / 8000.0, 6) AS duration_s, "
            "  round(sqrt(avg((x * x)::DOUBLE)), 6) AS rms, "
            "  max(abs(x))::BIGINT AS peak, "
            "  round(sum(CASE WHEN x * px < 0 THEN 1 ELSE 0 END)::DOUBLE "
            "        / (count(*) - 1), 6) AS zcr, "
            "  1::BIGINT AS decode_ok "
            "FROM w GROUP BY audio_id"
        ),
        "flac_features": (
            # identical ground truth to audio_features (synth_pcm is
            # SQL-reproducible and flac is lossless): regenerate the
            # samples, re-derive every feature — full value equality
            # through the real rice/predictor codec
            "WITH ids AS (SELECT doc_id AS s, 'fl_' || doc_id AS audio_id "
            "             FROM documents WHERE doc_id < 64), "
            "v AS (SELECT audio_id, i, "
            "  ((s * 7 + 3) * i + s) % 2001 - 1000 AS x "
            "  FROM ids, generate_series(0, 799) AS g(i)), "
            "w AS (SELECT audio_id, i, x, "
            "  lag(x) OVER (PARTITION BY audio_id ORDER BY i) AS px FROM v) "
            "SELECT audio_id, 8000::INT AS sample_rate, "
            "  count(*)::BIGINT AS n_samples, "
            "  round(count(*) / 8000.0, 6) AS duration_s, "
            "  round(sqrt(avg((x * x)::DOUBLE)), 6) AS rms, "
            "  max(abs(x))::BIGINT AS peak, "
            "  round(sum(CASE WHEN x * px < 0 THEN 1 ELSE 0 END)::DOUBLE "
            "        / (count(*) - 1), 6) AS zcr, "
            "  1::BIGINT AS decode_ok "
            "FROM w GROUP BY audio_id"
        ),
        "audio_stream_meta": (
            # re-derive every mp3 metadata field from the synthesis
            # knobs with ISO 11172-3 arithmetic: frame bytes =
            # (144000*kbps)//rate (mpeg1 layer III), VBR streams
            # alternate the base/192kbps rates on odd frame indexes,
            # a Xing frame adds one base-rate frame excluded from the
            # audio frame count, duration = frames*1152/rate
            "WITH k AS (SELECT doc_id AS s, 'mp_' || doc_id AS audio_id, "
            "  [44100, 48000, 32000][(doc_id % 3) + 1] AS rate, "
            "  [64, 96, 128, 160][((doc_id // 3) % 4) + 1] AS kbps, "
            "  (1 + doc_id % 2)::INT AS channels, "
            "  10 + doc_id % 7 AS n, "
            "  (doc_id % 5 = 0) AS vbr, "
            "  (doc_id % 4 = 0) AS xing "
            "  FROM documents WHERE doc_id < 64), "
            "f AS (SELECT *, (144000 * kbps) // rate AS flen, "
            "  (144000 * 192) // rate AS flen_alt FROM k) "
            "SELECT audio_id, 'mpeg1-layer3' AS container, "
            "  rate::INT AS sample_rate, channels, "
            "  n::BIGINT AS n_frames, "
            "  round(n * 1152.0 / rate, 6) AS duration_s, "
            "  (CASE WHEN vbr THEN 1 ELSE 0 END)::BIGINT AS vbr, "
            "  (CASE WHEN vbr THEN NULL ELSE kbps END)::INT AS bitrate_kbps, "
            "  ((CASE WHEN vbr THEN (n - n // 2) * flen + (n // 2) * flen_alt "
            "         ELSE n * flen END) "
            "   + CASE WHEN xing THEN flen ELSE 0 END)::BIGINT "
            "    AS total_frame_bytes, "
            "  1::BIGINT AS parse_ok "
            "FROM f"
        ),
        # crawl_lineage: the stateful multi-round engine has no SQL
        # twin, but the seed=42 corpus is deterministic — the expected
        # per-host totals are pinned as literals, computed ONCE by the
        # independent single-process twin (tests/reference_twin.py
        # run_twin, which re-implements the reference's harvest loop
        # semantics, src/harvester.py:133-177,1132-1152) and asserted
        # equal to the twin in tests/test_frontier.py
        # test_crawl_lineage_golden. This upgrades the driver's check
        # from rows-only to full value equality.
        "crawl_lineage": (
            "SELECT host, scheduled::BIGINT AS scheduled, "
            "  stored::BIGINT AS stored, retried::BIGINT AS retried, "
            "  dropped::BIGINT AS dropped "
            "FROM (VALUES "
            "  ('portal0.example.de', 158, 146, 5, 7), "
            "  ('portal1.example.at',  73,  67, 3, 3), "
            "  ('portal2.example.de',  46,  44, 1, 1), "
            "  ('portal3.example.at',  33,  29, 1, 3)"
            ") t(host, scheduled, stored, retried, dropped) ORDER BY host"
        ),
    }
