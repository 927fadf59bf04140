"""Per-portal / per-sitemap link-count report.

Re-expresses src/count_advertisements.py:41-165: the reference walks
every portal's get_next_link() generator counting yielded links (all
sitemap <loc> entries after the portal-style sitemap filter and the
empty-link skip — no URL dedup, no robots-disallow at this stage:
those apply later in get_next_advert), then prints per-portal totals
and writes a ``Portal,URL,Count`` CSV with per-portal TOTAL rows and
a GRAND TOTAL row.

Here the walk is one groupBy over the sitemap_entries relation; the
totals are the ROLLUP of the same aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.frontier import STYLE_SITEMAP_FILTER


def eligible_sitemaps(robots_rules: DataFrame) -> DataFrame:
    """(portal, sitemap_url) pairs each portal style walks
    (src/harvester.py:1135 StepStone listings filter, 1250 Karriere
    sitemap-jobs filter)."""
    style = F.regexp_extract(F.col("portal"), r"^([a-z]+)_", 1)
    return (
        robots_rules.select("portal", F.explode("sitemap_urls").alias("sitemap_url"))
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
        .drop("style")
    )


def count_links(sitemap_entries: DataFrame, robots_rules: DataFrame) -> DataFrame:
    """(portal, sitemap_url, n) — links the reference's counter would
    yield per sitemap: eligible sitemaps only, empty/whitespace <loc>
    skipped (src/harvester.py:1303-1307), duplicates counted as the
    generator yields them."""
    return (
        sitemap_entries.join(
            F.broadcast(eligible_sitemaps(robots_rules)),
            on=["portal", "sitemap_url"],
            how="inner",
        )
        .filter(F.col("url").isNotNull() & (F.trim(F.col("url")) != ""))
        .groupBy("portal", "sitemap_url")
        .agg(F.count("*").alias("n"))
    )


def count_report(sitemap_entries: DataFrame, robots_rules: DataFrame) -> DataFrame:
    """Counts plus per-portal TOTAL and GRAND TOTAL rows as one ROLLUP
    (the reference accumulates the same totals in Python,
    src/count_advertisements.py:140-165)."""
    return (
        count_links(sitemap_entries, robots_rules)
        .rollup("portal", "sitemap_url")
        .agg(F.sum("n").alias("n"))
        .select(
            F.coalesce(F.col("portal"), F.lit("GRAND TOTAL")).alias("portal"),
            F.when(
                F.col("portal").isNotNull() & F.col("sitemap_url").isNull(), F.lit("TOTAL")
            )
            .otherwise(F.col("sitemap_url"))
            .alias("sitemap_url"),
            "n",
        )
    )


def write_count_report(counts: DataFrame, path: str) -> int:
    """The reference's CSV layout (src/count_advertisements.py:153-163):
    per-sitemap rows, then ``portal,TOTAL,n`` after each portal's rows,
    then ``GRAND TOTAL,,n``. The report is tiny (portals x sitemaps),
    so it is collected and written driver-side like any summary file.
    Returns the grand total.
    """
    rows = counts.collect()
    per_sitemap: dict[str, list[tuple[str, int]]] = {}
    totals: dict[str, int] = {}
    grand = 0
    for r in rows:
        if r["portal"] == "GRAND TOTAL":
            grand = int(r["n"])
        elif r["sitemap_url"] == "TOTAL":
            totals[r["portal"]] = int(r["n"])
        else:
            per_sitemap.setdefault(r["portal"], []).append((r["sitemap_url"], int(r["n"])))
    with open(path, "w", encoding="utf-8") as f:
        f.write("Portal,URL,Count\n")
        for portal in sorted(per_sitemap):
            for url, n in sorted(per_sitemap[portal]):
                f.write(f"{portal},{url},{n}\n")
            f.write(f"{portal},TOTAL,{totals.get(portal, 0)}\n")
        f.write(f"GRAND TOTAL,,{grand}\n")
    return grand
