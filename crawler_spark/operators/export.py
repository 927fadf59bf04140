"""Export sinks: CSV, filter-labeled partitioned files, prefix rollup.

Re-expresses the reference's export pipeline
(src/advert_exporter.py) as declarative DataFrame ops:

- keyword-presence semi-join (EXISTS subquery, O-17,
  src/advert_exporter.py:58-62) -> left_semi against the bridge
- per-ad keyword-title N+1 subquery (O-27,
  src/advert_exporter.py:113-123) -> one broadcast join +
  groupBy(collect_list) — strictly better than the reference's
  correlated nested loop
- filter-category labeling (O-21, src/advert_exporter.py:547-586)
  -> fused regex pandas UDF (functions/filters.py)
- portal-name derivation (O-22, src/advert_exporter.py:516-545)
  and filename format (O-24, src/advert_exporter.py:385) -> native
  column expressions (JVM-side, codegen)
- per-directory CSV rollup (O-11, src/advert_exporter.py:407-448):
  every leaf row counts into its dir AND all ancestors incl. root ->
  GROUPING SETS ((cat1, cat2), (cat1), ())
- filename write-back (src/advert_exporter.py:402-405) -> MERGE-style
  overwrite of the pages snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.filters import FilterRow, make_filter_labeler


def portal_name(ad_type_col, url_col):
    """O-22: lower(ad_type) minus 'advertisement' suffix, else 2nd-level
    domain of the url, else 'unknown' (src/advert_exporter.py:516-545)."""
    from_ad = F.regexp_replace(F.lower(ad_type_col), "advertisement$", "")
    host = F.parse_url(url_col, F.lit("HOST"))
    parts = F.split(host, r"\.")
    from_url = F.when(F.size(parts) >= 2, F.element_at(parts, -2))
    return F.coalesce(
        F.when(from_ad != "", from_ad), from_url, F.lit("unknown")
    )


def with_keyword_titles(pages: DataFrame, bridge: DataFrame, keywords: DataFrame) -> DataFrame:
    """pages left_semi bridge + '; '-joined keyword titles (O-17+O-25+O-27).

    Keyword titles are collected in keyword-id order to match the
    reference's id-ordered SQL (src/advert_exporter.py:113-123).
    """
    kw = F.broadcast(keywords.select(F.col("id").alias("keyword_id"), "title"))
    titles = (
        bridge.join(kw, on="keyword_id", how="inner")
        .groupBy("portal", "page_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("keyword_id"), F.col("title")))
                    ),
                    lambda s: s["title"],
                ),
                "; ",
            ).alias("related_keywords")
        )
    )
    return pages.join(
        titles,
        on=[pages["portal"] == titles["portal"], pages["id"] == titles["page_id"]],
        how="inner",  # semi-join semantics: only ads with >=1 keyword are exported
    ).drop(titles["portal"]).drop("page_id")


def label_pages(pages: DataFrame, filter_rows: list[FilterRow], text_col: str = "caption") -> DataFrame:
    """Attach ordered path parts; drop pages matching no filter
    (src/advert_exporter.py:377-382)."""
    labeler = make_filter_labeler(filter_rows)
    return (
        pages.withColumn("path_parts", labeler(F.col(text_col)))
        .filter(F.size("path_parts") > 0)
        .withColumn("cat1", F.element_at("path_parts", 1))
        .withColumn("cat2", F.when(F.size("path_parts") >= 2, F.element_at("path_parts", 2)))
    )


def with_filename(labeled: DataFrame, ext: str = "html") -> DataFrame:
    """O-24: f"{portal_name}_{id:05d}.{ext}" (src/advert_exporter.py:385)."""
    return labeled.withColumn(
        "filename", F.format_string(f"%s_%05d.{ext}", F.col("portal"), F.col("id"))
    )


def export_csv(pages: DataFrame, bridge: DataFrame, keywords: DataFrame, out_path: str | None = None) -> DataFrame:
    """O-9: the fixed 8-column CSV (src/advert_exporter.py:172-181).

    Graft mapping of the advertisement fields onto the image+caption
    payload: job_title <- caption, company_name/location <- absent
    (nullable in the reference schema too).
    """
    df = with_keyword_titles(pages, bridge, keywords).select(
        F.col("caption").alias("job_title"),
        F.lit(None).cast("string").alias("company_name"),
        F.lit(None).cast("string").alias("location"),
        F.col("round").cast("string").alias("harvest_date"),
        "url",
        F.col("portal").alias("portal"),
        "related_keywords",
        "filename",
    )
    if out_path:
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(out_path)
    return df


def export_files(
    labeled: DataFrame,
    out_dir: str,
    fmt: str = "xml",
) -> DataFrame:
    """O-10/O-12: one document per page under <cat1>/<cat2>/ paths.

    The reference writes one OS file per ad in a Python loop
    (src/advert_exporter.py:277-473); here the same tree is one
    partitioned write: partitionBy(cat1, cat2), each row carrying its
    own <text> element built with native string expressions (no UDF,
    whole-stage codegen; src/advert_exporter.py:794-811 equivalent).
    """
    doc = F.concat(
        F.lit('<text ID="'), F.col("filename"),
        F.lit('" position="'), F.coalesce(F.col("caption"), F.lit("")),
        F.lit('" URL="'), F.col("url"),
        F.lit('" accessed="'), F.col("round").cast("string"),
        F.lit('">'), F.coalesce(F.col("caption"), F.lit("")), F.lit("</text>"),
    )
    out = labeled.withColumn("doc", doc).select("cat1", "cat2", "filename", "doc")
    if out_dir:
        # text source allows a single data column; the filename rides
        # inside the document's ID attribute
        (
            out.select("cat1", "cat2", "doc")
            .repartition("cat1", "cat2")
            .write.mode("overwrite")
            .partitionBy("cat1", "cat2")
            .format("text")
            .option("compression", "none")
            .save(out_dir)
        )
    return out


def category_counts(labeled: DataFrame) -> DataFrame:
    """O-31: per-(category position) match counts, as (cat, filter, n)."""
    return (
        labeled.select(F.explode("path_parts").alias("filter_name"))
        .groupBy("filter_name")
        .agg(F.count("*").alias("n"))
    )


def rollup_counts(labeled: DataFrame) -> DataFrame:
    """O-11: hierarchical per-directory row counts via ROLLUP.

    The reference appends each exported ad's row to its leaf dir CSV
    and every ancestor's (src/advert_exporter.py:434-448); the
    directory->row-count relation is exactly rollup(cat1, cat2).
    """
    return (
        labeled.rollup("cat1", "cat2")
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.col("cat1").asc_nulls_first(), F.col("cat2").asc_nulls_first())
    )


def write_back_filenames(catalog, labeled: DataFrame) -> None:
    """src/advert_exporter.py:402-405: UPDATE pages SET filename where
    exported — MERGE WHEN MATCHED UPDATE as a snapshot rewrite."""
    from crawler_spark import schemas

    pages = catalog.read("pages", schemas.PAGES)
    upd = labeled.select("url", F.col("filename").alias("_new_filename"))
    merged = (
        pages.join(upd, on="url", how="left")
        .withColumn("filename", F.coalesce(F.col("_new_filename"), F.col("filename")))
        .drop("_new_filename")
        .select(*[f.name for f in schemas.PAGES.fields])
    )
    catalog.overwrite("pages", merged)
