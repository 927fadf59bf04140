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
- filename write-back (src/advert_exporter.py:402-405) -> upsert into
  a thin (url, filename) sidecar table joined back at read time
  (pages_with_filenames) so the payload-bearing pages files are never
  rewritten to record an export.
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


def xml_escape_text(col):
    """ET-equivalent escaping for XML text content: & < > (& first)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def xml_escape_attr(col):
    """ET-equivalent escaping for XML attribute values: also double
    quotes (ET serializes attributes in double quotes,
    src/advert_exporter.py:794-805 uses element.set which escapes) and
    \\r \\n \\t as character references — ET's _escape_attrib emits
    &#13;/&#10;/&#09; so a reparse round-trips the whitespace instead
    of normalizing it to a space."""
    out = F.replace(xml_escape_text(col), F.lit('"'), F.lit("&quot;"))
    out = F.replace(out, F.lit("\r"), F.lit("&#13;"))
    out = F.replace(out, F.lit("\n"), F.lit("&#10;"))
    return F.replace(out, F.lit("\t"), F.lit("&#09;"))


def build_xml_doc(
    id_col="id",
    title_col="caption",
    company_col=None,
    location_col=None,
    url_col="url",
    accessed_col="round",
    description_col="caption",
):
    """The reference's <text> element (src/advert_exporter.py:794-811)
    as one native string expression: attributes ID/position/company/
    location/URL/accessed in ET insertion order, description as text
    content, everything escaped, XML declaration included (minidom
    toprettyxml emits one). Missing company/location surface as empty
    attributes exactly like the reference's ``company or ""``; the
    graft's payload has no company/location fields, so callers leave
    the defaults (None -> empty). ``description_col`` doubles as the
    backfill hook: pass a coalesce() of the stored description and a
    re-derived one (src/advert_exporter.py:753-764 re-extracts from
    html_body when NULL).
    """

    def attr(c):
        return xml_escape_attr(F.coalesce(c.cast("string"), F.lit("")))

    company = F.col(company_col) if company_col else F.lit("")
    location = F.col(location_col) if location_col else F.lit("")
    return F.concat(
        F.lit('<?xml version="1.0" encoding="utf-8"?>\n'),
        F.lit('<text ID="'), attr(F.col(id_col)),
        F.lit('" position="'), attr(F.col(title_col)),
        F.lit('" company="'), attr(company),
        F.lit('" location="'), attr(location),
        F.lit('" URL="'), attr(F.col(url_col)),
        F.lit('" accessed="'), attr(F.col(accessed_col)),
        F.lit('">'),
        xml_escape_text(F.coalesce(F.col(description_col), F.lit(""))),
        F.lit("</text>"),
    )


def export_files(
    labeled: DataFrame,
    out_dir: str,
    fmt: str = "xml",
) -> DataFrame:
    """O-10/O-12: one document per page under <cat1>/<cat2>/ paths.

    The reference writes one OS file per ad in a Python loop
    (src/advert_exporter.py:277-473 HTML, 658-846 XML); here the same
    tree is one partitioned write: partitionBy(cat1, cat2), each row
    carrying its own escaped <text> element built with native string
    expressions (no UDF, whole-stage codegen). For byte-faithful
    one-file-per-ad output (and the filename write-back relative
    paths) use :func:`export_files_fs`.
    """
    if fmt == "xml":
        doc = build_xml_doc()
    else:
        # html export writes the raw payload body; the graft's body is
        # the caption text (html_body analog)
        doc = F.coalesce(F.col("caption"), F.lit(""))
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


def export_files_fs(labeled: DataFrame, out_dir: str, fmt: str = "xml") -> DataFrame:
    """Reference-faithful sink: ONE file per ad at
    ``out_dir/<cat1>[/<cat2>]/<portal>_<id:05d>.<fmt>`` plus the
    relative path for the filename write-back
    (src/advert_exporter.py:385-405).

    Files are written from executors via foreachPartition — correct on
    a shared filesystem (NFS/Fuse mounts, local mode). At cluster
    scale one-file-per-row is deliberately the fidelity path, not the
    throughput path: the partitioned write in :func:`export_files`
    stays O(partitions) files.

    Returns (url, rel_path) for write_back_filenames.
    """
    import os

    doc = build_xml_doc() if fmt == "xml" else F.coalesce(F.col("caption"), F.lit(""))
    rel = F.concat_ws(
        "/", F.col("cat1"), F.col("cat2"), F.col("filename")
    )  # concat_ws skips NULL cat2
    rows = labeled.withColumn("doc", doc).withColumn("rel_path", rel).select(
        "url", "rel_path", "doc"
    )

    def write_partition(it):
        for r in it:
            path = os.path.join(out_dir, r["rel_path"])
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w", encoding="utf-8") as f:
                f.write(r["doc"])
                if not r["doc"].endswith("\n"):
                    f.write("\n")

    rows.foreachPartition(write_partition)
    return rows.select("url", F.col("rel_path").alias("filename"))


CSV_FIELDNAMES = [
    "job_title",
    "company_name",
    "location",
    "harvest_date",
    "url",
    "portal",
    "related_keywords",
    "filename",
]


def csv_rows_for_export(
    labeled: DataFrame,
    bridge: DataFrame,
    keywords: DataFrame,
    filename_col: str = "filename",
) -> DataFrame:
    """The per-ad metadata row the directory CSVs carry
    (src/advert_exporter.py:423-433): 8 CSV fields + cat1/cat2/id.

    portal is the URL netloc exactly as the reference computes it for
    these rows (urlparse(url).netloc, src/advert_exporter.py:429) —
    NOT the ad_type-derived portal name used for filenames.
    """
    df = with_keyword_titles(labeled, bridge, keywords)
    return df.select(
        F.coalesce(F.col("caption"), F.lit("")).alias("job_title"),
        F.lit("").alias("company_name"),
        F.lit("").alias("location"),
        F.col("round").cast("string").alias("harvest_date"),
        "url",
        # urlparse(url).netloc keeps userinfo and port ("user@host:8080"),
        # which parse_url(..., 'HOST') drops — extract the full authority.
        F.regexp_extract(F.col("url"), r"^[^:/?#]+://([^/?#]*)", 1).alias("portal"),
        "related_keywords",
        F.col(filename_col).alias("filename"),
        "cat1",
        "cat2",
        "id",
    )


def write_directory_csvs(csv_rows: DataFrame, out_dir: str) -> DataFrame:
    """O-11, the user-visible artifact: an ``advertisements.csv`` in the
    leaf directory AND every ancestor including the root, each holding
    the metadata rows of every ad exported at or below it
    (src/advert_exporter.py:407-514).

    ``csv_rows`` must carry the 8 CSV fields plus cat1/cat2/id. The
    dir->rows relation is the prefix explode of (root, cat1,
    cat1/cat2) — the relational ROLLUP whose counts rollup_counts()
    computes; each group writes its file executor-side in id order
    (the reference iterates ORDER BY id).

    Returns (dir, n_rows) for verification.
    """
    import csv as _csv
    import os

    import pandas as pd

    dirs = F.array_compact(
        F.array(
            F.lit(""),
            F.col("cat1"),
            F.when(
                F.col("cat2").isNotNull(),
                F.concat_ws("/", F.col("cat1"), F.col("cat2")),
            ),
        )
    )
    exploded = csv_rows.withColumn("dir", F.explode(dirs))

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        d = pdf["dir"].iloc[0]
        pdf = pdf.sort_values("id")
        path = os.path.join(out_dir, d, "advertisements.csv")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = _csv.DictWriter(f, fieldnames=CSV_FIELDNAMES)
            w.writeheader()
            for _, r in pdf.iterrows():
                w.writerow({k: ("" if pd.isna(r[k]) else r[k]) for k in CSV_FIELDNAMES})
        return pd.DataFrame({"dir": [d], "n_rows": [len(pdf)]})

    return (
        exploded.groupBy("dir")
        .applyInPandas(write_group, schema="dir string, n_rows long")
    )


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
    exported — as an upsert into the thin ``filenames`` sidecar table.

    The pages table is the payload table (bytes per row); rewriting it
    to record one string per exported row is a full-table IO bill at
    100 TB. The sidecar holds only (url, filename) for exported rows —
    O(exported) to write, and a re-export of the same urls replaces
    their entries (last export wins, like the reference's UPDATE).
    Reads that need the column join it back via
    :func:`pages_with_filenames`; the pages data files are untouched.
    """
    from crawler_spark import schemas

    upd = labeled.select("url", "filename").filter(F.col("filename").isNotNull())
    if catalog.exists("filenames"):
        current = catalog.read("filenames", schemas.FILENAMES)
        upd = current.join(upd.select("url"), on="url", how="left_anti").unionByName(upd)
    catalog.overwrite("filenames", upd)


def pages_with_filenames(catalog) -> DataFrame:
    """pages with the exported filename joined from the sidecar.

    The canonical read of the reference's pages.filename column
    (src/advert_exporter.py:402-405): sidecar wins, the pages table's
    own (always-NULL since harvest) column is the fallback. The
    sidecar is tiny — O(exported) rows of two strings — so Spark
    broadcasts this join at any realistic scale.
    """
    from crawler_spark import schemas

    pages = catalog.read("pages", schemas.PAGES)
    if not catalog.exists("filenames"):
        return pages
    fn = catalog.read("filenames", schemas.FILENAMES).withColumnRenamed(
        "filename", "_exported_filename"
    )
    return (
        pages.join(F.broadcast(fn), on="url", how="left")
        .withColumn(
            "filename", F.coalesce(F.col("_exported_filename"), F.col("filename"))
        )
        .drop("_exported_filename")
        .select(*[f.name for f in schemas.PAGES.fields])
    )
