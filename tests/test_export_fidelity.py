"""Export fidelity: XML escaping round-trip, per-directory CSV
artifacts, count report golden totals, CLI end-to-end.

Reference semantics pinned here: src/advert_exporter.py:794-811 (ET
element with escaped attributes), 407-514 (per-dir advertisements.csv
incl. every ancestor), src/count_advertisements.py:140-165 (report
CSV layout with TOTAL/GRAND TOTAL rows).
"""

import csv
import os
import xml.etree.ElementTree as ET
from argparse import Namespace

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.operators import export as ex
from crawler_spark.operators.report import count_links, count_report, write_count_report

FILTERS = [
    ("edu", 0, "higher", 0, r"university|degree", False, False),
    ("edu", 0, "vocational", 1, r"apprentice", False, False),
    ("jt", 1, "full", 0, r"full[- ]?time", False, False),
    ("jt", 1, "part", 1, r"part[- ]?time", False, False),
]


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # caption with every XML-hostile char; still matches 'university'
        (1, "karriere_0", "https://a.example.at/jobs/1", 'university <b>R&D</b> "lead" full-time'),
        (2, "karriere_0", "https://a.example.at/jobs/2", "apprentice mechanic part-time"),
        (3, "stepstone_1", "https://b.example.de/x-1.html", "degree & <skills> part-time"),
    ]
    pdf = pd.DataFrame(rows, columns=["id", "portal", "url", "caption"])
    for c, v in [
        ("fp", 0), ("http_status", 200), ("image_id", "img"), ("w", 32), ("h", 32),
        ("fmt", "raw"), ("phash", 0), ("round", 4), ("attempt", 0),
    ]:
        pdf[c] = v
    pdf["bytes"] = None
    pdf["filename"] = None
    return spark.createDataFrame(pdf[[f.name for f in schemas.PAGES.fields]], schemas.PAGES)


@pytest.fixture(scope="module")
def bridge(spark):
    rows = [(1, 1, "karriere_0"), (1, 2, "karriere_0"), (7, 1, "karriere_0"), (1, 3, "stepstone_1")]
    return spark.createDataFrame(rows, schemas.BRIDGE)


@pytest.fixture(scope="module")
def keywords_df(spark):
    return spark.createDataFrame(
        [(1, "Controller", "controll", False), (7, "HR", r"\bHR", True)],
        schemas.KEYWORDS,
    )


def test_xml_doc_escapes_and_reparses(pages):
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS), ext="xml")
    docs = labeled.withColumn("doc", ex.build_xml_doc()).select("id", "portal", "doc").collect()
    by_key = {(r["portal"], r["id"]): r["doc"] for r in docs}
    doc = by_key[("karriere_0", 1)]
    el = ET.fromstring(doc)  # malformed XML would raise here
    assert el.tag == "text"
    assert el.get("ID") == "1"
    assert el.get("position") == 'university <b>R&D</b> "lead" full-time'
    assert el.get("company") == "" and el.get("location") == ""
    assert el.get("URL") == "https://a.example.at/jobs/1"
    assert el.get("accessed") == "4"
    # description round-trips with & < > intact
    assert el.text == 'university <b>R&D</b> "lead" full-time'
    # the raw string is actually escaped (no bare specials in markup)
    body = doc.split("?>", 1)[1]
    assert "&amp;" in body and "&lt;" in body and '&quot;' in body
    for other in by_key.values():
        ET.fromstring(other)


def test_export_files_fs_tree_and_writeback(spark, pages, tmp_path):
    from crawler_spark.storage import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.overwrite("pages", pages)
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS), ext="xml")
    written = ex.export_files_fs(labeled, str(tmp_path / "out"), fmt="xml")
    got = {r["url"]: r["filename"] for r in written.collect()}
    assert got["https://a.example.at/jobs/1"] == "higher/full/karriere_0_00001.xml"
    p = tmp_path / "out" / "higher" / "full" / "karriere_0_00001.xml"
    assert p.is_file()
    el = ET.fromstring(p.read_text(encoding="utf-8"))
    assert el.get("ID") == "1"
    # write-back stores the RELATIVE path (src/advert_exporter.py:402-405)
    ex.write_back_filenames(cat, written)
    stored = {r["url"]: r["filename"] for r in ex.pages_with_filenames(cat).collect()}
    assert stored["https://a.example.at/jobs/1"] == "higher/full/karriere_0_00001.xml"


def test_directory_csvs_union_semantics(pages, bridge, keywords_df, tmp_path):
    out = str(tmp_path / "exp")
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS), ext="html")
    rows = ex.csv_rows_for_export(labeled, bridge, keywords_df)
    dirs = {r["dir"]: r["n_rows"] for r in ex.write_directory_csvs(rows, out).collect()}
    # pages 1,2 match keywords+filters: 1 -> higher/full, 2 -> vocational/part,
    # stepstone 1 -> higher/part
    assert dirs[""] == 3
    assert dirs["higher"] == 2
    assert dirs["higher/full"] == 1
    assert dirs["vocational/part"] == 1

    def read(d):
        with open(os.path.join(out, d, "advertisements.csv"), newline="", encoding="utf-8") as f:
            return list(csv.DictReader(f))

    root = read("")
    assert [r["url"] for r in root] == [
        "https://a.example.at/jobs/1",
        "https://a.example.at/jobs/2",  # id order within the file
        "https://b.example.de/x-1.html",
    ]
    assert root[0]["related_keywords"] == "Controller; HR"
    assert root[0]["portal"] == "a.example.at"  # netloc, not ad_type name
    assert root[0]["harvest_date"] == "4"
    # ancestor dir holds the union of its subtree, leaf holds its own
    assert {r["url"] for r in read("higher")} == {
        "https://a.example.at/jobs/1",
        "https://b.example.de/x-1.html",
    }
    assert [r["url"] for r in read("higher/full")] == ["https://a.example.at/jobs/1"]


def test_count_report_golden(spark, corpus, corpus_pd, tmp_path):
    counts = count_links(corpus["sitemap_entries"], corpus["robots_rules"])
    got = {(r["portal"], r["sitemap_url"]): r["n"] for r in counts.collect()}

    # golden twin computed straight from the corpus frames in pandas
    ent = corpus_pd["sitemap_entries"]
    robots = corpus_pd["robots_rules"]
    import re

    eligible = set()
    for _, r in robots.iterrows():
        style = r["portal"].split("_")[0]
        pat = {"stepstone": r".*listings-[0-9]+.*", "karriere": r".*sitemap-jobs.*"}[style]
        for sm in r["sitemap_urls"]:
            if re.match(pat, sm):
                eligible.add((r["portal"], sm))
    exp = (
        ent[ent.apply(lambda x: (x["portal"], x["sitemap_url"]) in eligible, axis=1)]
        .loc[lambda d: d["url"].str.strip() != ""]
        .groupby(["portal", "sitemap_url"])["url"]
        .count()
    )
    assert got == {k: int(v) for k, v in exp.items()}

    path = str(tmp_path / "report.csv")
    grand = write_count_report(
        count_report(corpus["sitemap_entries"], corpus["robots_rules"]), path
    )
    assert grand == int(exp.sum())
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "Portal,URL,Count"
    assert lines[-1] == f"GRAND TOTAL,,{grand}"
    # one TOTAL row per portal, each equal to the sum of its sitemap rows
    totals = [ln for ln in lines if ",TOTAL," in ln]
    assert len(totals) == len({p for p, _s in exp.index})


def test_cli_end_to_end(spark, tmp_path):
    """crawl -> analyze -> export -> assembly -> report through the CLI
    entry points against one warehouse (reference src/crawler.py flow)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import run_crawl

    wh = str(tmp_path / "wh")
    base = dict(master=None, warehouse=wh, pages=200, hosts=3, deep_frac=0.1)
    crawl = run_crawl.cmd_crawl(
        Namespace(**base, max_rounds=20, round_duration=3600.0, no_payload=False)
    )
    assert crawl["pending"] == 0 and crawl["pages"] > 0

    analyzed = run_crawl.cmd_analyze(
        Namespace(**base, min_id=None, max_id=None, no_reset=False, include_description=False)
    )
    assert analyzed["bridge_rows"] > 0

    back = run_crawl.cmd_backfill(Namespace(master=None, warehouse=wh, force=False))
    assert back["backfilled"] == 0  # harvest already derived phash

    out = str(tmp_path / "exp")
    exported = run_crawl.cmd_export(
        Namespace(**base, out=out, format="xml", filters="corpus", min_id=None, max_id=None)
    )
    assert exported["exported"] > 0
    assert os.path.isfile(os.path.join(out, "advertisements.csv"))
    # filename write-back landed (in the sidecar; pages untouched)
    from crawler_spark.operators import export as ex
    from crawler_spark.storage import SnapshotCatalog

    cat = SnapshotCatalog(spark, wh)
    assert (
        ex.pages_with_filenames(cat).filter(F.col("filename").isNotNull()).count()
        == exported["exported"]
    )

    csv_out = str(tmp_path / "assembly.csv")
    asm = run_crawl.cmd_assembly(
        Namespace(master=None, warehouse=wh, out=csv_out, min_id=None, max_id=None)
    )
    assert asm["rows"] > 0

    rep = run_crawl.cmd_report(Namespace(**base, out=str(tmp_path / "report.csv")))
    assert rep["grand_total"] > 0

def test_xml_attr_whitespace_roundtrips(spark):
    """ADVICE round 2: \\n \\t \\r in attribute values must serialize as
    &#10;/&#09;/&#13; (ET's _escape_attrib) so a reparse preserves the
    exact whitespace instead of XML-normalizing it to spaces."""
    df = spark.createDataFrame([("line one\nline\ttwo\rend",)], "caption string")
    doc = df.select(
        ex.xml_escape_attr(F.col("caption")).alias("attr"),
    ).collect()[0]
    assert doc["attr"] == "line one&#10;line&#09;two&#13;end"
    xml = df.select(
        F.concat(F.lit('<t v="'), ex.xml_escape_attr(F.col("caption")), F.lit('"/>')).alias("x")
    ).collect()[0]["x"]
    assert ET.fromstring(xml).get("v") == "line one\nline\ttwo\rend"


def test_csv_portal_is_full_netloc(spark, keywords_df):
    """ADVICE round 2: portal must be urlparse(url).netloc — userinfo
    and port included (src/advert_exporter.py:429), which
    parse_url(..., 'HOST') would drop."""
    rows = [
        (9, "karriere_0", "https://user@a.example.at:8080/jobs/9", "university full-time"),
    ]
    pdf = pd.DataFrame(rows, columns=["id", "portal", "url", "caption"])
    for c, v in [
        ("fp", 0), ("http_status", 200), ("image_id", "img"), ("w", 32), ("h", 32),
        ("fmt", "raw"), ("phash", 0), ("round", 4), ("attempt", 0),
    ]:
        pdf[c] = v
    pdf["bytes"] = None
    pdf["filename"] = None
    pages = spark.createDataFrame(pdf[[f.name for f in schemas.PAGES.fields]], schemas.PAGES)
    bridge9 = spark.createDataFrame([(1, 9, "karriere_0")], schemas.BRIDGE)
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS), ext="html")
    out = ex.csv_rows_for_export(labeled, bridge9, keywords_df).collect()
    assert [r["portal"] for r in out] == ["user@a.example.at:8080"]
