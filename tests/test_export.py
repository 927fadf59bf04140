"""Export pipeline tests (O-9..O-12, O-17, O-21..O-25, O-27)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.operators import export as ex
from crawler_spark.storage import SnapshotCatalog

FILTERS = [
    ("edu", 0, "higher", 0, r"university|degree", False, False),
    ("edu", 0, "vocational", 1, r"apprentice", False, False),
    ("jt", 1, "full", 0, r"full[- ]?time", False, False),
    ("jt", 1, "part", 1, r"part[- ]?time", False, False),
]


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # id, portal, url, caption
        (1, "karriere_0", "https://a.example.at/jobs/1", "University educated HR lead, full-time"),
        (2, "karriere_0", "https://a.example.at/jobs/2", "apprentice mechanic part-time"),
        (3, "karriere_0", "https://a.example.at/jobs/3", "nothing matches here"),
        (1, "stepstone_1", "https://b.example.de/x-1.html", "degree in controlling, part-time"),
    ]
    pdf = pd.DataFrame(rows, columns=["id", "portal", "url", "caption"])
    for c, v in [
        ("fp", 0), ("http_status", 200), ("image_id", "img"), ("w", 32), ("h", 32),
        ("fmt", "raw"), ("phash", 0), ("round", 0), ("attempt", 0),
    ]:
        pdf[c] = v
    pdf["bytes"] = None
    pdf["filename"] = None
    return spark.createDataFrame(pdf[[f.name for f in schemas.PAGES.fields]], schemas.PAGES)


@pytest.fixture(scope="module")
def bridge(spark):
    rows = [(7, 1, "karriere_0"), (1, 1, "karriere_0"), (1, 1, "stepstone_1")]
    return spark.createDataFrame(rows, schemas.BRIDGE)


@pytest.fixture(scope="module")
def keywords_df(spark):
    return spark.createDataFrame(
        [(1, "Controller", "controll", False), (7, "HR", r"\bHR", True)],
        schemas.KEYWORDS,
    )


def test_keyword_semi_join_and_title_agg(pages, bridge, keywords_df):
    out = ex.with_keyword_titles(pages, bridge, keywords_df)
    rows = {(r["portal"], r["id"]): r["related_keywords"] for r in out.collect()}
    # pages without bridge rows are excluded (EXISTS semantics)
    assert set(rows) == {("karriere_0", 1), ("stepstone_1", 1)}
    # titles joined in keyword-id order with '; '
    assert rows[("karriere_0", 1)] == "Controller; HR"
    assert rows[("stepstone_1", 1)] == "Controller"


def test_label_pages_and_filename(pages):
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS))
    got = {r["url"]: (r["cat1"], r["cat2"], r["filename"]) for r in labeled.collect()}
    assert got["https://a.example.at/jobs/1"] == ("higher", "full", "karriere_0_00001.html")
    assert got["https://a.example.at/jobs/2"] == ("vocational", "part", "karriere_0_00002.html")
    assert got["https://b.example.de/x-1.html"] == ("higher", "part", "stepstone_1_00001.html")
    # no-match page dropped (src/advert_exporter.py:377-382)
    assert "https://a.example.at/jobs/3" not in got


def test_portal_name_derivation(spark):
    pdf = pd.DataFrame(
        {
            "ad_type": ["KarriereAdvertisement", "", None, "weird"],
            "url": [
                "https://x.y/1",
                "https://www.stepstone.at/job/2",
                "https://jobs.example.co/3",
                "https://z/4",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = [r["p"] for r in df.select(ex.portal_name(F.col("ad_type"), F.col("url")).alias("p")).collect()]
    assert got[0] == "karriere"          # ad_type suffix strip (O-22)
    assert got[1] == "stepstone"         # 2nd-level domain fallback
    assert got[2] == "example"
    assert got[3] == "weird"             # non-empty ad_type without suffix passes through


def test_export_csv_shape(pages, bridge, keywords_df, tmp_path):
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS))
    df = ex.export_csv(labeled, bridge, keywords_df, str(tmp_path / "csv"))
    assert df.columns == [
        "job_title", "company_name", "location", "harvest_date",
        "url", "portal", "related_keywords", "filename",
    ]
    assert df.count() == 2  # semi-join keeps only keyword-matched ads
    files = [f for f in os.listdir(tmp_path / "csv") if f.endswith(".csv")]
    assert files


def test_rollup_counts(pages):
    labeled = ex.label_pages(pages, FILTERS)
    got = {
        (r["cat1"], r["cat2"]): r["n_rows"] for r in ex.rollup_counts(labeled).collect()
    }
    assert got[(None, None)] == 3                  # root advertisements.csv
    assert got[("higher", None)] == 2              # ancestor dir rollup
    assert got[("higher", "full")] == 1
    assert got[("vocational", "part")] == 1


def test_category_counts(pages):
    labeled = ex.label_pages(pages, FILTERS)
    got = {r["filter_name"]: r["n"] for r in ex.category_counts(labeled).collect()}
    assert got == {"higher": 2, "vocational": 1, "full": 1, "part": 2}


def test_export_files_partitioned_tree(pages, tmp_path):
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS))
    out_dir = str(tmp_path / "files")
    ex.export_files(labeled, out_dir)
    assert os.path.isdir(os.path.join(out_dir, "cat1=higher", "cat2=full"))
    assert os.path.isdir(os.path.join(out_dir, "cat1=vocational", "cat2=part"))


def test_filename_write_back(spark, pages, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.overwrite("pages", pages)

    def pages_files():
        d = os.path.join(str(tmp_path / "wh"), "pages")
        return sorted(
            (os.path.join(r, f), os.path.getmtime(os.path.join(r, f)))
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    before = pages_files()
    labeled = ex.with_filename(ex.label_pages(pages, FILTERS))
    ex.write_back_filenames(cat, labeled)
    got = {r["url"]: r["filename"] for r in ex.pages_with_filenames(cat).collect()}
    assert got["https://a.example.at/jobs/1"] == "karriere_0_00001.html"
    assert got["https://a.example.at/jobs/3"] is None  # unexported untouched
    # the payload-bearing pages data files are NOT rewritten by an
    # export (the point of the sidecar: O(exported) IO, not O(table))
    assert pages_files() == before
    # re-export overwrites matching urls, keeps the rest (UPDATE twin)
    relabeled = labeled.withColumn(
        "filename", F.concat(F.lit("v2/"), F.col("filename"))
    )
    ex.write_back_filenames(cat, relabeled)
    got2 = {r["url"]: r["filename"] for r in ex.pages_with_filenames(cat).collect()}
    assert got2["https://a.example.at/jobs/1"] == "v2/karriere_0_00001.html"
    assert pages_files() == before
