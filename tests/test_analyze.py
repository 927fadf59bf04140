"""Analyzer / maintenance op tests (O-39..O-42, O-15, O-16)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.functions.payload import encode_payload, phash64, pixels_for
from crawler_spark.operators import analyze as an
from crawler_spark.storage import SnapshotCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = SnapshotCatalog(spark, str(tmp_path / "wh"))
    rows = []
    for i, caption in enumerate(
        ["HR controller wanted", "hr assistant", "controlling role", "nothing"], start=1
    ):
        iid = f"img_{i:08d}"
        rows.append(
            (i, "karriere_0", f"https://a.example.at/jobs/{i}", 0, 200, iid,
             encode_payload(pixels_for(iid, 32, 32)), 32, 32, "raw", caption,
             phash64(pixels_for(iid, 32, 32)), 0, 0, None)
        )
    pdf = pd.DataFrame(rows, columns=[f.name for f in schemas.PAGES.fields])
    c.overwrite("pages", spark.createDataFrame(pdf, schemas.PAGES))
    return c


@pytest.fixture()
def kw(spark):
    return spark.createDataFrame(
        [(1, "Controller", "controll", False), (7, "HR", r"\bHR", True)],
        schemas.KEYWORDS,
    )


def bridge_set(cat):
    return {
        (r["keyword_id"], r["page_id"])
        for r in cat.read("bridge", schemas.BRIDGE).collect()
    }


def test_analyze_reset(cat, kw):
    an.analyze(cat, kw, title_only=True)
    assert bridge_set(cat) == {(1, 1), (7, 1), (1, 3)}


def test_analyze_id_range_no_reset(cat, kw, spark):
    # seed a stale bridge row for page 4 and a wrong one for page 1
    stale = spark.createDataFrame([(99, 4, "karriere_0"), (99, 1, "karriere_0")], schemas.BRIDGE)
    cat.overwrite("bridge", stale)
    an.analyze(cat, kw, title_only=True, min_id=1, max_id=3, reset=False)
    # page 1's stale row replaced; page 4 (outside range) kept
    assert bridge_set(cat) == {(1, 1), (7, 1), (1, 3), (99, 4)}


def test_backfill_missing_phash(cat, spark):
    pages = cat.read("pages", schemas.PAGES)
    broken = pages.withColumn(
        "phash", F.when(F.col("id") == 2, F.lit(None)).otherwise(F.col("phash"))
    ).select(*[f.name for f in schemas.PAGES.fields])
    cat.overwrite("pages", broken)
    n = an.backfill(cat)
    assert n == 1
    got = {r["id"]: r["phash"] for r in cat.read("pages").collect()}
    assert got[2] == phash64(pixels_for("img_00000002", 32, 32))
    assert an.backfill(cat) == 0  # nothing missing anymore


def test_reset_keyword_tables(cat, kw, spark):
    an.analyze(cat, kw)
    cat.overwrite("keywords", kw)
    an.reset_keyword_tables(cat)
    assert cat.read("bridge", schemas.BRIDGE).count() == 0
    assert cat.read("keywords", schemas.KEYWORDS).count() == 0


def test_upsert_keywords_insert_or_ignore(cat, kw, spark):
    an.upsert_keywords(cat, kw)
    # second upsert with one overlapping `search` and one new
    more = spark.createDataFrame(
        [(1, "Controller DUP", "controll", False), (3, "Analyst", "analyst", False)],
        schemas.KEYWORDS,
    )
    an.upsert_keywords(cat, more)
    got = {r["search"]: r["title"] for r in cat.read("keywords").collect()}
    # INSERT OR IGNORE: existing `search` keeps its original title
    assert got == {"controll": "Controller", r"\bHR": "HR", "analyst": "Analyst"}
