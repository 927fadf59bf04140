"""Keyword matcher tests — the reference's truth table
(src/keyword_manager.py:124-193; tests/test_harvester_keywords.py)."""

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.functions.keywords import (
    compile_keywords,
    make_keyword_matcher,
    match_text,
    select_text,
)

KW = [
    (1, r"controll", False),
    (2, r"\bHR", True),
    (3, r"\bassociate\b", False),
    (4, r"\bproject\s+develop", False),
]


def m(text):
    return match_text(text, compile_keywords(KW))


def test_case_insensitive_default():
    assert m("Senior CONTROLLER wanted") == [1]
    assert m("controlling things") == [1]


def test_case_sensitive_flag():
    assert m("our HR team") == [2]
    assert m("our hr team") == []  # trap: case-sensitive pattern


def test_word_boundary_and_whitespace_quantifier():
    assert m("associate director") == [3]
    assert m("associates director") == []
    assert m("project   development role") == [4]
    assert m("project-development role") == []


def test_multi_match_order_is_id_order():
    assert m("HR controller associate") == [1, 2, 3]


# select_text truth table (src/keyword_manager.py:151-179)
def test_select_text_title_only():
    assert select_text("T", "D", "S", True) == "T"
    assert select_text(None, "D", "S", True) is None  # no match possible


def test_select_text_full_table():
    assert select_text("T", "D", "S", False) == "T D"
    assert select_text("T", None, "S", False) == "T"
    assert select_text(None, "D", "S", False) == "D"
    assert select_text(None, None, "S", False) == "S"  # raw-source fallback
    assert select_text("", "", "S", False) == "S"  # empty strings are falsy
    assert select_text(None, None, None, False) is None


def test_matcher_udf_parity(spark):
    rows = [(i, s, cs) for i, s, cs in KW]
    matcher = make_keyword_matcher(rows, title_only=False)
    pdf = pd.DataFrame(
        {
            "title": ["HR controller", None, "", "associate"],
            "description": [None, "project development", None, None],
            "source": [None, None, "controlling fallback", None],
        }
    )
    df = spark.createDataFrame(pdf)
    got = [
        r["m"]
        for r in df.select(matcher("title", "description", "source").alias("m")).collect()
    ]
    assert got == [[1, 2], [4], [1], [3]]
