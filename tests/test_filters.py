"""Export filter labeling tests (src/advert_exporter.py:547-586)."""

import pandas as pd

from crawler_spark.functions.filters import compile_filters, label_text, make_filter_labeler

ROWS = [
    ("edu", 0, "higher", 0, r"university|degree", False, False),
    ("edu", 0, "vocational", 1, r"apprentice", False, False),
    ("edu", 0, "any_edu", 2, r".*", True, False),
    ("jt", 1, "full", 0, r"full[- ]?time", False, False),
    ("jt", 1, "part", 1, r"part[- ]?time", False, False),
    # jt has NO catch-all: a text matching neither contributes no part
]


def lab(text):
    return label_text(text, compile_filters(ROWS))


def test_first_match_wins_in_filter_order():
    assert lab("University degree, apprentice, full-time") == ["higher", "full"]


def test_catch_all_only_when_no_specific_match():
    assert lab("nothing relevant full-time") == ["any_edu", "full"]


def test_category_without_winner_contributes_nothing():
    assert lab("university degree, flexible hours") == ["higher"]


def test_empty_when_nothing_matches_any_category():
    # 'any_edu' catch-all always matches -> edu part always present
    assert lab("zzz") == ["any_edu"]
    assert lab(None) == ["any_edu"]


def test_labeler_udf_parity(spark):
    labeler = make_filter_labeler(ROWS)
    pdf = pd.DataFrame({"text": ["University, part-time", "apprentice role", None]})
    got = [r["p"] for r in spark.createDataFrame(pdf).select(labeler("text").alias("p")).collect()]
    assert got == [["higher", "part"], ["vocational"], ["any_edu"]]
