"""Export filter-category labeling (SURVEY O-21).

Reproduces src/advert_exporter.py:547-586 exactly: per category in
config order, the FIRST non-catch-all pattern that ``search``es the
text wins; if none matched, the FIRST catch-all wins; a category with
no winner contributes no path part; an ad whose overall part list is
empty is dropped from export (src/advert_exporter.py:377-382).

Compile behavior matches src/advert_exporter.py:618-656
(IGNORECASE unless case_sensitive).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_FILTER_CACHE: dict[tuple, list[tuple[str, list[tuple[str, re.Pattern, bool]]]]] = {}

FilterRow = tuple[str, int, str, int, str, bool, bool]
# (category, category_seq, filter_name, filter_seq, pattern, catch_all, case_sensitive)


def compile_filters(rows: list[FilterRow]):
    """-> [(category, [(filter_name, pattern, catch_all)])] in config order."""
    key = tuple(rows)
    if key not in _FILTER_CACHE:
        by_cat: dict[tuple[int, str], list] = {}
        for cat, cseq, name, fseq, pat, catch_all, cs in sorted(
            rows, key=lambda r: (r[1], r[3])
        ):
            by_cat.setdefault((cseq, cat), []).append(
                (name, re.compile(pat, 0 if cs else re.IGNORECASE), bool(catch_all))
            )
        _FILTER_CACHE[key] = [(cat, fs) for (_, cat), fs in sorted(by_cat.items())]
    return _FILTER_CACHE[key]


def label_text(text: str | None, compiled) -> list[str]:
    """Ordered path parts for one document (src/advert_exporter.py:547-586)."""
    if text is None:
        text = ""
    parts: list[str] = []
    for _cat, filters in compiled:
        winner = None
        for name, rx, is_catch_all in filters:
            if is_catch_all:
                continue
            if rx.search(text):
                winner = name
                break
        if winner is None:
            for name, _rx, is_catch_all in filters:
                if is_catch_all:
                    winner = name
                    break
        if winner is not None:
            parts.append(winner)
    return parts


def make_filter_labeler(rows: list[FilterRow]):
    """pandas UDF ``text -> array<string>`` of ordered path parts."""
    frozen = [tuple(r) for r in rows]

    @F.pandas_udf(ArrayType(StringType()))
    def labeler(text: pd.Series) -> pd.Series:
        compiled = compile_filters(frozen)
        return pd.Series([label_text(t if isinstance(t, str) else None, compiled) for t in text])

    return labeler


def filters_as_rows(filters_df) -> list[FilterRow]:
    return [
        (
            r["category"], int(r["category_seq"]), r["filter_name"],
            int(r["filter_seq"]), r["pattern"], bool(r["catch_all"]),
            bool(r["case_sensitive"]),
        )
        for r in filters_df.orderBy("category_seq", "filter_seq").collect()
    ]
