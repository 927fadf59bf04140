"""Keyword regex matching — UDF family 3 (SURVEY.md §2.10).

Reproduces src/keyword_manager.py:124-193 exactly:

- compile flags: ``re.IGNORECASE`` unless case_sensitive
  (src/keyword_manager.py:108-122),
- text selection: ``title_only=True`` -> title or no-match-if-None;
  else ``f"{title} {description}"`` if both, else whichever exists,
  else the raw HTML/payload source (src/keyword_manager.py:151-179),
- match = ``pattern.search`` per keyword, ids in insertion order
  (src/keyword_manager.py:187-189).

The per-ad Python loop becomes one Arrow batch pass: patterns are
compiled once per executor (module-level cache keyed by the pattern
list) and evaluated against the whole batch. Semantically this is the
theta join pages x keywords filtered by rlike (SURVEY O-28); the
DuckDB-checkable twin lives in __spark_entry__ as a crossJoin+rlike.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_COMPILED_CACHE: dict[tuple, list[tuple[int, re.Pattern]]] = {}


def compile_keywords(rows: list[tuple[int, str, bool]]) -> list[tuple[int, re.Pattern]]:
    """rows = [(id, search, case_sensitive)] -> [(id, compiled)] once per executor."""
    key = tuple(rows)
    if key not in _COMPILED_CACHE:
        _COMPILED_CACHE[key] = [
            (kid, re.compile(search, 0 if cs else re.IGNORECASE))
            for kid, search, cs in rows
        ]
    return _COMPILED_CACHE[key]


def select_text(
    title: str | None,
    description: str | None,
    source: str | None,
    title_only: bool,
) -> str | None:
    """The reference's text-selection truth table (src/keyword_manager.py:151-179)."""
    if title_only:
        return title  # None -> no matches possible
    if title and description:
        return f"{title} {description}"
    if title:
        return title
    if description:
        return description
    return source  # raw-source fallback


def match_text(text: str | None, compiled: list[tuple[int, re.Pattern]]) -> list[int]:
    if text is None:
        return []
    return [kid for kid, rx in compiled if rx.search(text)]


def make_keyword_matcher(rows: list[tuple[int, str, bool]], title_only: bool = True):
    """Build a pandas UDF ``(title, description, source) -> array<long>``.

    ``rows`` ride into executors via task-closure serialization (the
    keyword table is tiny — 34 rows in etc/config.yml — the same
    broadcast-small-dimension pattern as the reference's single
    compile per run, src/keyword_manager.py:79-106).
    """
    frozen = [tuple(r) for r in rows]

    @F.pandas_udf(ArrayType(LongType()))
    def matcher(title: pd.Series, description: pd.Series, source: pd.Series) -> pd.Series:
        compiled = compile_keywords(frozen)
        out = []
        for t, d, s in zip(title, description, source):
            text = select_text(
                t if isinstance(t, str) else None,
                d if isinstance(d, str) else None,
                s if isinstance(s, str) else None,
                title_only,
            )
            out.append(match_text(text, compiled))
        return pd.Series(out)

    return matcher


def keywords_as_rows(keywords_df) -> list[tuple[int, str, bool]]:
    """Collect the (tiny) keywords table to driver rows for the closure."""
    return [
        (int(r["id"]), r["search"], bool(r["case_sensitive"]))
        for r in keywords_df.select("id", "search", "case_sensitive")
        .orderBy("id")
        .collect()
    ]
