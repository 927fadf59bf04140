"""Text analysis for training-data pipelines — all native Spark SQL
expressions (JVM-side, whole-stage codegen; no Python in the hot path).

These extend the engine beyond the reference's regex matcher into the
operations a 100 TB corpus pipeline needs: token counting, quality
scoring, language ID, and document fingerprinting. Each has an exact
ANSI-SQL twin (DuckDB oracle) — see __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small, language-discriminating stopword regexes (word-bounded)
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|für|von|zu)\b",
    "fr": r"\b(le|la|les|et|est|pas|pour|avec|dans)\b",
}

STOPWORD_RE = r"\b(the|and|of|to|in|is|a|der|die|das|und|ist|le|la|et)\b"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/null."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words, numbers, and punctuation marks
    counted separately (a cheap BPE proxy for budget estimation)."""
    t = F.coalesce(text, F.lit(""))
    return F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))).cast(
        "int"
    )


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    t = F.lower(F.coalesce(text, F.lit("")))
    total = token_count(text)
    stops = F.size(F.regexp_extract_all(t, F.lit(STOPWORD_RE), F.lit(0)))
    return F.when(total > 0, stops.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    t = F.trim(F.coalesce(text, F.lit("")))
    words = F.split(t, r"\s+")
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(t == "", F.lit(0.0)).otherwise(
        total.cast("double") / F.size(words).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band, punctuation
    sanity, stopword presence (Gopher/C4-style rules, simplified)."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    t = F.lower(F.coalesce(text, F.lit("")))
    return {
        lang: F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0)))
        for lang, rx in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax of per-language stopword hit counts; 'und' if all zero.

    Ties break in fixed (en, de, fr) order via strict greater-than.
    """
    s = lang_scores(text)
    best = F.greatest(*s.values())
    out = F.lit("und")
    # reversed so earlier languages win ties
    for lang in reversed(list(s)):
        out = F.when((best > 0) & (s[lang] == best), F.lit(lang)).otherwise(out)
    return out


FP_MOD = 2147483647  # 2^31 - 1


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic polynomial rolling hash over characters,
    acc = (acc*31 + ascii(char)) mod (2^31-1).

    Chosen over xxhash64 so the DuckDB oracle can reproduce it exactly
    in portable SQL (list_reduce over string_split). Used for document
    identity / near-identity bucketing in dedup reports.
    """
    chars = F.split(F.coalesce(text, F.lit("")), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(FP_MOD),
    )


def with_text_analysis(df, text_col: str = "text"):
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_tokens_bpe", bpe_ish_token_count(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("mean_word_len", mean_word_len(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("fingerprint", rolling_fingerprint(t))
    )
