"""HTTP status routing (SURVEY O-14) as a single when/otherwise column.

Reference semantics (src/harvester.py:1074-1116 StepStone,
1159-1204 Karriere):

- 5xx (500-504): sleep ``retry_timeout`` minutes, then exactly ONE
  retry (src/harvester.py:1087-1096). Round model: the row stays
  pending with attempt=1 and retry_round = current + backoff rounds.
- second 5xx: dropped.
- 410 Gone: dropped with warning (1098-1102).
- any other non-200: dropped with error (1103-1107).
- 200: stored.

A URL missing from the corpus entirely fetches as 404 -> dropped.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_STORE = "store"
OUT_RETRY = "retry"
OUT_DROP = "drop"


def effective_status(df: DataFrame) -> DataFrame:
    """Resolve the synthetic fetch status for this attempt.

    ``transient`` pages 5xx on the first attempt and succeed on the
    retry — the path that exercises the reference's
    sleep-then-retry-once recovery (src/harvester.py:1087-1096).
    """
    return df.withColumn(
        "status",
        F.when(F.col("http_status").isNull(), F.lit(404))
        .when(F.col("transient") & (F.col("attempt") >= 1), F.lit(200))
        .otherwise(F.col("http_status"))
        .cast("int"),
    )


def route(df: DataFrame) -> DataFrame:
    """Adds ``outcome`` in {store, retry, drop} from (status, attempt)."""
    is_5xx = F.col("status").between(500, 504)
    return df.withColumn(
        "outcome",
        F.when(F.col("status") == 200, F.lit(OUT_STORE))
        .when(is_5xx & (F.col("attempt") == 0), F.lit(OUT_RETRY))
        .otherwise(F.lit(OUT_DROP)),  # second 5xx, 410, 404, anything else
    )


def retry_rounds(retry_timeout_min: int, round_duration: float) -> int:
    """How many rounds the retry backoff spans (>=1)."""
    return max(1, math.ceil(retry_timeout_min * 60.0 / round_duration))


def with_retry_round(df: DataFrame, current_round: int, round_duration: float) -> DataFrame:
    """Compute the earliest eligible round for retried rows."""
    return df.withColumn(
        "retry_round",
        (
            F.lit(current_round)
            + F.greatest(
                F.lit(1),
                F.ceil(F.col("retry_timeout_min") * 60.0 / F.lit(round_duration)),
            )
        ).cast("int"),
    )
