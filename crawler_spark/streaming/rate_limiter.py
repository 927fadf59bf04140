"""Stateful streaming politeness + windowed throughput metrics.

Two Structured Streaming twins of the batch engine's operators:

- :func:`stateful_politeness` — the per-host token admission (SURVEY
  O-37, the batch engine's window-ranked queue) as a CUSTOM STATEFUL
  OPERATOR via ``applyInPandasWithState``: per-host state carries the
  cumulative emission sequence across micro-batches, so the per-host
  crawl order (the reference's strictly-sequential portal thread,
  src/harvester.py:420-434) stays globally dense over the life of the
  stream, not per batch. Deferred rows are emitted flagged rather than
  dropped — the caller loops them back, exactly like the batch
  engine's leftover.

- :func:`windowed_throughput` — the ads/min log (SURVEY O-33,
  src/harvester.py:318-326) as an event-time windowed aggregation
  with a watermark: late fetch events beyond the watermark are
  dropped, finalized windows emit exactly once in append mode.

Scale notes: applyInPandasWithState state lives in the state store
partitioned by the grouping key (host) — hot hosts are single-task by
construction, which is correct here because admission per host is
sequential by definition; the state per host is two counters
(~16 bytes), so 10^8 hosts is ~GBs of state store, well within
RocksDB-backed state at cluster scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("total_admitted", LongType(), False),
        StructField("total_seen", LongType(), False),
    ]
)


def stateful_politeness(
    requests: DataFrame,
    tokens_per_batch: int = 2,
    order_cols: tuple[str, ...] = ("priority", "url"),
) -> DataFrame:
    """Admit up to ``tokens_per_batch`` URLs per host per micro-batch.

    Input stream columns: ``host`` plus at least ``order_cols`` (any
    further columns ride through untouched — the output schema is the
    input schema + ``admitted``/``admit_seq``). Output: every input
    row with ``admitted`` 0/1 and, for admitted rows, the host's
    cumulative ``admit_seq`` (continues across batches via the state
    store — the streaming analog of the batch engine's admit_rank).
    Pass ``order_cols=politeness.ORDER_COLS`` to mirror the batch
    engine's per-host emission order exactly.
    """
    out_schema = StructType(
        [
            *requests.schema.fields,
            StructField("admitted", IntegerType(), False),
            StructField("admit_seq", LongType(), True),
        ]
    )
    cols = list(requests.columns)
    order = list(order_cols)

    def admit(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total_admitted, total_seen = (
            state.get if state.exists else (0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(order, kind="stable").reset_index(drop=True)
        n_admit = min(tokens_per_batch, len(rows))
        out = rows[cols].copy()
        out["admitted"] = [1] * n_admit + [0] * (len(rows) - n_admit)
        out["admit_seq"] = pd.array(
            [total_admitted + i + 1 for i in range(n_admit)]
            + [None] * (len(rows) - n_admit),
            dtype="Int64",
        )
        state.update((total_admitted + n_admit, total_seen + len(rows)))
        yield out

    return (
        requests.groupBy("host")
        .applyInPandasWithState(
            admit,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_throughput(
    events: DataFrame,
    window: str = "60 seconds",
    watermark: str = "120 seconds",
) -> DataFrame:
    """Per-host fetches per event-time window; late events beyond the
    watermark are dropped, windows finalize once (append mode).

    Input stream columns: (host long, event_time timestamp).
    """
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("host"))
        .agg(F.count("*").alias("fetched"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "fetched",
        )
    )
