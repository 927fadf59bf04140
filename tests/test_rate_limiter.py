"""Stateful streaming operators: applyInPandasWithState politeness and
watermarked windowed throughput (crawler_spark.streaming.rate_limiter).

File-source micro-batches with maxFilesPerTrigger=1 force MULTIPLE
micro-batches per run, so per-host state genuinely persists across
batches and the watermark genuinely advances between them.
"""

import time
from datetime import datetime, timezone

import pandas as pd
import pytest

from crawler_spark.streaming.rate_limiter import (
    stateful_politeness,
    windowed_throughput,
)


def _run_stream(spark, src_df_builder, seed_dir, ckpt, build_query, sink_name):
    stream = src_df_builder()
    out = build_query(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(sink_name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(sink_name)


def test_stateful_politeness_state_survives_batches(spark, tmp_path):
    seed_dir = str(tmp_path / "req")
    ckpt = str(tmp_path / "ckpt")
    b1 = pd.DataFrame(
        {"host": [1, 1, 1, 2], "url": ["a", "b", "c", "x"], "priority": [0, 0, 0, 0]}
    )
    b2 = pd.DataFrame(
        {"host": [1, 1, 2], "url": ["d", "e", "y"], "priority": [0, 0, 0]}
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(seed_dir)
    # distinct file mtimes so maxFilesPerTrigger orders deterministically
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(seed_dir)

    name = f"admit_sink_{int(time.time())}"
    got = _run_stream(
        spark,
        lambda: (
            spark.readStream.schema("host long, url string, priority long")
            .option("maxFilesPerTrigger", 1)
            .parquet(seed_dir)
        ),
        seed_dir,
        ckpt,
        lambda s: stateful_politeness(s, tokens_per_batch=2),
        name,
    ).toPandas()

    assert len(got) == 7  # every row emitted, admitted or deferred
    h1 = got[got["host"] == 1]
    # per batch at most 2 admitted for host 1 (3 then 2 requests)
    assert int(h1["admitted"].sum()) == 4
    deferred = h1[h1["admitted"] == 0]
    assert len(deferred) == 1 and deferred.iloc[0]["url"] == "c"
    # the cumulative admit_seq continues across micro-batches: 1..4
    seqs = sorted(int(s) for s in h1[h1["admitted"] == 1]["admit_seq"])
    assert seqs == [1, 2, 3, 4]
    h2 = got[got["host"] == 2]
    assert sorted(int(s) for s in h2[h2["admitted"] == 1]["admit_seq"]) == [1, 2]


def test_windowed_throughput_drops_late_events(spark, tmp_path):
    seed_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt2")

    def ts(minute, sec=0):
        return datetime(2026, 1, 1, 12, minute, sec, tzinfo=timezone.utc)

    # batch 1: events through 12:05 -> watermark after b1 = 12:03
    b1 = pd.DataFrame({"host": [1, 1, 1, 1], "event_time": [ts(0, 10), ts(0, 40), ts(1, 10), ts(5, 0)]})
    # batch 2 finalizes+EVICTS windows ending <= 12:03 (the [12:00,12:01)
    # window emits with exactly 2 rows) and moves the watermark to 12:04
    b2 = pd.DataFrame({"host": [1], "event_time": [ts(6, 0)]})
    # batch 3: a LATE event for the already-evicted [12:00,12:01) window —
    # behind the watermark with no state left, it MUST be dropped (the
    # append-mode exactly-once guarantee: a finalized window never
    # re-emits); 12:20 closes the remaining windows
    b3 = pd.DataFrame({"host": [1, 1], "event_time": [ts(0, 50), ts(20, 0)]})
    for b in (b1, b2, b3):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(seed_dir)
        time.sleep(1.1)

    name = f"tp_sink_{int(time.time())}"
    got = _run_stream(
        spark,
        lambda: (
            spark.readStream.schema("host long, event_time timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(seed_dir)
        ),
        seed_dir,
        ckpt,
        windowed_throughput,
        name,
    ).toPandas()

    starts = [r["window_start"].strftime("%H:%M") for _, r in got.iterrows()]
    assert starts.count("12:00") == 1  # finalized once, never re-emitted
    by_window = {
        r["window_start"].strftime("%H:%M"): int(r["fetched"])
        for _, r in got.iterrows()
    }
    # the [12:00,12:01) window finalized with 2 events; the late third
    # one (batch 3, behind the watermark, state evicted) was dropped
    assert by_window["12:00"] == 2
    assert by_window["12:01"] == 1
    assert by_window["12:05"] == 1
    assert by_window["12:06"] == 1
