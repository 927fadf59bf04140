"""SparkSession factory with scale-oriented defaults.

The reference is a single-process crawler (one OS thread per portal,
src/crawler.py:114-131); here parallelism comes from partitioning, so
the session is tuned for: Arrow-batched pandas UDFs in the hot path,
AQE for runtime re-planning (skew joins on Zipfian host
distributions), and shuffle partition counts sized to the local core
budget (overridden upward on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster pass ``None`` with ``--master`` supplied by
    spark-submit and these settings still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Single-JVM local mode: per-task cost is pure overhead for the
        # many small relational stages, so fewer, larger shuffle
        # partitions win (the wide payload stage is repartitioned to
        # the full core budget explicitly by the engine). On a real
        # cluster set 2-3x total executor cores via spark-submit conf.
        n = cpus if cpus != "*" else str(os.cpu_count() or 8)
        shuffle_partitions = max(8, int(n) // 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join splitting (hot hosts).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast the true dimension tables (keywords, robots_rules,
        # host token budgets — all KBs) but NOT mid-size fact tables:
        # at 10^10 URLs neither the corpus nor the seen set can ever
        # broadcast, so the local plan should shuffle them too — and
        # re-broadcasting MBs per round is slower than a co-partitioned
        # join anyway.
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
