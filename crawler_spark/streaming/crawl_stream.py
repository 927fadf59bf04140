"""End-to-end streaming crawl admission.

Wires the two streaming pieces into one loop: frontier rows stream in
as file micro-batches, :func:`~crawler_spark.streaming.rate_limiter.
stateful_politeness` admits up to ``tokens_per_batch`` per host per
batch with per-host state in the state store, and DEFERRED rows loop
back into the watched directory as the next wave — the streaming twin
of the batch engine's leftover-back-into-frontier union
(operators/frontier.py run_round). Admitted rows accumulate with their
cumulative per-host ``admit_seq``, which is the streaming analog of
the reference's strictly-sequential portal thread order
(src/harvester.py:420-434).

Each wave runs as an ``availableNow`` pass over the files that have
arrived since the previous pass, all sharing one checkpoint — so the
per-host state (and therefore admit_seq) genuinely persists across
restarts, which doubles as the resume story: killing the process
between waves loses nothing.

At cluster scale the file source swaps for Kafka and the deferred
write-back becomes a producer into the same topic; the loop body is
source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.streaming.rate_limiter import stateful_politeness


class StatefulCrawlStream:
    """Drain a frontier through stateful streaming admission.

    ``in_dir`` is the watched stream source; ``work_dir`` holds the
    checkpoint and the admitted-rows accumulator.
    """

    def __init__(
        self,
        spark: SparkSession,
        in_dir: str,
        work_dir: str,
        tokens_per_batch: int,
        order_cols: tuple[str, ...] = ("priority", "sitemap_seq", "loc_seq", "url"),
    ):
        self.spark = spark
        self.in_dir = in_dir
        self.ckpt = os.path.join(work_dir, "ckpt")
        self.admitted_dir = os.path.join(work_dir, "admitted")
        self.tokens_per_batch = tokens_per_batch
        self.order_cols = order_cols
        self.waves = 0

    def _schema(self, frontier: DataFrame):
        return frontier.schema

    def seed(self, frontier: DataFrame) -> None:
        """Drop the initial frontier into the stream source."""
        frontier.write.mode("append").parquet(self.in_dir)

    def _one_wave(self, schema) -> tuple[int, int]:
        """One availableNow pass: admit, accumulate, loop deferred back.

        Returns (n_admitted, n_deferred) for this wave.
        """
        counts = {"admitted": 0, "deferred": 0}
        in_cols = [f.name for f in schema.fields]

        def sink(batch: DataFrame, epoch_id: int) -> None:
            batch.persist()
            admitted = batch.filter(batch["admitted"] == 1).drop("admitted")
            deferred = batch.filter(batch["admitted"] == 0).drop(
                "admitted", "admit_seq"
            )
            n_adm = admitted.count()
            if n_adm:
                admitted.write.mode("append").parquet(self.admitted_dir)
            # availableNow snapshots the file listing at query start, so
            # files appended here are NOT reprocessed within this wave —
            # they form the next wave. The write stays executor-side
            # (no driver round-trip: at cluster scale the deferred set
            # is the hot-host backlog, which can dwarf the admitted set).
            n_def = deferred.count()
            if n_def:
                deferred.select(*in_cols).write.mode("append").parquet(self.in_dir)
            counts["admitted"] += n_adm
            counts["deferred"] += n_def
            batch.unpersist()

        q = (
            self.spark.readStream.schema(schema)
            .parquet(self.in_dir)
            .transform(
                lambda df: stateful_politeness(
                    df, self.tokens_per_batch, order_cols=self.order_cols
                )
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        self.waves += 1
        return counts["admitted"], counts["deferred"]

    def run(self, frontier: DataFrame, max_waves: int = 100) -> DataFrame:
        """Seed the stream and loop waves until no row is deferred.

        Returns the accumulated admitted rows with ``admit_seq`` —
        per host, ordering by admit_seq reproduces the batch engine's
        admission order when ``order_cols`` matches
        ``politeness.ORDER_COLS`` and the per-wave token budget equals
        the batch per-round budget.
        """
        schema = self._schema(frontier)
        self.seed(frontier)
        for _ in range(max_waves):
            _, n_def = self._one_wave(schema)
            if n_def == 0:
                break
        return self.spark.read.parquet(self.admitted_dir)
