"""End-to-end streaming crawl admission.

Wires the streaming pieces into one loop: frontier rows stream in as
file micro-batches, :func:`~crawler_spark.streaming.rate_limiter.
stateful_politeness` admits up to ``tokens_per_batch`` per host per
batch with per-host state in the state store, and DEFERRED rows loop
back into the watched directory as the next wave — the streaming twin
of the batch engine's leftover-back-into-frontier union
(operators/frontier.py run_round). Admitted rows accumulate with their
cumulative per-host ``admit_seq``, which is the streaming analog of
the reference's strictly-sequential portal thread order
(src/harvester.py:420-434).

When a ``corpus`` is supplied, admitted rows are additionally FETCHED
and ROUTED exactly like the batch engine (operators/routing.py): 200
-> stored into the accumulator, first 5xx -> retried with attempt+1,
anything else -> dropped. Retries honor the batch backoff exactly
(src/harvester.py:1087-1096 sleeps retry_timeout before the one
retry): with ``robots`` supplied, routing.with_retry_round computes
the eligible wave from the host's retry_timeout_min and
``round_duration`` (one wave == one batch round), and the row waits
in a wave-keyed HOLD area until the loop reaches that wave — so the
admitted order equals the batch engine's admission order row for row.
The accumulated output is then the STORED rows only, matching the
batch engine's pages.

Exactly-once across restarts: foreachBatch is at-least-once, so every
sink is keyed by ``epoch_id`` (stable across a replayed batch).
Stored rows land in ``admitted/wave_{epoch}`` with overwrite mode;
deferred/retry rows are staged per-epoch with overwrite, then moved
onto DETERMINISTIC names — a replayed batch re-stages and re-moves
onto the same paths instead of appending duplicates. Each wave runs
as an ``availableNow`` pass over the files that have arrived since
the previous pass, all sharing one checkpoint, so per-host state (and
admit_seq) persists across restarts and killing the process at ANY
point (mid-wave included) loses nothing.

At cluster scale the file source swaps for Kafka and the loop-backs
become transactional producers keyed by the same epoch id; the loop
body is source-agnostic.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from crawler_spark.operators import politeness, routing
from crawler_spark.streaming.rate_limiter import stateful_politeness


class StatefulCrawlStream:
    """Drain a frontier through stateful streaming admission.

    ``in_dir`` is the watched stream source; ``work_dir`` holds the
    checkpoint, the admitted accumulator, per-epoch staging, and the
    retry hold area. ``corpus`` (columns at least (url, http_status,
    transient)) enables fetch + status routing; ``robots`` (columns
    (host, retry_timeout_min)) + ``round_duration`` make the retry
    backoff equal the batch engine's retry_round arithmetic.
    """

    def __init__(
        self,
        spark: SparkSession,
        in_dir: str,
        work_dir: str,
        tokens_per_batch: int,
        order_cols: tuple[str, ...] = ("priority", "sitemap_seq", "loc_seq", "url"),
        corpus: DataFrame | None = None,
        robots: DataFrame | None = None,
        round_duration: float = 60.0,
    ):
        self.spark = spark
        self.in_dir = in_dir
        self.ckpt = os.path.join(work_dir, "ckpt")
        self.admitted_dir = os.path.join(work_dir, "admitted")
        self.stage_dir = os.path.join(work_dir, "stage")
        self.hold_dir = os.path.join(work_dir, "retry_hold")
        self.tokens_per_batch = tokens_per_batch
        self.order_cols = order_cols
        self.corpus = (
            corpus.select(
                "url",
                F.col("http_status").alias("_c_status"),
                F.col("transient").alias("_c_transient"),
            )
            if corpus is not None
            else None
        )
        self.robots = (
            robots.select("host", "retry_timeout_min") if robots is not None else None
        )
        self.round_duration = round_duration
        self.waves = 0
        self.dropped = 0
        self._held: dict[int, int] = {}

    def _schema(self, frontier: DataFrame):
        return frontier.schema

    def seed(self, frontier: DataFrame) -> None:
        """Drop the initial frontier into the stream source."""
        frontier.write.mode("append").parquet(self.in_dir)

    def _stage_then_move(
        self, df: DataFrame, cols: list[str], stage: str, dst_dir: str, prefix: str
    ) -> None:
        """Overwrite-stage a row set, then move its part files onto
        deterministic names — the replay-idempotent loop-back (a
        replayed epoch re-stages and re-moves onto the same paths).
        File moves only: row data never crosses the driver."""
        df.select(*cols).write.mode("overwrite").parquet(stage)
        os.makedirs(dst_dir, exist_ok=True)
        # A replayed epoch may produce FEWER part files than its first
        # attempt (AQE / partition-count drift): sweep every file under
        # this prefix first, or higher-numbered survivors from attempt
        # one would re-inject duplicate rows next to the replay's.
        for stale in _glob.glob(os.path.join(dst_dir, f"{prefix}-*.parquet")):
            os.remove(stale)
        for i, part in enumerate(sorted(_glob.glob(os.path.join(stage, "*.parquet")))):
            os.replace(part, os.path.join(dst_dir, f"{prefix}-{i:05d}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)

    def _release_holds(self) -> None:
        """Move retry rows whose eligible wave has arrived into the
        watched dir (the stream twin of retry_round <= current round)."""
        for d in sorted(_glob.glob(os.path.join(self.hold_dir, "wave_*"))):
            w = int(os.path.basename(d).split("_")[1])
            if w > self.waves:
                continue
            for f in sorted(_glob.glob(os.path.join(d, "*.parquet"))):
                os.replace(
                    f, os.path.join(self.in_dir, f"held-{w:06d}-{os.path.basename(f)}")
                )
            shutil.rmtree(d, ignore_errors=True)
            self._held.pop(w, None)

    def _one_wave(self, schema) -> tuple[int, int]:
        """One availableNow pass: admit, route, accumulate, loop back.

        Returns (n_stored, n_open) for this wave; n_open counts rows
        still in flight (politeness-deferred + retries now in hold).
        """
        counts = {"stored": 0, "open": 0, "dropped": 0, "held": {}}
        in_cols = [f.name for f in schema.fields]
        wave = self.waves

        def sink(batch: DataFrame, epoch_id: int) -> None:
            batch.persist()
            admitted = batch.filter(batch["admitted"] == 1).drop("admitted")
            deferred = batch.filter(batch["admitted"] == 0).drop(
                "admitted", "admit_seq"
            )
            if self.corpus is not None:
                # fetch + status routing, the batch engine's exact
                # semantics: effective_status resolves the synthetic
                # fetch for this attempt, route() splits store /
                # retry-once / drop (operators/routing.py, O-14/O-38)
                fetched = admitted.join(self.corpus, on="url", how="left")
                routed = routing.route(
                    routing.effective_status(
                        fetched.withColumn(
                            "http_status", F.col("_c_status")
                        ).withColumn(
                            "transient",
                            F.coalesce(F.col("_c_transient"), F.lit(False)),
                        )
                    )
                ).persist()
                stored = routed.filter(F.col("outcome") == routing.OUT_STORE)
                retries = routed.filter(
                    F.col("outcome") == routing.OUT_RETRY
                ).withColumn("attempt", (F.col("attempt") + 1).cast("int"))
                if self.robots is not None:
                    # batch-identical backoff: retry_round = wave +
                    # max(1, ceil(retry_timeout_min * 60 / duration))
                    retries = routing.with_retry_round(
                        retries.join(F.broadcast(self.robots), on="host", how="left")
                        .withColumn(
                            "retry_timeout_min",
                            F.coalesce(
                                F.col("retry_timeout_min"),
                                F.lit(politeness.DEFAULT_RETRY_TIMEOUT_MIN),
                            ),
                        ),
                        wave,
                        self.round_duration,
                    )
                else:
                    retries = retries.withColumn(
                        "retry_round", F.lit(wave + 1).cast("int")
                    )
                n_drop = routed.filter(F.col("outcome") == routing.OUT_DROP).count()
            else:
                routed, retries, n_drop = None, None, 0
                stored = admitted

            n_stored = stored.count()
            if n_stored:
                keep = [c for c in stored.columns if c in in_cols or c == "admit_seq"]
                stored.select(*keep).write.mode("overwrite").parquet(
                    os.path.join(self.admitted_dir, f"wave_{epoch_id:06d}")
                )
            n_def = deferred.count()
            if n_def:
                self._stage_then_move(
                    deferred,
                    in_cols,
                    os.path.join(self.stage_dir, f"defer_{epoch_id:06d}"),
                    self.in_dir,
                    f"loop-{epoch_id:06d}",
                )
            n_retry = 0
            if retries is not None:
                # hold each retry until its eligible wave — per-wave
                # subdirs so _release_holds is one directory rename
                for row in (
                    retries.groupBy("retry_round").count().collect()
                ):
                    rw, n = int(row["retry_round"]), int(row["count"])
                    if not n:
                        continue
                    self._stage_then_move(
                        retries.filter(F.col("retry_round") == rw),
                        in_cols,
                        os.path.join(self.stage_dir, f"retry_{epoch_id:06d}_{rw}"),
                        os.path.join(self.hold_dir, f"wave_{rw:06d}"),
                        f"retry-{epoch_id:06d}",
                    )
                    counts["held"][rw] = counts["held"].get(rw, 0) + n
                    n_retry += n
            counts["stored"] += n_stored
            counts["open"] += n_def + n_retry
            counts["dropped"] += n_drop
            if routed is not None:
                routed.unpersist()
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
        self.dropped += counts["dropped"]
        for rw, n in counts["held"].items():
            self._held[rw] = self._held.get(rw, 0) + n
        return counts["stored"], counts["open"]

    def _empty_result(self, schema) -> DataFrame:
        out = StructType(
            [*schema.fields, StructField("admit_seq", LongType(), True)]
        )
        return self.spark.createDataFrame([], out)

    def run(self, frontier: DataFrame, max_waves: int = 100) -> DataFrame:
        """Seed the stream and loop waves until no row is in flight.

        Returns the accumulated stored rows with ``admit_seq`` — per
        host, ordering by admit_seq reproduces the batch engine's
        admission order when ``order_cols`` matches
        ``politeness.ORDER_COLS`` and the per-wave token budget equals
        the batch per-round budget. Warns if ``max_waves`` is exhausted
        with rows still in flight (the result is then a partial drain).
        """
        schema = self._schema(frontier)
        self.seed(frontier)
        n_open = 0
        for _ in range(max_waves):
            self._release_holds()
            _, n_open = self._one_wave(schema)
            if n_open == 0 and not self._held:
                break
        if n_open > 0 or self._held:
            warnings.warn(
                f"stream stopped after max_waves={max_waves} with "
                f"{n_open + sum(self._held.values())} rows still in "
                "flight — partial result",
                RuntimeWarning,
                stacklevel=2,
            )
        if not _glob.glob(os.path.join(self.admitted_dir, "wave_*")):
            return self._empty_result(schema)
        return self.spark.read.parquet(
            os.path.join(self.admitted_dir, "wave_*")
        )
