"""Per-host politeness admission as a window-ranked priority queue.

The reference sleeps the remainder of
``crawl_delay = max(60/requests_per_minute, robots Crawl-delay)``
before every fetch (src/harvester.py:420-434; etc/config.yml:5,9,14).
In a distributed round-based scheduler the same budget becomes a
per-host TOKEN COUNT per round:

    tokens(host) = max(1, floor(round_duration / crawl_delay))

and admission = the ``tokens`` highest-priority pending rows per
host, ordered by (priority, sitemap_seq, loc_seq) so per-host
emission order equals the reference's strict sitemap document order
(SURVEY O-36/O-37). The rest of the frontier stays pending for the
next round.

Scale note — the naive plan is one Window over partitionBy(host),
which serializes each hot host's full pending set into a single task
sort (Zipfian hosts make this the bottleneck). Since only the top
``tokens`` rows per host survive, we use two-phase top-k: a salted
local rank first (partition (host, salt), keep rank <= tokens inside
each salt), which shrinks the input of the exact global per-host rank
to at most n_salt * tokens rows per host. Both phases are pure
DataFrame ops; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "sitemap_seq", "loc_seq", "url"]


DEFAULT_RPM = 1.0  # conservative budget for hosts with no robots entry
DEFAULT_RETRY_TIMEOUT_MIN = 5


def with_tokens(df_with_host: DataFrame, robots: DataFrame, round_duration: float) -> DataFrame:
    """Broadcast-join the per-host token budget onto frontier rows.

    LEFT join: hosts outside the robots table (in-page-discovered
    outlinks, streamed seeds) must not silently vanish from the crawl
    — they get a conservative default budget (DEFAULT_RPM req/min)
    instead. An inner join here would delete them from both admitted
    and leftover, i.e. from the frontier entirely.
    """
    # robots_crawl_delay arrives as SQL NULL from parquet but as NaN
    # from pandas-built robots tables; Spark's greatest() sorts NaN
    # ABOVE every number (unlike Python max), so a bare coalesce would
    # silently turn "no Crawl-delay line" into crawl_delay=NaN ->
    # tokens cast to 0 -> 1 URL/host/round. nanvl first: absent means
    # "use the rpm budget" (reference: protego crawl_delay() is None,
    # src/harvester.py:420-434).
    budget = robots.select(
        "host",
        F.greatest(
            60.0 / F.col("requests_per_minute"),
            F.coalesce(
                F.nanvl(F.col("robots_crawl_delay"), F.lit(None).cast("double")),
                F.lit(0.0),
            ),
        ).alias("crawl_delay"),
        "retry_timeout_min",
    ).withColumn(
        "tokens",
        F.greatest(F.lit(1), F.floor(F.lit(round_duration) / F.col("crawl_delay"))).cast("int"),
    )
    default_tokens = max(1, int(round_duration / (60.0 / DEFAULT_RPM)))
    return (
        df_with_host.join(F.broadcast(budget), on="host", how="left")
        .withColumn("crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(60.0 / DEFAULT_RPM)))
        .withColumn("tokens", F.coalesce(F.col("tokens"), F.lit(default_tokens).cast("int")))
        .withColumn(
            "retry_timeout_min",
            F.coalesce(F.col("retry_timeout_min"), F.lit(DEFAULT_RETRY_TIMEOUT_MIN).cast("int")),
        )
    )


def admit(
    pending: DataFrame,
    robots: DataFrame,
    round_duration: float = 60.0,
    n_salt: int = 8,
) -> DataFrame:
    """Admit up to tokens(host) rows per host; adds ``admit_rank``.

    ``admit_rank`` is the deterministic per-host emission order — the
    engine's analog of the reference's sequential fetch order within
    a portal thread.
    """
    admitted, _, _ = admit_split(pending, robots, round_duration, n_salt, cache=False)
    return admitted


def admit_split(
    pending: DataFrame,
    robots: DataFrame,
    round_duration: float = 60.0,
    n_salt: int = 8,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Split pending into (admitted, leftover, cache_handle).

    ``admitted`` carries ``admit_rank``; ``leftover`` is every pending
    row that did NOT make this round's token budget, with its original
    columns — the caller unions it straight back into the next
    frontier snapshot (no join against the admitted set needed).
    ``cache_handle`` (when ``cache``) must be unpersisted by the
    caller once both sides are consumed.
    """
    df = with_tokens(pending, robots, round_duration)

    if n_salt > 1:
        # Phase 1: salted local rank — bounds any single task's sort on
        # Zipfian hot hosts. Rows with local rank > tokens cannot make
        # the global cut, so they go straight to leftover.
        salt = F.pmod(F.col("fp"), F.lit(n_salt))
        w_local = Window.partitionBy(F.col("host"), salt).orderBy(*[F.col(c) for c in ORDER_COLS])
        df = df.withColumn("_lr", F.row_number().over(w_local))
    else:
        df = df.withColumn("_lr", F.lit(1))

    handle = None
    if cache:
        handle = df.cache()
        df = handle

    survivors = df.filter(F.col("_lr") <= F.col("tokens"))
    # Phase 2: exact global per-host rank on the reduced set.
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in ORDER_COLS])
    ranked = survivors.withColumn("admit_rank", F.row_number().over(w))
    admitted = ranked.filter(F.col("admit_rank") <= F.col("tokens")).drop(
        "_lr", "tokens", "crawl_delay"
    )
    leftover = (
        df.filter(F.col("_lr") > F.col("tokens"))
        .unionByName(
            ranked.filter(F.col("admit_rank") > F.col("tokens")).drop("admit_rank")
        )
        .drop("_lr", "tokens", "crawl_delay", "retry_timeout_min")
    )
    return admitted, leftover, handle
