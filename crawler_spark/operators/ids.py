"""Per-group dense id assignment without a per-group single-task sort.

The reference's pages table hands out ids with SQLite AUTOINCREMENT
(src/harvester.py:63-79): per portal, ids are dense, deterministic,
and ordered by insertion. The direct Spark translation —
``row_number() OVER (PARTITION BY portal ORDER BY admit_rank, url)``
— is correct but funnels every row of a portal through ONE task for
the sort; applied to the post-decode relation it drags the payload
bytes through that task too, and on a Zipfian portal mix the hot
portal's straggler sets the stage time (round-3 bench: the id chain
was 29 s of a 44 s round at local[32]).

Two-phase equivalent, pure Catalyst, no single-task stage:

1. group counts per (group, rank): ``n(g, r) = count(*)``;
2. per-group cumulative offsets over the GROUP-LEVEL relation
   (one row per (group, rank) — bounded by the per-host politeness
   token budget, never by the row count), broadcast back;
3. within-(group, rank) ``row_number`` ordered by the tiebreak —
   each window partition holds at most one row per host, so the
   heavy row-level sort spreads over #ranks x #groups tasks.

id(x) = base(g) + sum(n(g, r') for r' < x.rank) + rank_of(x.url within
(g, x.rank)), which equals the single-window formulation exactly when
the tiebreak column is unique per row (URLs are, post anti-join).

Scale bound: the broadcast relation has one row per (group, rank)
pair, i.e. at most ``groups x max_tokens_per_host`` rows per round —
politeness caps tokens at round_duration / min crawl_delay, so a 60 s
round at a 0.5 s crawl-delay floor is <=120 rows per single-host
portal regardless of frontier size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dense_ids(
    df: DataFrame,
    group_col: str = "portal",
    rank_col: str = "admit_rank",
    tiebreak_col: str = "url",
    bases: dict[str, int] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Adds ``id_col``: dense per-``group_col`` ids continuing from
    ``bases``, ordered by (rank_col, tiebreak_col) within the group.

    Equivalent to ``row_number() OVER (PARTITION BY group ORDER BY
    rank, tiebreak) + base(group)`` but with no per-group single-task
    sort; ``tiebreak_col`` must be unique per row for determinism.

    NULL group/rank values are handled: the probe-side join back onto
    the aggregated offsets is null-safe (``<=>``), so a NULL-keyed row
    gets an id in its own (NULL) group instead of being silently
    dropped (groupBy already treats NULL as a group, window ordering
    puts NULLs first — both sides agree).

    NOTE: ``df`` is evaluated TWICE (the groupBy counts and the probe
    side). For a deterministic input that's invisible; a
    nondeterministic ``df`` (sampling, rand(), re-read mutable source)
    must be cached/localCheckpointed by the caller first or counts and
    probe rows can disagree (frontier.py caches; do the same).
    """
    bases = bases or {}
    base_expr = (
        F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in bases.items() for x in kv]),
                F.col(group_col),
            ),
            F.lit(0),
        )
        if bases
        else F.lit(0)
    )
    grp = df.groupBy(group_col, rank_col).agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = grp.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("long")
    ).drop("_n")
    w_in = Window.partitionBy(group_col, rank_col).orderBy(tiebreak_col)
    d, o = df.alias("_ids_d"), offs.alias("_ids_o")
    cond = d[group_col].eqNullSafe(o[group_col]) & d[rank_col].eqNullSafe(o[rank_col])
    return (
        d.join(F.broadcast(o), cond, "inner")
        .drop(o[group_col])
        .drop(o[rank_col])
        .withColumn(
            id_col,
            (F.row_number().over(w_in) + F.col("_off") + base_expr).cast("long"),
        )
        .drop("_off")
    )
