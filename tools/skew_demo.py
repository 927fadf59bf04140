"""Hot-host skew demonstration (SURVEY §7 P8, §4 item 3).

Zipfian host distributions put most of the frontier on one host; the
naive politeness plan (one Window over partitionBy(host)) serializes
the hot host's entire pending set into a single task's sort. The
engine's two-phase salted top-k (politeness.admit_split) bounds any
task's input at roughly |host| / n_salt and feeds the exact global
rank only the per-salt survivors.

This script builds a frontier where ONE host owns `hot_frac` of all
rows, times admission with n_salt=1 (naive) vs n_salt=8 (salted) at
identical semantics, asserts the admitted sets are equal, and writes
SKEW.md. Usage: python tools/skew_demo.py [n_rows] [hot_frac]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_frontier(spark, n_rows: int, hot_frac: float):
    """n_rows frontier rows; one host owns hot_frac of them, the rest
    spread over 63 cold hosts."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id"),
            F.when(F.rand(42) < hot_frac, F.lit("hot.example"))
            .otherwise(F.concat(F.lit("cold-"), (F.col("id") % 63).cast("string")))
            .alias("host"),
            F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
            F.col("id").alias("fp"),
            F.lit(0).alias("priority"),
            F.lit(0).alias("sitemap_seq"),
            F.col("id").cast("int").alias("loc_seq"),
        )
        .cache()
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    tokens = 2000

    from crawler_spark.operators import politeness
    from crawler_spark.session import get_spark

    # skew experiments need window width: the salted phase can only go
    # as wide as the shuffle-partition count
    spark = get_spark(shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    frontier = build_frontier(spark, n_rows, hot_frac)
    frontier.count()
    robots = (
        frontier.select("host")
        .distinct()
        .withColumn("requests_per_minute", F.lit(float(tokens)))
        .withColumn("robots_crawl_delay", F.lit(None).cast("double"))
        .withColumn("retry_timeout_min", F.lit(5))
    )

    # cache=False: time the pure admission decision (the windows/sorts)
    # — the leftover projection costs the same in both variants.
    results = {}
    admitted_sets = {}
    for n_salt in (32, 1, 32, 1):  # interleaved, first pair is warmup
        t0 = time.time()
        admitted, _leftover, _handle = politeness.admit_split(
            frontier, robots, round_duration=60.0, n_salt=n_salt, cache=False
        )
        n_adm = admitted.count()
        dt = time.time() - t0
        key = f"n_salt={n_salt}"
        if key in results:  # keep the measured (second) pass
            results[key] = {"secs": round(dt, 2), "admitted": n_adm}
            admitted_sets[key] = {
                r["url"] for r in admitted.select("url").collect()
            }
        else:
            results[key] = None

    assert admitted_sets["n_salt=32"] == admitted_sets["n_salt=1"], "semantics differ!"
    r8, r1 = results["n_salt=32"], results["n_salt=1"]
    speedup = round(r1["secs"] / r8["secs"], 2)
    lines = [
        "# SKEW — salted politeness admission vs naive window (auto-written by tools/skew_demo.py)",
        "",
        f"Frontier: {n_rows:,} rows, one host holding {hot_frac:.0%}, "
        f"token budget {tokens}/host/round, local[32].",
        "",
        "| plan | admission wall | admitted |",
        "|---|---|---|",
        f"| naive single window (n_salt=1) | {r1['secs']}s | {r1['admitted']} |",
        f"| two-phase salted top-k (n_salt=32) | {r8['secs']}s | {r8['admitted']} |",
        "",
        f"Salting speedup on this corpus: **{speedup}x**; admitted sets verified identical.",
        "",
        "Why it matters at 10^10: the naive plan's hot-host sort is a single",
        "task whose input grows with the host's frontier share — a straggler",
        "that AQE cannot split (row_number over one partition). The salted",
        "phase caps any task at |host|/n_salt rows and only per-salt top-k",
        "survivors (<= n_salt x tokens per host) reach the exact global rank.",
        "n_salt scales with the hot host's share, independent of cluster size.",
        "",
    ]
    with open("SKEW.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
