"""Two-phase dense id assignment (operators/ids.py) vs the naive
single window — value equality, density, base continuation, and the
plan-shape guarantee that no window partitions on the group column
alone (the single-task-per-portal funnel the module exists to avoid).
"""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.operators.ids import with_dense_ids


def _naive(df, bases):
    base_expr = (
        F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in bases.items() for x in kv]),
                F.col("portal"),
            ),
            F.lit(0),
        )
        if bases
        else F.lit(0)
    )
    w = Window.partitionBy("portal").orderBy("admit_rank", "url")
    return df.withColumn("id", (F.row_number().over(w) + base_expr).cast("long"))


def _corpus(spark, seed=7, n=400):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        portal = f"p{rng.randint(0, 4)}"
        # several hosts per portal share admit_rank values; urls unique
        rows.append((portal, rng.randint(1, 12), f"https://h{rng.randint(0,9)}.{portal}/x{i:04d}"))
    return spark.createDataFrame(rows, "portal string, admit_rank int, url string")


def test_matches_naive_window(spark):
    df = _corpus(spark)
    bases = {"p0": 100, "p2": 7}
    got = {r["url"]: r["id"] for r in with_dense_ids(df, bases=bases).collect()}
    want = {r["url"]: r["id"] for r in _naive(df, bases).collect()}
    assert got == want


def test_dense_per_portal_no_bases(spark):
    df = _corpus(spark, seed=11, n=250)
    out = with_dense_ids(df).groupBy("portal").agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"), F.count("*").alias("n"),
        F.countDistinct("id").alias("nd"),
    )
    for r in out.collect():
        assert r["lo"] == 1
        assert r["hi"] == r["n"] == r["nd"]


def test_empty_input(spark):
    df = spark.createDataFrame([], "portal string, admit_rank int, url string")
    assert with_dense_ids(df, bases={"p0": 3}).count() == 0


def test_no_group_only_window_in_plan(spark):
    """The plan must not contain a window partitioned on the bare
    group column — that is the single-task-per-portal shape this
    module replaces. Both windows here carry a second partition key
    or operate on the group-level (one row per rank) relation."""
    df = _corpus(spark, seed=3, n=50)
    plan = with_dense_ids(df)._jdf.queryExecution().optimizedPlan().toString()
    saw_row_number = False
    for line in plan.splitlines():
        low = line.lower()
        if "row_number()" not in low or "windowspecdefinition(" not in low:
            continue
        saw_row_number = True
        spec = low.split("windowspecdefinition(", 1)[1]
        # partition entries precede the order entries (which carry
        # ASC/DESC markers): the row-level row_number window must
        # partition on (portal, admit_rank), never portal alone
        partition_cols = []
        for tok in spec.split(","):
            if " asc" in tok or " desc" in tok or "specifiedwindowframe" in tok:
                break
            partition_cols.append(tok.strip())
        assert any("portal" in c for c in partition_cols), line
        assert any("admit_rank" in c for c in partition_cols), line
    assert saw_row_number
