"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline (and DuckDB
oracle twin), LSH random-hyperplane bucketing as the scale path —
at 10^10 vectors brute force is O(N·Q); hyperplane buckets cut the
candidate set to one bucket (plus multiprobe neighbors) per query.

All arithmetic is native Spark (zip_with/aggregate, JVM codegen) in
double precision so the oracle can reproduce values bit-closely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    queries is small (broadcast): the crossJoin is a broadcast
    nested-loop — each embedding partition streams once, no shuffle
    until the final per-query top-k window over k·|partitions| rows.
    """
    joined = embeddings.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit signature of a vector against the hyperplanes -> int."""
    bucket = F.lit(0).cast("long")
    for p in planes:
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane bucket with the
    query in at least one of ``n_tables`` independent LSH tables.

    Recall/latency trade: fewer planes = bigger buckets = higher
    recall; more tables = more chances to collide (recall ->
    1-(1-p^planes)^tables). At cluster scale the embeddings side is
    written bucketed by (table, bucket) so each probe is a
    partition-pruned scan, not a full pass.
    """
    if dim is None:
        dim = len(queries.select(query_vec_col).first()[0])

    def bucket_array(col):
        return F.array(
            *[
                lsh_bucket(col, hyperplanes(dim, n_planes, seed=42 + t))
                for t in range(n_tables)
            ]
        )

    emb_b = embeddings.select(
        id_col, vec_col, F.posexplode(bucket_array(F.col(vec_col))).alias("table", "bucket")
    )
    q_b = queries.select(
        query_id_col,
        query_vec_col,
        F.posexplode(bucket_array(F.col(query_vec_col))).alias("table", "bucket"),
    )
    joined = (
        emb_b.join(F.broadcast(q_b), on=["table", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join.

    Bucket collision -> candidate pair -> exact cosine filter. Near
    duplicates (cosine ~ 1) collide with high probability since the
    hyperplane sign pattern flips with prob acos(sim)/pi per plane.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    b = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
