"""Deduplication operators for training-data pipelines.

Five dedup families over a documents table, each with the 100 TB
scale path spelled out:

- exact: hash-groupBy on the text (one shuffle, map-side combine)
- n-gram Jaccard: shingle explode + self-join — exact but O(pairs
  sharing a shingle); the SQL-oracle-checkable ground truth
- MinHash + LSH: signatures fully native (xxhash64, JVM), banded
  bucket join — the scale path; candidates verified with exact Jaccard
- SimHash: 64-bit bit-vote fingerprint via Arrow-batched pandas UDF,
  near-dup = small Hamming distance within buckets
- embedding cosine near-dup: see similarity.py

The reference's only dedup is the URL UNIQUE anti-join
(src/harvester.py:133-166); these generalize it to content identity,
which is what a crawl corpus at 10^10 pages actually needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# --------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical text.

    groupBy on a 64-bit text hash (shuffle on the hash, map-side
    partial min), then a residual equality check on text within hash
    groups would guard collisions; at 64-bit xxhash + min-id-wins the
    collision term is negligible and the check is kept (cheap: only
    within groups >1).
    """
    h = F.xxhash64(F.col(text_col))
    w = Window.partitionBy(F.col(text_col))
    return (
        docs.withColumn("_h", h)
        .withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_h", "_keep")
    )


def exact_dup_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(kept_id, dup_id) pairs of identical texts."""
    w = Window.partitionBy(F.col(text_col))
    return (
        docs.select(id_col, text_col)
        .withColumn("kept_id", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("kept_id"))
        .select("kept_id", F.col(id_col).alias("dup_id"))
    )


# ------------------------------------------------------------ shingles


def with_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Word n-gram shingles as array<string> — pure native exprs."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return docs.withColumn("shingles", F.array_distinct(shingles))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity over all pairs sharing >=1 shingle.

    explode -> self-join on shingle -> per-pair intersection count ->
    |A ∪ B| = |A| + |B| - |A ∩ B|. This is the ground-truth (and
    DuckDB-oracle-expressible) variant; use minhash_lsh_pairs at scale.
    """
    sh = with_shingles(docs, n, text_col).select(
        F.col(id_col).alias("id"), F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on=[F.col("a.s") == F.col("b.s"), F.col("a.id") < F.col("b.id")])
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ------------------------------------------------------------- minhash


def minhash_signature(n_hashes: int = 64):
    """array<long> minhash signature from a shingles column.

    sig[i] = min over shingles of xxhash64(i || shingle) — all JVM
    expressions, no Python. n_hashes columns of work fused into one
    array expression; Tungsten evaluates per row without shuffles.
    """

    def expr(shingles_col):
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        shingles_col,
                        lambda s, i=i: F.xxhash64(F.concat(F.lit(f"{i}|"), s)),
                    )
                )
                for i in range(n_hashes)
            ]
        )

    return expr


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    bands x rows = n_hashes; two docs collide if any band's signature
    slice hashes equal. The bucket join shuffles on (band, bucket_hash)
    — at 10^10 docs this is the only all-pairs-free dedup: cost is
    O(docs x bands) + O(candidate pairs), not O(docs^2).
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signature(n_hashes)
    with_sig = with_shingles(docs, n, text_col).withColumn("sig", sig(F.col("shingles")))

    banded = with_sig.select(
        F.col(id_col).alias("id"),
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "shingles", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if not verify:
        return cands.select("id_a", "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ------------------------------------------------------------- simhash


@F.pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token FNV-1a hashes bit-voted into a
    fingerprint. Arrow-batched; numpy does the bit voting."""
    out = []
    for t in text:
        if not isinstance(t, str) or not t.strip():
            out.append(0)
            continue
        votes = np.zeros(64, dtype=np.int64)
        for tok in t.lower().split():
            h = np.uint64(0xCBF29CE484222325)
            for ch in tok.encode("utf-8"):
                h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
            votes += np.where(bits.astype(np.int64) == 1, 1, -1)
        fp = 0
        for bit in (votes >= 0).astype(int):
            fp = (fp << 1) | int(bit)
        out.append((fp & ((1 << 63) - 1)) - (fp & (1 << 63)))
    return pd.Series(out, dtype="int64")


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on 16-bit quadrants (a pair within Hamming<=3 of
    64 bits must agree exactly on >=1 of 4 quadrants — pigeonhole), so
    the join is on quadrant equality, never all-pairs.
    """
    sh = docs.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    quads = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("sh", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("id", "sh", "qq.q", "qq.qv")
    a, b = quads.alias("a"), quads.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            on=[
                F.col("a.q") == F.col("b.q"),
                F.col("a.qv") == F.col("b.qv"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
