"""Regression tests for the round-5 fix batch (VERDICT r4 / ADVICE r4).

Each test pins one fix:
  - with_dense_ids: NULL group/rank rows are kept (null-safe probe join)
  - decode_flac: STREAMINFO total_samples == 0 means UNKNOWN, decode to
    end of data instead of stopping after the first frame
  - StatefulCrawlStream._stage_then_move: a replay that yields FEWER
    part files sweeps the first attempt's higher-numbered survivors
  - SnapshotCatalog.stage_overwrite / commit_staged_overwrite: staged
    bytes are invisible until the manifest swap (crash ordering holds)
  - IVF centroid cache: public-API key (plan text + input files), hit
    verified without touching private attrs; invalidation works
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ------------------------------------------------------------ dense ids


def test_with_dense_ids_keeps_null_keyed_rows(spark):
    from crawler_spark.operators.ids import with_dense_ids

    rows = [
        Row(portal="a", admit_rank=0, url="u1"),
        Row(portal="a", admit_rank=0, url="u2"),
        Row(portal=None, admit_rank=0, url="u3"),
        Row(portal="a", admit_rank=None, url="u4"),
        Row(portal=None, admit_rank=None, url="u5"),
    ]
    df = spark.createDataFrame(rows)
    out = with_dense_ids(df, bases={"a": 100}).collect()
    assert len(out) == len(rows)  # no silent drops
    by_url = {r.url: r for r in out}
    # NULL-group rows form their own group starting at base 0
    null_ids = sorted(r.id for r in out if r.portal is None)
    assert null_ids == [1, 2]
    # non-null group continues from its base, NULL rank ordered first
    # (window NULLS FIRST == groupBy's NULL group agreement)
    a_ids = sorted(by_url[u].id for u in ("u1", "u2", "u4"))
    assert a_ids == [101, 102, 103]
    assert by_url["u4"].id == 101  # NULL rank sorts first


def test_with_dense_ids_matches_naive_window_with_nulls(spark):
    from pyspark.sql import Window

    from crawler_spark.operators.ids import with_dense_ids

    rows = [
        Row(portal=p, admit_rank=r, url=f"u{p}{r}{i}")
        for p in ("x", "y", None)
        for r in (2, 0, None, 1)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "portal string, admit_rank int, url string")
    got = {
        r.url: r.id
        for r in with_dense_ids(df).collect()
    }
    w = Window.partitionBy("portal").orderBy(
        F.col("admit_rank").asc_nulls_first(), F.col("url")
    )
    want = {
        r.url: r.id
        for r in df.withColumn("id", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


# ------------------------------------------------------------ flac


def test_flac_unknown_total_decodes_all_frames():
    from crawler_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(7)
    n = 10_000  # 3 frames at block_size 4096
    pcm = (rng.integers(-3000, 3000, size=(n, 2))).astype(np.int16)
    data = bytearray(encode_flac(pcm, 8000, block_size=4096))
    # STREAMINFO packed u64 lives at offset 18 (fLaC + 4-byte block
    # header + 2+2 blocksize + 3+3 framesize); zero its low 36 bits
    # (total_samples) -> legal "unknown length" stream per RFC 9639.
    packed = int.from_bytes(data[18:26], "big")
    assert (packed & ((1 << 36) - 1)) == n
    data[18:26] = (packed & ~((1 << 36) - 1)).to_bytes(8, "big")
    dec, rate = decode_flac(bytes(data))
    assert rate == 8000
    assert dec.shape == pcm.shape  # ALL frames, not just the first
    assert np.array_equal(dec, pcm)


# ------------------------------------------------------------ streaming


def test_stage_then_move_sweeps_stale_higher_parts(spark, tmp_path):
    from crawler_spark.streaming.crawl_stream import StatefulCrawlStream

    dst = str(tmp_path / "loop")
    stage = str(tmp_path / "stage")
    df3 = spark.range(30).repartition(3)
    StatefulCrawlStream._stage_then_move(None, df3, ["id"], stage, dst, "wave-000001")
    first = sorted(os.path.basename(p) for p in glob.glob(os.path.join(dst, "*.parquet")))
    assert len(first) == 3
    # replay of the SAME epoch now produces one part (AQE drift twin)
    df1 = spark.range(30).coalesce(1)
    StatefulCrawlStream._stage_then_move(None, df1, ["id"], stage, dst, "wave-000001")
    left = sorted(os.path.basename(p) for p in glob.glob(os.path.join(dst, "*.parquet")))
    assert left == ["wave-000001-00000.parquet"]  # survivors swept
    got = spark.read.parquet(dst)
    assert got.count() == 30  # rows once, not 30 + leftovers
    # an unrelated prefix in the same dir is untouched
    StatefulCrawlStream._stage_then_move(None, df1, ["id"], stage, dst, "wave-000002")
    left = sorted(os.path.basename(p) for p in glob.glob(os.path.join(dst, "*.parquet")))
    assert left == ["wave-000001-00000.parquet", "wave-000002-00000.parquet"]


# ------------------------------------------------------------ storage


def test_staged_overwrite_invisible_until_commit(spark, tmp_path):
    from crawler_spark.storage import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    cat.overwrite("t", spark.createDataFrame([Row(x=1)]), properties={"round": 0})
    staged = cat.stage_overwrite("t", spark.createDataFrame([Row(x=2)]))
    # crash window: bytes written, pointer not swapped -> readers (and
    # a resumed run) still see the old snapshot
    fresh = SnapshotCatalog(spark, str(tmp_path / "cat"))
    assert [r.x for r in fresh.read("t").collect()] == [1]
    assert fresh.properties("t") == {"round": 0}
    cat.commit_staged_overwrite("t", staged, properties={"round": 1})
    fresh2 = SnapshotCatalog(spark, str(tmp_path / "cat"))
    assert [r.x for r in fresh2.read("t").collect()] == [2]
    assert fresh2.properties("t") == {"round": 1}


# ------------------------------------------------------------ IVF cache


def test_ivf_cache_public_key_hit_and_invalidation(spark, tmp_path):
    from crawler_spark.operators.similarity import (
        invalidate_ivf_cache,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(3)
    rows = [
        Row(vec_id=i, vec=[float(v) for v in rng.normal(size=8)]) for i in range(64)
    ]
    p = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows).write.parquet(p)
    emb = spark.read.parquet(p)

    invalidate_ivf_cache()
    c1 = train_ivf_centroids(emb, n_cells=4, sample=64, iters=2, vec_col="vec")
    c2 = train_ivf_centroids(spark.read.parquet(p), n_cells=4, sample=64, iters=2, vec_col="vec")
    assert c2 is c1  # cache hit across two separately-built plans on the same files

    # hyperparameter change misses
    c3 = train_ivf_centroids(emb, n_cells=2, sample=64, iters=2, vec_col="vec")
    assert c3 is not c1

    # data-version token: same logical shape, DIFFERENT backing files -> miss
    p2 = str(tmp_path / "emb2.parquet")
    spark.createDataFrame(rows).write.parquet(p2)
    c4 = train_ivf_centroids(spark.read.parquet(p2), n_cells=4, sample=64, iters=2, vec_col="vec")
    assert c4 is not c1
    assert np.array_equal(c4, c1)  # same data -> same centroids, new entry

    invalidate_ivf_cache()
    c5 = train_ivf_centroids(emb, n_cells=4, sample=64, iters=2, vec_col="vec")
    assert c5 is not c1  # cache cleared


def test_ivf_cache_key_uses_no_private_attrs(spark, tmp_path):
    """The round-4 key probed ``df._jdf.queryExecution()``; the key must
    now survive a DataFrame whose private JVM handle is poisoned."""
    from crawler_spark.operators.similarity import _ivf_cache_key

    rows = [Row(vec_id=i, vec=[float(i), 1.0]) for i in range(8)]
    p = str(tmp_path / "emb3.parquet")
    spark.createDataFrame(rows).write.parquet(p)
    emb = spark.read.parquet(p)
    key = _ivf_cache_key(emb)
    assert isinstance(key, tuple) and key[1] and all("emb3" in f for f in key[1])
    assert "_jdf" not in repr(type(key))  # sanity: key is plain data
