"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with typed metadata
(w, h, fmt / sample_rate, duration / fps, n_frames). The Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is fully real and tested; the heavy codec calls
are STUBBED (this container has no image/audio libraries): 'raw'
payloads decode with numpy, everything else raises
NotImplementedError exactly where a Pillow/ffmpeg call would go.

Scale notes: payload rows are wide (KB-MB); the iterator-of-batches
mapInPandas form streams Arrow batches without materializing a
partition in memory, and spark.sql.files.maxPartitionBytes should be
sized so (rows per partition x payload size) fits the executor — at
100 TB that matters more than anything else in this file.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark.functions.payload import decode_payload, phash64

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("phash", LongType(), True),
        StructField("mean_rgb", ArrayType(DoubleType()), True),
        StructField("std_gray", DoubleType(), True),
        StructField("decode_ok", IntegerType(), False),
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract image payloads via mapInPandas.

    Input columns: image_id, bytes, w, h, fmt. Streams Arrow batches;
    per-batch numpy vectorization, no per-row Python in the plan.
    """
    fields = ["image_id", "bytes", "w", "h", "fmt"]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "w", "h", "phash", "mean_rgb", "std_gray", "decode_ok")}
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                out["image_id"].append(iid)
                out["w"].append(int(w))
                out["h"].append(int(h))
                try:
                    px = decode_payload(bytes(data), int(w), int(h), fmt)
                    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    out["phash"].append(phash64(px))
                    out["mean_rgb"].append([float(m) for m in px.mean(axis=(0, 1))])
                    out["std_gray"].append(float(gray.std()))
                    out["decode_ok"].append(1)
                except (ValueError, NotImplementedError, TypeError):
                    out["phash"].append(None)
                    out["mean_rgb"].append(None)
                    out["std_gray"].append(None)
                    out["decode_ok"].append(0)
            yield pd.DataFrame(out)

    return df.select(*fields).mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
    ]
)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of raw payloads (deterministic numpy);
    non-raw formats would call a codec here -> stubbed."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for iid, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_payload(bytes(data), int(w), int(h), fmt)  # raises for non-raw: stub
                ri = (np.arange(target_h) * int(h)) // target_h
                ci = (np.arange(target_w) * int(w)) // target_w
                small = px[np.ix_(ri, ci)]
                rows["image_id"].append(iid)
                rows["bytes"].append(small.tobytes())
                rows["w"].append(target_w)
                rows["h"].append(target_h)
                rows["fmt"].append("raw")
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(rz, schema=RESIZE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB: the ffmpeg decode belongs here.

    The plumbing contract is the real deliverable: input (video_id,
    bytes, fps, n_frames), output one row per sampled frame with the
    same binary-column shape as images, computed in mapInPandas.
    """
    raise NotImplementedError(
        "video codecs unavailable in this environment; "
        "plumbing contract: mapInPandas (video_id, bytes, fps, n_frames) "
        f"-> (video_id, frame_idx % {every_n} == 0, bytes, w, h, fmt='raw')"
    )
