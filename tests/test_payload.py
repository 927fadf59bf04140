"""Payload codec / phash / PSNR tests (UDF family 2)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.payload import (
    decode_payload,
    encode_payload,
    parse_payload,
    phash64,
    pixels_for,
    psnr,
    synth_fetch_bytes,
)


def test_roundtrip_raw():
    px = pixels_for("img_x", 64, 96)
    assert px.shape == (96, 64, 3) and px.dtype == np.uint8
    back = decode_payload(encode_payload(px), 64, 96)
    assert np.array_equal(px, back)


def test_decode_size_mismatch():
    with pytest.raises(ValueError):
        decode_payload(b"\x00" * 10, 64, 96)


def test_unsupported_codec_stubbed():
    with pytest.raises(NotImplementedError):
        encode_payload(pixels_for("a", 32, 32), "png")
    with pytest.raises(NotImplementedError):
        decode_payload(b"", 32, 32, "jpeg")


def test_phash_deterministic_and_discriminative():
    a = phash64(pixels_for("img_1", 64, 64))
    assert a == phash64(pixels_for("img_1", 64, 64))
    others = [phash64(pixels_for(f"img_{i}", 64, 64)) for i in range(2, 12)]
    assert a not in others
    assert all(-(1 << 63) <= v < (1 << 63) for v in [a, *others])


def test_phash_robust_to_small_noise():
    px = pixels_for("img_stable", 96, 96).astype(np.int16)
    noisy = np.clip(px + np.random.default_rng(0).integers(-2, 3, px.shape), 0, 255).astype(
        np.uint8
    )
    h1, h2 = phash64(px.astype(np.uint8)), phash64(noisy)
    assert bin((h1 & ((1 << 64) - 1)) ^ (h2 & ((1 << 64) - 1))).count("1") <= 10


def test_psnr():
    px = pixels_for("img_p", 32, 32)
    assert psnr(px, px) == float("inf")
    other = pixels_for("img_q", 32, 32)
    assert psnr(px, other) < 40.0


def test_fetch_and_parse_udfs(spark):
    pdf = pd.DataFrame(
        {
            "image_id": [f"img_{i:08d}" for i in range(8)],
            "w": [32, 64, 96, 32, 64, 96, 32, 64],
            "h": [32, 32, 64, 64, 96, 96, 32, 32],
            "fmt": ["raw"] * 8,
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        df.withColumn("bytes", synth_fetch_bytes("image_id", "w", "h", "fmt"))
        .withColumn("parsed", parse_payload("bytes", "w", "h", "fmt", "image_id"))
        .select("image_id", "w", "h", "parsed.*")
        .collect()
    )
    for r in out:
        assert r["decode_ok"] is True
        assert r["psnr_db"] >= 40.0  # lossless raw -> sentinel 99.0
        local = phash64(pixels_for(r["image_id"], r["w"], r["h"]))
        assert r["phash"] == local
