"""Multimodal binary-column plumbing tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.payload import decode_payload, encode_payload, phash64, pixels_for
from crawler_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images(spark):
    rows = []
    for i in range(6):
        iid = f"img_{i:08d}"
        w, h = (32, 64) if i % 2 else (64, 32)
        rows.append((iid, encode_payload(pixels_for(iid, w, h)), w, h, "raw"))
    rows.append(("img_broken", b"\x00\x01", 32, 32, "raw"))  # bad size
    rows.append(("img_png", b"\x89PNG", 32, 32, "png"))  # stubbed codec
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])
    )


def test_image_features(images):
    out = {r["image_id"]: r for r in mm.image_features(images).collect()}
    assert len(out) == 8
    ok = out["img_00000000"]
    assert ok["decode_ok"] == 1
    assert ok["phash"] == phash64(pixels_for("img_00000000", 64, 32))
    assert len(ok["mean_rgb"]) == 3 and all(0 <= m <= 255 for m in ok["mean_rgb"])
    # failures degrade gracefully, not crash the batch
    assert out["img_broken"]["decode_ok"] == 0 and out["img_broken"]["phash"] is None
    assert out["img_png"]["decode_ok"] == 0  # codec stub -> NotImplementedError caught


def test_resize_images(images):
    good = images.filter(~F.col("image_id").isin("img_broken", "img_png"))
    out = {r["image_id"]: r for r in mm.resize_images(good, 16, 16).collect()}
    for iid, r in out.items():
        assert (r["w"], r["h"]) == (16, 16)
        px = decode_payload(bytes(r["bytes"]), 16, 16)
        assert px.shape == (16, 16, 3)
    # deterministic: resize twice -> identical bytes
    out2 = {r["image_id"]: r for r in mm.resize_images(good, 16, 16).collect()}
    assert all(bytes(out[i]["bytes"]) == bytes(out2[i]["bytes"]) for i in out)


def test_frame_sample_is_explicit_stub(images):
    with pytest.raises(NotImplementedError):
        mm.frame_sample_stub(images)
