"""BMP codec tests: lossless 24-bit and RLE8 round-trips, hand-built
spec streams (top-down rows, absolute + delta RLE escapes), padding,
and corruption rejection."""

import struct

import numpy as np
import pytest

from crawler_spark.functions.bmp import decode_bmp, encode_bmp, encode_bmp_rle8
from crawler_spark.functions.gif import quantize_332
from crawler_spark.functions.payload import pixels_for, pixels_gradient


@pytest.mark.parametrize("dims", [(1, 1), (3, 5), (24, 17), (32, 32)])
def test_bmp24_roundtrip_exact(dims):
    h, w = dims
    px = pixels_for(f"b_{h}x{w}", w, h)  # true color, >256 colors fine
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@pytest.mark.parametrize("dims", [(1, 1), (7, 9), (32, 24), (16, 41)])
def test_bmp_rle8_roundtrip_exact(dims):
    h, w = dims
    px = quantize_332(pixels_for(f"r_{h}x{w}", w, h))
    data = encode_bmp_rle8(px)
    assert np.array_equal(decode_bmp(data), px)
    # RLE actually compresses the flat-run case (beyond its fixed
    # 1 KB palette overhead)
    flat = np.full((64, 64, 3), 200, dtype=np.uint8)
    assert len(encode_bmp_rle8(flat)) < len(encode_bmp(flat))


def test_bmp_rle8_palette_overflow_is_loud():
    with pytest.raises(ValueError, match="quantiz"):
        encode_bmp_rle8(pixels_for("many", 32, 32))


def test_bmp_gradient_pixels_roundtrip():
    for s in range(4):
        px = pixels_gradient(f"img_{s}", 24, 32)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
        q = quantize_332(px)
        assert np.array_equal(decode_bmp(encode_bmp_rle8(q)), q)


def _bmp8_header(w, h, comp, body_len, pal):
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, comp, body_len, 0, 0, len(pal), 0)
    off = 14 + 40 + 4 * len(pal)
    head = b"BM" + struct.pack("<IHHI", off + body_len, 0, 0, off)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    return head + info + pal_bytes


def test_bmp_topdown_24bit_decode():
    px = pixels_for("td", 5, 4)
    data = bytearray(encode_bmp(px))
    # rewrite height negative (top-down) and reorder rows to match
    struct.pack_into("<i", data, 22, -4)
    stride = (5 * 3 + 3) & ~3
    rows = np.frombuffer(bytes(data[54:]), np.uint8).reshape(4, stride)
    data[54:] = rows[::-1].tobytes()
    assert np.array_equal(decode_bmp(bytes(data)), px)


def test_bmp_rle8_absolute_and_delta_escapes():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    # w=4, h=3, bottom-up: storage row0 = image row 2
    body = bytes(
        [0, 3, 1, 2, 3, 0]  # absolute: indices 1,2,3 (+pad)
        + [1, 0]  # run 1 of index 0
        + [0, 0]  # EOL
        + [2, 2]  # run 2 of index 2
        + [0, 2, 2, 1]  # delta: skip to x=4, y=2 (skipped pixels = 0)
        + [0, 1]  # end of bitmap
    )
    data = _bmp8_header(4, 3, 1, len(body), pal) + body
    out = decode_bmp(data)
    rgb = np.array(pal, dtype=np.uint8)
    exp_storage = np.zeros((3, 4), dtype=np.uint8)
    exp_storage[0] = [1, 2, 3, 0]
    exp_storage[1, :2] = 2
    expected = rgb[exp_storage][::-1]  # bottom-up -> image order
    assert np.array_equal(out, expected)


def test_bmp_corruption_rejected():
    px = quantize_332(pixels_for("c", 8, 8))
    good24, goodrle = encode_bmp(px), encode_bmp_rle8(px)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good24[2:])
    with pytest.raises(ValueError):
        decode_bmp(good24[: len(good24) // 2])
    with pytest.raises(ValueError):
        decode_bmp(goodrle[:-4])  # missing end-of-bitmap
    bad = bytearray(goodrle)
    struct.pack_into("<I", bad, 30, 7)  # unknown compression
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))
