"""No-decode image metadata tests: format sniffing, header-only dims
for all four formats, EXIF IFD walk on both byte orders and both
value placements, and corruption rejection."""

import struct

import numpy as np
import pytest

from crawler_spark.functions.gif import quantize_332
from crawler_spark.functions.image_meta import (
    attach_exif,
    build_exif_app1,
    image_meta,
    jpeg_meta,
    parse_exif,
    sniff_format,
)
from crawler_spark.functions.payload import encode_payload, pixels_for


def _px(w, h):
    return pixels_for(f"m_{w}x{h}", w, h)


def test_sniff_all_formats():
    px = _px(16, 12)
    cases = {
        "jpeg": encode_payload(px, "jpeg"),
        "png": encode_payload(px, "png"),
        "gif": encode_payload(px, "gif"),
        "bmp": encode_payload(px, "bmp"),
    }
    for fmt, data in cases.items():
        assert sniff_format(data) == fmt
    assert sniff_format(b"\x00\x01\x02\x03") is None


@pytest.mark.parametrize(
    "fmt", ["jpeg", "jpeg_progressive", "png", "gif", "gif_interlaced", "bmp", "bmp_rle8"]
)
def test_meta_dims_without_decode(fmt):
    px = _px(24, 17)
    meta = image_meta(encode_payload(px, fmt))
    assert (meta["w"], meta["h"]) == (24, 17)
    assert meta["n_frames"] == 1
    if fmt.startswith("jpeg"):
        assert meta["progressive"] == (fmt == "jpeg_progressive")
        assert meta["n_components"] == 3
    if fmt.startswith("gif"):
        assert meta["interlaced"] == (fmt == "gif_interlaced")
    if fmt == "bmp_rle8":
        assert meta["compression"] == 1 and meta["bit_depth"] == 8


def test_meta_truncated_headers_rejected():
    for fmt in ("jpeg", "png", "gif", "bmp"):
        data = encode_payload(_px(8, 8), fmt)
        with pytest.raises(ValueError):
            image_meta(data[:10])
    with pytest.raises(ValueError, match="unrecognized"):
        image_meta(b"not an image at all")


@pytest.mark.parametrize("big_endian", [False, True])
def test_exif_roundtrip_both_byte_orders(big_endian):
    app1 = build_exif_app1(
        orientation=6,
        make="CrawlerCam",  # > 4 bytes: offset placement
        model="X1",  # <= 4 bytes with NUL: inline placement
        datetime="2026:08:18 12:00:00",
        pixel_x=4032,
        pixel_y=3024,
        big_endian=big_endian,
    )
    exif = parse_exif(app1)
    assert exif == {
        "orientation": 6,
        "make": "CrawlerCam",
        "model": "X1",
        "datetime": "2026:08:18 12:00:00",
        "pixel_x": 4032,
        "pixel_y": 3024,
    }


def test_exif_attached_to_real_jpeg():
    jpeg = encode_payload(_px(20, 14), "jpeg")
    app1 = build_exif_app1(orientation=8, make="SpecCam Industries")
    meta = jpeg_meta(attach_exif(jpeg, app1))
    assert (meta["w"], meta["h"]) == (20, 14)
    assert meta["exif"]["orientation"] == 8
    assert meta["exif"]["make"] == "SpecCam Industries"
    # the spliced stream still decodes (decoder skips APP segments)
    from crawler_spark.functions.jpeg import decode_jpeg

    assert decode_jpeg(attach_exif(jpeg, app1)).shape == (14, 20, 3)


def test_exif_corrupt_is_isolated_from_dims():
    jpeg = encode_payload(_px(10, 10), "jpeg")
    app1 = bytearray(build_exif_app1(orientation=3))
    app1[8] ^= 0xFF  # wreck the TIFF magic
    meta = jpeg_meta(attach_exif(jpeg, bytes(app1)))
    assert meta["exif"] is None  # corrupt EXIF doesn't lose the dims
    assert (meta["w"], meta["h"]) == (10, 10)


def test_exif_rejects_out_of_range_offsets():
    app1 = bytearray(build_exif_app1(orientation=1, make="OffsetOverrunCamera"))
    # point the Make value offset past the end
    pos = app1.index(b"OffsetOverrunCamera")
    # find the IFD entry referencing it and corrupt the offset field
    off_bytes = struct.pack("<I", pos - 6)
    idx = app1.index(off_bytes)
    app1[idx : idx + 4] = struct.pack("<I", 1 << 24)
    with pytest.raises(ValueError, match="offset"):
        parse_exif(bytes(app1))


def test_png_crc_checked_in_meta():
    data = bytearray(encode_payload(_px(9, 9), "png"))
    data[18] ^= 0xFF  # flip a width byte without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        image_meta(bytes(data))


def test_gif_animation_meta_frames():
    from crawler_spark.functions.gif import encode_gif_animation

    frames = [quantize_332(_px(12, 10)) for _ in range(4)]
    meta = image_meta(encode_gif_animation(frames, [5, 5, 5, 5], loop=2))
    assert meta["fmt"] == "gif"
    assert meta["n_frames"] == 4
    assert meta["loop"] == 2
    assert meta["duration_cs"] == 20
