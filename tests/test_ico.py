"""ICO (favicon) container tests: both entry kinds round-trip, the
doubled-height AND-mask DIB layout, directory-only metadata, the
triage dispatch, and corruption rejection."""

import struct

import numpy as np
import pytest

from crawler_spark.functions.ico import decode_ico, encode_ico, ico_meta
from crawler_spark.functions.image_meta import image_meta, sniff_format
from crawler_spark.functions.payload import pixels_for


def _px(w, h, tag="i"):
    return pixels_for(f"{tag}_{w}x{h}", w, h)


def test_roundtrip_both_entry_kinds():
    sizes = [(16, 16, "bmp32"), (32, 32, "png"), (48, 48, "bmp32")]
    entries = [(_px(w, h), kind) for w, h, kind in sizes]
    data = encode_ico(entries)
    out = decode_ico(data)
    assert len(out) == 3
    for got, (px, _) in zip(out, entries):
        assert np.array_equal(got, px)


def test_single_entry_decode_skips_others():
    entries = [(_px(16, 16), "bmp32"), (_px(32, 32), "png")]
    data = bytearray(encode_ico(entries))
    # wreck the first entry's pixel data; entry 1 must still decode
    meta = ico_meta(bytes(data))
    (off,) = struct.unpack_from("<I", data, 6 + 12)
    data[off + 50] ^= 0xFF
    got = decode_ico(bytes(data), entry=1)
    assert np.array_equal(got[0], entries[1][0])
    assert meta["n_frames"] == 2


def test_meta_directory_only():
    entries = [(_px(16, 16), "bmp32"), (_px(48, 32), "png"), (_px(24, 24), "bmp32")]
    meta = ico_meta(encode_ico(entries))
    assert meta["fmt"] == "ico" and meta["n_frames"] == 3
    assert (meta["w"], meta["h"]) == (48, 32)  # largest by area
    kinds = [e["kind"] for e in meta["entries"]]
    assert kinds == ["bmp", "png", "bmp"]
    dims = [(e["w"], e["h"]) for e in meta["entries"]]
    assert dims == [(16, 16), (48, 32), (24, 24)]


def test_256_dims_encode_as_zero():
    data = encode_ico([(np.zeros((256, 256, 3), dtype=np.uint8), "bmp32")])
    assert data[6] == 0 and data[7] == 0  # width/height bytes
    meta = ico_meta(data)
    assert (meta["w"], meta["h"]) == (256, 256)
    assert np.array_equal(
        decode_ico(data)[0], np.zeros((256, 256, 3), dtype=np.uint8)
    )


def test_sniff_and_triage_dispatch():
    data = encode_ico([(_px(16, 16), "bmp32"), (_px(32, 32), "png")])
    assert sniff_format(data) == "ico"
    m = image_meta(data)
    assert m["fmt"] == "ico" and m["n_frames"] == 2
    assert (m["w"], m["h"]) == (32, 32) and m["bit_depth"] == 32


def test_corruption_rejected():
    data = encode_ico([(_px(16, 16), "bmp32")])
    with pytest.raises(ValueError, match="ICONDIR"):
        ico_meta(b"\x00\x00\x02\x00" + data[4:])  # cursor type
    with pytest.raises(ValueError, match="truncated or empty"):
        ico_meta(data[:12])
    with pytest.raises(ValueError, match="exceeds"):
        ico_meta(data[:-10])  # last entry blob cut
    with pytest.raises(ValueError, match="dims"):
        bad = bytearray(data)
        bad[6] = 99  # directory width disagrees with DIB
        decode_ico(bytes(bad))
    with pytest.raises(ValueError, match="256"):
        encode_ico([(np.zeros((300, 16, 3), dtype=np.uint8), "bmp32")])


def test_24bit_dib_entry_decodes():
    # hand-build a 24-bit DIB entry (our encoder only writes 32-bit)
    px = _px(5, 4)
    h, w = 4, 5
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    info = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0, 0, 0, 0, 0, 0)
    blob = info + rows.tobytes() + bytes(4 * h)
    dirent = struct.pack("<BBBBHHII", w, h, 0, 0, 1, 24, len(blob), 22)
    data = b"\x00\x00\x01\x00\x01\x00" + dirent + blob
    assert np.array_equal(decode_ico(data)[0], px)
