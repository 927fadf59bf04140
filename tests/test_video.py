"""AVI/MJPEG container codec (functions/video.py) — pure-python parts.

Round-trip fidelity, lazy per-frame decode, header cross-checks,
corruption rejection, and a decode of a SPEC-DERIVED hand-built AVI
(segments laid out from the public RIFF/AVI form here, independent of
encode_avi_mjpeg's writer).
"""

import struct

import numpy as np
import pytest

from crawler_spark.functions.jpeg import encode_jpeg
from crawler_spark.functions.payload import pixels_for
from crawler_spark.functions.video import (
    decode_video_frame,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.fixture(scope="module")
def clip():
    frames = [pixels_for(f"vf_{i}", 48, 32) for i in range(9)]
    return frames, encode_avi_mjpeg(frames, fps=24, quality=98)


def test_roundtrip_all_frames(clip):
    frames, avi = clip
    meta = parse_avi_mjpeg(avi)
    assert (meta["w"], meta["h"], meta["fps"], meta["n_frames"]) == (48, 32, 24.0, 9)
    for i, f in enumerate(frames):
        assert _psnr(decode_video_frame(meta, i), f) >= 40.0, i


def test_sampling_never_decodes_unkept_frames(clip):
    """parse returns undecoded payloads; corrupting an UNSAMPLED
    frame's entropy bytes must not affect decoding the sampled ones —
    the O(kept) seek property of an intra-only codec."""
    frames, avi = clip
    meta = parse_avi_mjpeg(avi)
    broken = bytearray(meta["frames"][1])
    broken[len(broken) // 2] ^= 0xFF
    meta["frames"][1] = bytes(broken)
    assert _psnr(decode_video_frame(meta, 0), frames[0]) >= 40.0
    assert _psnr(decode_video_frame(meta, 3), frames[3]) >= 40.0


def test_rejects_corruption():
    frames = [pixels_for("vc_0", 16, 16)]
    avi = encode_avi_mjpeg(frames, fps=10)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_mjpeg(b"RIFF" + avi[4:8] + b"WAVE" + avi[12:])
    with pytest.raises(ValueError):  # truncated chunk
        parse_avi_mjpeg(avi[: len(avi) // 2])
    # frame-count header vs movi payload cross-check
    bad = bytearray(avi)
    i = bad.find(b"avih") + 8 + 16
    bad[i : i + 4] = struct.pack("<I", 5)  # claim 5 frames, carry 1
    with pytest.raises(ValueError, match="declares"):
        parse_avi_mjpeg(bytes(bad))


def test_non_mjpg_handler_is_honest_notimplemented():
    avi = bytearray(encode_avi_mjpeg([pixels_for("vh_0", 16, 16)], fps=10))
    i = avi.find(b"strh") + 8 + 4  # handler fourcc inside strh
    avi[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        parse_avi_mjpeg(bytes(avi))


def test_decode_handbuilt_minimal_avi():
    """One-frame AVI laid out by hand from the RIFF/AVI form — chunk
    sizes, list nesting, and header field offsets all independent of
    the module's writer."""
    jpeg = encode_jpeg(pixels_for("hb_0", 24, 16), quality=98)

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    avih = struct.pack(
        "<14I", 100_000, 0, 0, 0, 1, 0, 1, len(jpeg), 24, 16, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, 10, 0, 1, len(jpeg), 0, 0, 0, 0, 24, 16
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 24, 16, 1, 24, b"MJPG", 24 * 16 * 3, 0, 0, 0, 0)
    hdrl = chunk(
        b"LIST",
        b"hdrl"
        + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jpeg))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    meta = parse_avi_mjpeg(avi)
    assert (meta["w"], meta["h"], meta["n_frames"]) == (24, 16, 1)
    assert meta["fps"] == 10.0
    px = decode_video_frame(meta, 0)
    assert _psnr(px, pixels_for("hb_0", 24, 16)) >= 40.0


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg([], fps=10)
    with pytest.raises(ValueError, match="one shape"):
        encode_avi_mjpeg(
            [pixels_for("a_0", 16, 16), pixels_for("a_1", 24, 16)], fps=10
        )
