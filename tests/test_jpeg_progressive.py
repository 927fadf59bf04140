"""Progressive JPEG (SOF2) — encoder + decoder (functions/jpeg.py).

The load-bearing invariant: progressive transmits the SAME quantized
coefficients as baseline, so for any (image, quality) the progressive
and baseline decodes must be BIT-IDENTICAL — every test here pins
equality against the already-oracled baseline path rather than a PSNR
bound. Hand-built streams (4:2:0 subsampled, grayscale, EOBn runs)
cover decoder geometry the 4:4:4 encoder never emits, per the round-4
ask. Reference twin: the parsers consume whatever JPEG flavor the
portals serve (src/advert.py:188-381); progressive is the most common
real-payload encoding the codec previously rejected.
"""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from crawler_spark.functions.jpeg import (
    _FLAT_AC_BITS,
    _FLAT_AC_VALS,
    DC_LUMA,
    decode_jpeg,
    encode_jpeg,
)
from test_jpeg import _W, _codes, _dc_bits, _dht, _seg

FAST = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _rand_img(w, h, seed):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3)).astype(np.uint8)


# ------------------------------------------------ baseline equivalence


@pytest.mark.parametrize("dims", [(16, 16), (37, 29), (8, 8), (1, 1), (2, 2), (40, 3)])
def test_progressive_decode_identical_to_baseline(dims):
    img = _rand_img(dims[0], dims[1], sum(dims))
    base = decode_jpeg(encode_jpeg(img, quality=98))
    prog = decode_jpeg(encode_jpeg(img, quality=98, progressive=True))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("quality", [50, 85, 100])
def test_progressive_identity_across_qualities(quality):
    img = _rand_img(41, 33, quality)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg(img, quality=quality, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_with_restart_markers():
    """DRI + RSTn inside every scan: DC predictor and EOB-run reset."""
    img = _rand_img(64, 48, 7)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 3, 7):
        enc = encode_jpeg(img, quality=90, progressive=True, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        assert np.array_equal(base, decode_jpeg(enc))


def test_progressive_smooth_image_exercises_eob_runs():
    """A smooth gradient quantizes to mostly-zero AC bands, so the
    encoder emits multi-block EOBn symbols — and at q75 whole DC/AC
    refinement scans carry long correction-bit runs."""
    x = np.linspace(0, 30, 64)
    img = np.clip(
        np.round(x[None, :, None] + x[:32][:, None, None] * 0.5 + np.zeros((32, 64, 3))),
        0,
        255,
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=75))
    prog = decode_jpeg(encode_jpeg(img, quality=75, progressive=True))
    assert np.array_equal(base, prog)


@FAST
@example((2, 2, 177))  # the q100 corner the round-4 property test found
@given(
    st.tuples(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=0, max_value=2**31),
    )
)
def test_progressive_identity_any_dims_property(params):
    w, h, seed = params
    img = _rand_img(w, h, seed)
    for q in (100, 85):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
        assert np.array_equal(base, prog), (w, h, seed, q)


# ------------------------------------------------- hand-built streams


def test_decode_handbuilt_420_progressive_with_eobn():
    """Two-MCU 4:2:0 flat-color SOF2 stream built segment by segment:
    interleaved DC scan in MCU order, then per-component AC scans over
    each component's OWN (ceil) block grid closed by a single
    multi-block EOBn symbol — subsampled progressive geometry and
    EOBn decode, neither of which encode_jpeg(progressive=True)
    emits (it is 4:4:4 and its flat-table EOB runs are incidental)."""
    rgb = np.array([200, 60, 100], dtype=np.float64)
    y = 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]
    cb = -0.168736 * rgb[0] - 0.331264 * rgb[1] + 0.5 * rgb[2] + 128
    cr = 0.5 * rgb[0] - 0.418688 * rgb[1] - 0.081312 * rgb[2] + 128
    dcs = [int(round(8 * (v - 128))) for v in (y, cb, cr)]

    dc = _codes(*DC_LUMA)
    flat = _codes(_FLAT_AC_BITS, _FLAT_AC_VALS)

    # scan 1: interleaved DC first (Al=0), 2 MCUs of 4Y+Cb+Cr
    w1 = _W()
    for first in (True, False):
        for i in range(4):
            _dc_bits(w1, dc, dcs[0] if first and i == 0 else 0)
        for comp in (1, 2):
            _dc_bits(w1, dc, dcs[comp] if first else 0)

    # AC scans: all-zero bands -> one EOBn covering the whole grid.
    # Y grid is ceil(32/8) x ceil(16/8) = 4x2 = 8 blocks -> EOB8
    # (symbol 0x30 + 3 extension bits of 0); chroma grids are
    # ceil(16/8) x ceil(8/8) = 2 blocks -> EOB2 (0x10 + 1 bit).
    def eobn_scan(nblocks):
        w = _W()
        r = nblocks.bit_length() - 1
        code, ln = flat[r << 4]
        w.put(code, ln)
        if r:
            w.put(nblocks - (1 << r), r)
        return w.bytes()

    data = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([1] * 64))
        + _seg(
            0xC2,  # SOF2
            struct.pack(">BHHB", 8, 16, 32, 3)
            + bytes([1, 0x22, 0])  # Y: h=v=2
            + bytes([2, 0x11, 0])
            + bytes([3, 0x11, 0]),
        )
        + _dht(0x00, DC_LUMA)
        + _dht(0x10, (_FLAT_AC_BITS, _FLAT_AC_VALS))
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00]))  # DC Ah=0 Al=0
        + w1.bytes()
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))  # Y AC 1-63
        + eobn_scan(8)
        + _seg(0xDA, bytes([1, 2, 0x00, 1, 63, 0x00]))  # Cb AC
        + eobn_scan(2)
        + _seg(0xDA, bytes([1, 3, 0x00, 1, 63, 0x00]))  # Cr AC
        + eobn_scan(2)
        + b"\xff\xd9"
    )
    px = decode_jpeg(data)
    assert px.shape == (16, 32, 3)
    err = np.abs(px.astype(np.int64) - np.array([200, 60, 100])).max()
    assert err <= 2, err


def test_decode_handbuilt_grayscale_progressive_dc_refinement():
    """8x8 single-component SOF2: DC first at Al=1, DC refinement at
    Ah=1/Al=0 (one raw bit, no Huffman), AC band closed by EOB1 —
    covers the non-interleaved DC path and bit-plane reassembly.
    DC quant step 16, value 3 (-> 48 coeff -> mid gray 128+6): first
    scan sends 3>>1 = 1, refinement bit 3&1 = 1."""
    dc = _codes(*DC_LUMA)
    flat = _codes(_FLAT_AC_BITS, _FLAT_AC_VALS)

    w1 = _W()
    _dc_bits(w1, dc, 1)  # DC first, Al=1: point-transformed value 1
    w2 = _W()
    w2.put(1, 1)  # DC refinement: bit 0 of 3 is 1
    w3 = _W()
    code, ln = flat[0x00]  # EOB1
    w3.put(code, ln)

    data = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([16] * 64))
        + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _dht(0x00, DC_LUMA)
        + _dht(0x10, (_FLAT_AC_BITS, _FLAT_AC_VALS))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # DC Ah=0 Al=1
        + w1.bytes()
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # DC Ah=1 Al=0
        + w2.bytes()
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))  # AC 1-63
        + w3.bytes()
        + b"\xff\xd9"
    )
    px = decode_jpeg(data)
    assert px.shape == (8, 8, 3)
    # DC coeff 3*16 = 48 -> spatial 48/8 = 6 over the level shift
    assert np.all(px == 134), px[0, 0]


# ----------------------------------------------- payload-layer wiring


def test_payload_layer_progressive_dispatch():
    from crawler_spark.functions.payload import (
        decode_payload,
        encode_payload,
        phash64,
        pixels_for,
    )

    img = pixels_for("img_17", 32, 24)
    prog = encode_payload(img, "jpeg_progressive")
    base = encode_payload(img, "jpeg")
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base  # SOF2 vs SOF0
    dp = decode_payload(prog, 32, 24, "jpeg_progressive")
    db = decode_payload(base, 32, 24, "jpeg")
    assert np.array_equal(dp, db)
    assert phash64(dp) == phash64(db)
    # fmt='jpeg' also accepts SOF2 bytes (decoder auto-detects)
    assert np.array_equal(decode_payload(prog, 32, 24, "jpeg"), db)


# ------------------------------------------------------- corruption


def test_truncated_progressive_stream_raises():
    img = _rand_img(32, 32, 3)
    data = encode_jpeg(img, quality=95, progressive=True)
    for frac in (3, 2):
        with pytest.raises(ValueError):
            decode_jpeg(data[: len(data) // frac])


def test_relabelled_baseline_scan_is_invalid_progressive():
    """A baseline stream with SOF0 rewritten to SOF2 carries an
    interleaved Ss=0/Se=63 scan — illegal progressive, and the decoder
    must say so rather than misparse it (replaces the round-4
    NotImplementedError honesty test: SOF2 now decodes for real)."""
    from crawler_spark.functions.payload import pixels_for

    data = bytearray(encode_jpeg(pixels_for("t_3", 16, 16)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))


def test_corrupt_progressive_entropy_does_not_hang():
    data = bytearray(encode_jpeg(_rand_img(32, 32, 11), quality=95, progressive=True))
    sos = data.find(b"\xff\xda")
    for off in (30, 71, 150):
        c = bytearray(data)
        c[sos + 14 + off] ^= 0x5A
        try:
            decode_jpeg(bytes(c))  # wrong pixels fine; hangs/crashes not
        except (ValueError, NotImplementedError):
            pass
