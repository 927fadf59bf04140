"""ICO (Windows icon / favicon) container codec.

Favicons are a crawl staple — every polite crawler fetches
/favicon.ico — and the format is a tiny public container: an ICONDIR
(reserved/type/count) plus 16-byte directory entries, each pointing
at either an embedded PNG (modern, signature-detected) or a
header-less BMP DIB whose height field covers the XOR color plane
AND the 1-bit AND transparency mask (the spec's famous doubled
height). This module implements both directions:

- decode: directory walk with bounds checks, per-entry dispatch to
  the real PNG codec (functions/payload.decode_png) or a DIB reader
  (32-bit BGRA and 24-bit BGR, bottom-up, 4-byte row padding, AND
  mask skipped — output is RGB, alpha dropped by documented choice);
- encode: entries from (h, w, 3) arrays as PNG or 32-bit BMP DIB
  (opaque alpha, all-zero AND mask), so tests and oracles drive both
  entry kinds;
- ico_meta: directory-only metadata (entry count, per-entry dims and
  storage kind, largest entry) with ZERO pixel work — the favicon
  lane of the no-decode triage in functions/image_meta.py.

Reference twin: the reference's parsers consume whatever bytes the
portals serve (src/advert.py:188-381); favicons are part of any real
crawl's payload mix.
"""

from __future__ import annotations

import struct

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _dim(v: int) -> int:
    return v if v else 256  # 0 encodes 256 per the spec


# --------------------------------------------------------------- encode
def encode_ico(entries: list[tuple[np.ndarray, str]]) -> bytes:
    """Build an ICO from (pixels, kind) pairs, kind in {'png', 'bmp32'}."""
    if not entries or len(entries) > 0xFFFF:
        raise ValueError("ico needs 1..65535 entries")
    blobs: list[bytes] = []
    dirents = bytearray()
    offset = 6 + 16 * len(entries)
    for px, kind in entries:
        if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
            raise ValueError("ico entries expect (h, w, 3) uint8")
        h, w, _ = px.shape
        if w > 256 or h > 256:
            raise ValueError("ico entry dims exceed 256")
        if kind == "png":
            from crawler_spark.functions.payload import encode_png

            blob = encode_png(px)
            bpp = 32
        elif kind == "bmp32":
            # header-less DIB: height doubled for the AND mask
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, 0, 0, 0, 0, 0
            )
            bgra = np.zeros((h, w, 4), dtype=np.uint8)
            bgra[..., 0] = px[..., 2]
            bgra[..., 1] = px[..., 1]
            bgra[..., 2] = px[..., 0]
            bgra[..., 3] = 255  # opaque
            mask_stride = ((w + 31) // 32) * 4  # 1-bit rows padded to 32
            blob = info + bgra[::-1].tobytes() + bytes(mask_stride * h)
            bpp = 32
        else:
            raise ValueError(f"ico entry kind {kind!r} unsupported")
        dirents += struct.pack(
            "<BBBBHHII",
            0 if w == 256 else w,
            0 if h == 256 else h,
            0, 0, 1, bpp, len(blob), offset,
        )
        blobs.append(blob)
        offset += len(blob)
    return b"\x00\x00\x01\x00" + struct.pack("<H", len(entries)) + bytes(dirents) + b"".join(blobs)


# --------------------------------------------------------------- decode
def ico_meta(data: bytes) -> dict:
    """Directory-only walk: no pixel decode at all."""
    data = bytes(data)
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO (bad ICONDIR)")
    (count,) = struct.unpack_from("<H", data, 4)
    if count == 0 or 6 + 16 * count > len(data):
        raise ValueError("ico directory truncated or empty")
    entries = []
    for i in range(count):
        w8, h8, _colors, _rsv, _planes, bpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * i
        )
        if off + size > len(data):
            raise ValueError(f"ico entry {i} exceeds data")
        kind = "png" if data[off : off + 8] == _PNG_SIG else "bmp"
        entries.append(
            {"w": _dim(w8), "h": _dim(h8), "bpp": bpp, "kind": kind, "bytes": size}
        )
    largest = max(entries, key=lambda e: e["w"] * e["h"])
    return {
        "fmt": "ico",
        "n_frames": len(entries),
        "w": largest["w"],
        "h": largest["h"],
        "bit_depth": largest["bpp"],
        "entries": entries,
    }


def _decode_dib_entry(blob: bytes, w: int, h: int) -> np.ndarray:
    if len(blob) < 40:
        raise ValueError("ico DIB truncated")
    hsize, bw, bh, _planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 0)
    if hsize != 40 or comp != 0:
        raise ValueError("ico DIB must be a plain BITMAPINFOHEADER")
    if bw != w or bh != 2 * h:
        raise ValueError("ico DIB dims disagree with directory entry")
    if bpp == 32:
        need = 40 + w * h * 4
        if len(blob) < need:
            raise ValueError("ico 32-bit plane truncated")
        bgra = np.frombuffer(blob, np.uint8, w * h * 4, 40).reshape(h, w, 4)
        return bgra[::-1, :, 2::-1].copy()  # bottom-up BGRA -> RGB
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        need = 40 + stride * h
        if len(blob) < need:
            raise ValueError("ico 24-bit plane truncated")
        rows = np.frombuffer(blob, np.uint8, stride * h, 40).reshape(h, stride)
        return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()
    raise NotImplementedError(f"ico DIB {bpp}-bit unsupported (32/24-bit + png)")


def decode_ico(data: bytes, entry: int | None = None) -> list[np.ndarray]:
    """Decode entries to RGB arrays (alpha/AND mask dropped — the
    documented choice for an RGB-only feature pipeline). Pass `entry`
    to decode only one (the favicon pick-largest path)."""
    data = bytes(data)
    meta = ico_meta(data)
    wanted = range(meta["n_frames"]) if entry is None else [entry]
    out = []
    for i in wanted:
        if not 0 <= i < meta["n_frames"]:
            raise ValueError(f"ico entry {i} out of range")
        w8, h8, _c, _r, _p, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * i
        )
        blob = data[off : off + size]
        if blob[:8] == _PNG_SIG:
            from crawler_spark.functions.payload import decode_png

            out.append(decode_png(blob))
        else:
            out.append(_decode_dib_entry(blob, _dim(w8), _dim(h8)))
    return out
