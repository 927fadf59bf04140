"""AVI/MJPEG video container codec on stdlib + the in-repo JPEG codec.

Round 3 turned the PNG and WAV stubs into real codecs; round 4 does
the same for video. MJPEG-in-AVI is the one mainstream video format
that is fully decodable with what this container has: the AVI shell
is RIFF (the same chunk grammar as WAV — public spec: the Microsoft
AVI RIFF form), and each frame is an independent baseline JPEG, which
functions/jpeg.py already decodes. No inter-frame prediction means
frame sampling is a chunk walk: only the SAMPLED frames are ever
entropy-decoded — the property that makes MJPEG the cheap-seek format
real pipelines transcode surveillance/capture footage into.

Inter-frame codecs (H.264/VP9/AV1) remain honestly out of reach here
(motion compensation + CABAC needs a real codec library); they slot
into decode_video exactly like jpeg/png slot into decode_payload.

Layout written and parsed (strictly the standard form):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader: 56 bytes>)
        LIST('strl' strh(<56 bytes, fccType 'vids', handler 'MJPG'>)
                    strf(<BITMAPINFOHEADER: 40 bytes>)))
      LIST('movi' '00dc'(<jpeg>) ...)
      idx1(<16 bytes per frame>))
"""

from __future__ import annotations

import struct

import numpy as np

from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF word alignment
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 30, quality: int = 95
) -> bytes:
    """uint8 RGB frames (h, w, 3), all same shape -> AVI/MJPG bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    avih = struct.pack(
        "<14I",
        int(1_000_000 // fps),  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max(len(j) for j in jpegs),  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            int(fps),  # dwRate (fps = rate/scale)
            0,  # dwStart
            len(frames),  # dwLength
            max(len(j) for j in jpegs),  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame — offset counts from the 'movi' fourcc
    idx, off = bytearray(), 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(data: bytes) -> dict:
    """AVI bytes -> header metadata + per-frame jpeg byte slices.

    Returns {"w", "h", "fps", "n_frames", "frames": [bytes, ...]} —
    frames are the UNDECODED entropy payloads: sampling decodes only
    what it keeps. Raises ValueError on structural corruption and
    NotImplementedError on non-MJPG streams.
    """
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated AVI: RIFF length past end of data")

    meta: dict = {"frames": []}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if pos + 8 + length > end:
                raise ValueError(f"truncated AVI chunk {tag!r}")
            payload_at = pos + 8
            if tag == b"LIST":
                walk(payload_at + 4, payload_at + length)
            elif tag == b"avih":
                vals = struct.unpack("<14I", data[payload_at : payload_at + 56])
                meta["n_frames"] = vals[4]
                meta["w"], meta["h"] = vals[8], vals[9]
                meta["fps"] = round(1_000_000 / vals[0], 6) if vals[0] else None
            elif tag == b"strh":
                if data[payload_at : payload_at + 4] == b"vids":
                    handler = data[payload_at + 4 : payload_at + 8]
                    if handler != b"MJPG":
                        raise NotImplementedError(
                            f"AVI video handler {handler!r} unsupported "
                            "(MJPG only — inter-frame codecs need a codec lib)"
                        )
                    scale, rate = struct.unpack(
                        "<II", data[payload_at + 20 : payload_at + 28]
                    )
                    if scale:
                        meta["fps"] = round(rate / scale, 6)
            elif tag == b"00dc":
                meta["frames"].append(data[payload_at : payload_at + length])
            pos = payload_at + length + (length & 1)

    walk(12, min(len(data), riff_len + 8))
    if "w" not in meta:
        raise ValueError("AVI missing avih header")
    if meta.get("n_frames") != len(meta["frames"]):
        raise ValueError(
            f"AVI header declares {meta.get('n_frames')} frames, "
            f"movi carries {len(meta['frames'])}"
        )
    return meta


def decode_video_frame(meta: dict, idx: int) -> np.ndarray:
    """Decode ONE frame by index — sampling never touches the rest."""
    px = decode_jpeg(meta["frames"][idx])
    if px.shape[0] != meta["h"] or px.shape[1] != meta["w"]:
        raise ValueError(
            f"frame {idx} is {px.shape[1]}x{px.shape[0]}, "
            f"header says {meta['w']}x{meta['h']}"
        )
    return px
