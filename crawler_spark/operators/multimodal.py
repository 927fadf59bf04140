"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with typed metadata
(w, h, fmt / sample_rate, duration / fps, n_frames). The Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is fully real and tested, and so are the codecs:
'raw' RGB decodes with numpy, 'png' with the real stdlib-zlib codec
in functions/payload.py (all five scanline filters, CRC-checked),
'jpeg' with the real baseline+progressive decoder in functions/jpeg.py
(Huffman + DCT on numpy/stdlib), 'gif' with the real LZW codec in
functions/gif.py (interlace + animation), 'pcm16'/'wav' with numpy +
a stdlib RIFF chunk parser, 'flac' with the bit-exact codec in
functions/flac.py, and AVI/MJPEG video plus animated GIF with
functions/video.py and functions/gif.py (only sampled frames
entropy-decode in both containers). MP3 gets a real frame-grammar
parser (functions/mpeg_audio: sync walk, CRC-16, Xing, ID3) feeding
audio_stream_metadata; NotImplementedError remains only where the
container genuinely lacks the wire format's codec ecosystem: mp3/ogg
PCM decode and inter-frame video (h264/vp9/av1).

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
                px = decode_payload(bytes(data), int(w), int(h), fmt)  # raw/png real; jpeg raises
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


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", LongType(), True),
        StructField("zcr", DoubleType(), True),
        StructField("decode_ok", IntegerType(), False),
    ]
)


def decode_pcm(data: bytes, n_channels: int) -> np.ndarray:
    """Raw interleaved int16 PCM -> (n_samples, n_channels) array.

    'raw' PCM is the audio analog of the 'raw' RGB image format: fully
    implementable with numpy alone, so the audio modality is REAL in
    this environment (compressed codecs — mp3/ogg/flac — would slot in
    here exactly like png/jpeg in decode_payload, and are stubbed for
    the same no-codec-libs reason).
    """
    arr = np.frombuffer(data, dtype="<i2")
    if n_channels <= 0 or arr.size % n_channels:
        raise ValueError(f"PCM size {arr.size} not divisible by {n_channels} channels")
    return arr.reshape(-1, n_channels)


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """(n_samples, n_channels) int16 -> a canonical RIFF/WAVE file."""
    import struct

    if pcm.ndim != 2 or pcm.dtype != np.dtype("<i2"):
        pcm = np.asarray(pcm, dtype="<i2").reshape(len(pcm), -1)
    n_ch = pcm.shape[1]
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE (PCM, 16-bit) -> ((n_samples, n_channels) int16, rate).

    A real stdlib-only container parser, the audio twin of the PNG
    codec in functions/payload.py: walks RIFF chunks (any order,
    unknown chunks skipped, word-aligned), validates the fmt chunk
    (format tag 1 = PCM, 16 bits/sample), and returns the data chunk
    reshaped by the container's OWN channel count. FLAC decodes via
    functions/flac.py; lossy codecs (mp3/ogg) stay NotImplementedError
    on the PCM path (mp3 framing/metadata: functions/mpeg_audio).
    """
    import struct

    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n_ch, rate, bits, pcm_bytes = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag = bytes(data[pos : pos + 4])
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = bytes(data[pos + 8 : pos + 8 + length])
        if len(payload) != length:
            raise ValueError(f"truncated WAVE chunk {tag!r}")
        if tag == b"fmt ":
            fmt_tag, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAVE format {fmt_tag}/{bits}-bit unsupported (PCM 16-bit only)"
                )
        elif tag == b"data":
            pcm_bytes = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if n_ch is None or pcm_bytes is None:
        raise ValueError("WAVE missing fmt/data chunk")
    return decode_pcm(pcm_bytes, int(n_ch)), int(rate)


def audio_features(df: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """Decode + feature-extract audio payloads via mapInPandas.

    Input columns: audio_id, bytes, sample_rate, n_channels, fmt.
    Features over the channel-mean signal: sample count, duration,
    RMS, integer peak amplitude, zero-crossing rate. Same streaming
    Arrow-batch shape as image_features — binary in, typed struct out,
    no per-row Python in the plan.
    """
    fields = ["audio_id", "bytes", "sample_rate", "n_channels", fmt_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "audio_id", "sample_rate", "n_channels", "n_samples",
                "duration_s", "rms", "peak", "zcr", "decode_ok",
            )}
            for aid, data, rate, nch, fmt in zip(
                pdf["audio_id"], pdf["bytes"], pdf["sample_rate"], pdf["n_channels"], pdf[fmt_col]
            ):
                out["audio_id"].append(aid)
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(int(nch))
                try:
                    if fmt == "pcm16":
                        pcm = decode_pcm(bytes(data), int(nch))
                    elif fmt == "wav":
                        pcm, wav_rate = decode_wav(bytes(data))
                        if wav_rate != int(rate) or pcm.shape[1] != int(nch):
                            raise ValueError(
                                f"WAVE header ({wav_rate} Hz, {pcm.shape[1]} ch) "
                                f"!= metadata ({int(rate)} Hz, {int(nch)} ch)"
                            )
                    elif fmt == "flac":
                        # real lossless codec (functions/flac.py):
                        # rice + fixed/LPC prediction, CRC-checked
                        from crawler_spark.functions.flac import decode_flac

                        pcm, fl_rate = decode_flac(bytes(data))
                        if fl_rate != int(rate) or pcm.shape[1] != int(nch):
                            raise ValueError(
                                f"FLAC header ({fl_rate} Hz, {pcm.shape[1]} ch) "
                                f"!= metadata ({int(rate)} Hz, {int(nch)} ch)"
                            )
                    else:
                        raise NotImplementedError(
                            f"audio codec {fmt!r} unavailable in this environment "
                            "(pcm16/wav/flac implemented; lossy mp3/ogg need a "
                            "codec library)"
                        )
                    mono = pcm.astype(np.float64).mean(axis=1)
                    n = len(mono)
                    signs = mono[1:] * mono[:-1]
                    out["n_samples"].append(n)
                    out["duration_s"].append(round(n / float(rate), 6))
                    out["rms"].append(round(float(np.sqrt(np.mean(mono**2))), 6))
                    out["peak"].append(int(np.max(np.abs(pcm))) if n else 0)
                    out["zcr"].append(
                        round(float((signs < 0).sum()) / (n - 1), 6) if n > 1 else 0.0
                    )
                    out["decode_ok"].append(1)
                except (ValueError, NotImplementedError, TypeError):
                    for k in ("n_samples", "duration_s", "rms", "peak", "zcr"):
                        out[k].append(None)
                    out["decode_ok"].append(0)
            yield pd.DataFrame(out)

    return df.select(*fields).mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_STREAM_META_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("container", StringType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("vbr", IntegerType(), True),
        StructField("bitrate_kbps", IntegerType(), True),
        StructField("total_frame_bytes", LongType(), True),
        StructField("parse_ok", IntegerType(), False),
    ]
)


def audio_stream_metadata(df: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """Container/stream metadata WITHOUT PCM decode, via mapInPandas.

    Input columns: (audio_id, bytes, fmt). This is the path a 100 TB
    audio crawl actually runs over every payload — duration, rate,
    channel layout, VBR-ness, frame integrity — and it works on
    formats whose PCM decode is env-blocked:
      - 'mp3': the REAL frame-grammar parser in functions/mpeg_audio
        (sync walk, bitrate/rate tables, CRC-16 verify, Xing/ID3);
      - 'wav': RIFF fmt/data chunk walk (duration from byte counts);
      - 'flac': STREAMINFO block (rate/channels/total samples).
    Row-level failures -> parse_ok=0, never task failures. n_frames is
    mp3-only (frame-based container); wav/flac report null.
    """
    fields = ["audio_id", "bytes", fmt_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        from crawler_spark.functions.mpeg_audio import parse_mp3

        def one(aid, data, fmt) -> dict:
            row = {k: None for k in (
                "container", "sample_rate", "channels", "n_frames",
                "duration_s", "vbr", "bitrate_kbps", "total_frame_bytes",
            )}
            row["audio_id"] = aid
            data = bytes(data)
            if fmt == "mp3":
                m = parse_mp3(data)
                row.update(
                    container=f"{m['version']}-layer{m['layer']}",
                    sample_rate=m["sample_rate"],
                    channels=m["channels"],
                    n_frames=m["n_frames"],
                    duration_s=m["duration_s"],
                    vbr=int(m["vbr"]),
                    bitrate_kbps=m["bitrate_kbps"],
                    total_frame_bytes=m["total_frame_bytes"],
                )
            elif fmt == "wav":
                pcm, rate = decode_wav(data)
                row.update(
                    container="riff-wave",
                    sample_rate=rate,
                    channels=pcm.shape[1],
                    duration_s=round(len(pcm) / rate, 6),
                    vbr=0,
                    bitrate_kbps=rate * pcm.shape[1] * 16 // 1000,
                    total_frame_bytes=pcm.nbytes,
                )
            elif fmt == "flac":
                if data[:4] != b"fLaC":
                    raise ValueError("not a flac stream")
                # STREAMINFO: first metadata block, packed u64 at 18
                packed = int.from_bytes(data[18:26], "big")
                rate = packed >> 44
                n_ch = ((packed >> 41) & 7) + 1
                total = packed & ((1 << 36) - 1)
                row.update(
                    container="flac",
                    sample_rate=rate,
                    channels=n_ch,
                    duration_s=round(total / rate, 6) if total else None,
                    vbr=1,  # flac frames are inherently variable-size
                )
            else:
                raise NotImplementedError(f"no metadata parser for {fmt!r}")
            row["parse_ok"] = 1
            return row

        for pdf in batches:
            rows = []
            for aid, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf[fmt_col]):
                try:
                    rows.append(one(aid, data, fmt))
                except (ValueError, NotImplementedError, TypeError, _struct.error):
                    rows.append(
                        {
                            "audio_id": aid,
                            **{k: None for k in (
                                "container", "sample_rate", "channels",
                                "n_frames", "duration_s", "vbr",
                                "bitrate_kbps", "total_frame_bytes",
                            )},
                            "parse_ok": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STREAM_META_SCHEMA])

    return df.select(*fields).mapInPandas(extract, schema=AUDIO_STREAM_META_SCHEMA)


def synth_pcm(audio_id: str, n_samples: int = 800) -> bytes:
    """SQL-reproducible deterministic int16 PCM: sample i of stream s is
    ((s*7+3)*i + s) % 2001 - 1000 — integer arithmetic a DuckDB oracle
    regenerates with generate_series (the audio twin of
    payload.pixels_gradient)."""
    s = int(str(audio_id).rsplit("_", 1)[-1])
    i = np.arange(n_samples, dtype=np.int64)
    v = ((s * 7 + 3) * i + s) % 2001 - 1000
    return v.astype("<i2").tobytes()


IMAGE_STREAM_META_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("fmt_detected", StringType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("bit_depth", IntegerType(), True),
        StructField("progressive", IntegerType(), True),
        StructField("interlaced", IntegerType(), True),
        StructField("exif_orientation", IntegerType(), True),
        StructField("exif_make", StringType(), True),
        StructField("parse_ok", IntegerType(), False),
    ]
)


def image_stream_metadata(df: DataFrame) -> DataFrame:
    """No-decode image triage (functions/image_meta.py): format sniff
    by magic bytes, dims/flags from fixed headers (JPEG marker walk to
    SOF, PNG IHDR, GIF block-grammar hop, BMP DIB header) and the
    EXIF IFD walk — O(header bytes) per row, zero entropy work. This
    is the FIRST pass a 100 TB image pipeline runs (route, dedup by
    dims, orientation-fix planning) before any pixel is decoded —
    the image analog of audio_stream_metadata's MP3 walk. Input
    (image_id, bytes); malformed payloads land as parse_ok=0 rows.
    """
    import struct as _struct

    from crawler_spark.functions.image_meta import image_meta

    cols = [f.name for f in IMAGE_STREAM_META_SCHEMA]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(iid, data) -> dict:
            m = image_meta(bytes(data))
            exif = m.get("exif") or {}
            return {
                "image_id": iid,
                "fmt_detected": m["fmt"],
                "w": m.get("w"),
                "h": m.get("h"),
                "n_frames": m.get("n_frames"),
                "bit_depth": m.get("bit_depth"),
                "progressive": (
                    int(m["progressive"]) if "progressive" in m else None
                ),
                "interlaced": int(m["interlaced"]) if "interlaced" in m else None,
                "exif_orientation": exif.get("orientation"),
                "exif_make": exif.get("make"),
                "parse_ok": 1,
            }

        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    rows.append(one(iid, data))
                except (ValueError, TypeError, _struct.error):
                    rows.append(
                        {
                            "image_id": iid,
                            **{k: None for k in cols[1:-1]},
                            "parse_ok": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("image_id", "bytes").mapInPandas(
        extract, schema=IMAGE_STREAM_META_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("t_s", DoubleType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("phash", LongType(), True),
        StructField("decode_ok", IntegerType(), False),
    ]
)


def frame_sample(df: DataFrame, every_n: int = 30, fmt_col: str = "fmt") -> DataFrame:
    """Video frame sampling via mapInPandas — REAL for 'avi' (MJPEG in
    a RIFF/AVI container, functions/video.py: the shell is the same
    chunk grammar as WAV, each frame an independent baseline JPEG
    decoded by functions/jpeg.py). Input (video_id, bytes, fps,
    n_frames, fmt); output one row per SAMPLED frame (idx % every_n
    == 0) with its timestamp, dims, and phash.

    Only sampled frames are entropy-decoded — MJPEG has no inter-frame
    prediction, so sampling cost is O(kept frames), the property that
    makes the container walk cheap at corpus scale. Animated GIF
    (fmt='gif') gets the same treatment via functions/gif.py: the
    block-grammar walk hops LZW payloads by their length prefixes,
    and only the sampled frames' LZW is decoded (full-canvas opaque
    frames are independent; layered animations fall back to a full
    composite — see gif.sample_gif_frames). Inter-frame
    codecs (h264/vp9/av1) stay honestly NotImplementedError: motion
    compensation + CABAC need a real codec library; they slot in here
    exactly like jpeg/png slot into decode_payload. Row-level failures
    land as decode_ok=0 rows, never task failures.
    """
    from crawler_spark.functions.gif import gif_frame_meta, sample_gif_frames
    from crawler_spark.functions.video import decode_video_frame, parse_avi_mjpeg

    fields = ["video_id", "bytes", "fps", "n_frames", fmt_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "video_id", "frame_idx", "t_s", "w", "h", "phash", "decode_ok",
            )}
            for vid, data, fps, n_frames, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["fps"], pdf["n_frames"], pdf[fmt_col]
            ):
                try:
                    if fmt == "gif":
                        gmeta = gif_frame_meta(bytes(data))  # no entropy work
                        if int(n_frames) != gmeta["n_frames"]:
                            raise ValueError(
                                f"metadata n_frames {int(n_frames)} != "
                                f"container {gmeta['n_frames']}"
                            )
                        wanted = list(range(0, gmeta["n_frames"], every_n))
                        for idx, px in zip(
                            wanted, sample_gif_frames(bytes(data), wanted)
                        ):
                            out["video_id"].append(vid)
                            out["frame_idx"].append(idx)
                            out["t_s"].append(round(idx / float(fps), 6))
                            out["w"].append(gmeta["w"])
                            out["h"].append(gmeta["h"])
                            out["phash"].append(phash64(px))
                            out["decode_ok"].append(1)
                        continue
                    if fmt != "avi":
                        raise NotImplementedError(
                            f"video codec {fmt!r} unavailable in this environment "
                            "(avi/MJPG and animated gif are the implemented containers)"
                        )
                    meta = parse_avi_mjpeg(bytes(data))
                    if int(n_frames) != meta["n_frames"]:
                        raise ValueError(
                            f"metadata n_frames {int(n_frames)} != "
                            f"container {meta['n_frames']}"
                        )
                    eff_fps = meta["fps"] or float(fps)
                    for idx in range(0, meta["n_frames"], every_n):
                        px = decode_video_frame(meta, idx)
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["t_s"].append(round(idx / eff_fps, 6))
                        out["w"].append(meta["w"])
                        out["h"].append(meta["h"])
                        out["phash"].append(phash64(px))
                        out["decode_ok"].append(1)
                except (ValueError, NotImplementedError, TypeError, KeyError):
                    out["video_id"].append(vid)
                    for k in ("frame_idx", "t_s", "w", "h", "phash"):
                        out[k].append(None)
                    out["decode_ok"].append(0)
            yield pd.DataFrame(out)

    return df.select(*fields).mapInPandas(extract, schema=VIDEO_FRAMES_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Kept for API compatibility: the stub graduated to frame_sample
    (real AVI/MJPEG path) in round 4; non-AVI formats still raise."""
    raise NotImplementedError(
        "frame_sample_stub graduated: use frame_sample (real for "
        "fmt='avi' — MJPEG frames via functions/video.py); inter-frame "
        "codecs (h264/vp9/av1) remain unavailable in this environment"
    )
