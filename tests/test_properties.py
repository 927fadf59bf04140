"""Property-based tests (hypothesis) for the invariants the engine's
correctness arguments lean on.

The reference test suite is pure characterization tests (SURVEY §5);
these generalize the load-bearing properties over arbitrary inputs:
URL canonicalization idempotence, XML escaping round-trips, cuckoo
no-false-negatives, politeness admission partitioning, and SimHash's
bag-of-tokens determinism. Spark-backed properties batch every
generated case into ONE job per example and keep example counts small
(a Spark action per example costs ~0.5-1 s).
"""

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.functions import urls as U
from crawler_spark.operators import politeness
from crawler_spark.operators.cuckoo import CuckooFilter, build_filter
from crawler_spark.operators.export import build_xml_doc

FAST = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
SPARK_FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

url_st = st.builds(
    lambda scheme, host, port, path, frag: (
        f"{scheme}://{host}{port}/{path}{frag}"
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[A-Za-z0-9/._~%-]{0,24}", fullmatch=True),
    st.sampled_from(["", "#frag", "#x/y"]),
)


@FAST
@given(url_st)
def test_canonicalize_idempotent(url):
    once = U.canonicalize(url)
    assert U.canonicalize(once) == once
    # fingerprints are stable under canonicalization
    assert U.fp64(once) == U.fp64(U.canonicalize(once))


@FAST
@given(url_st)
def test_host_bucket_in_range(url):
    b = U.host_bucket(U.host_of(U.canonicalize(url)))
    assert 0 <= b < U.N_HOST_BUCKETS


@FAST
@given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300, unique=True))
def test_cuckoo_no_false_negatives(keys):
    arr = np.asarray(keys, dtype=np.int64)
    cf = build_filter(arr, min_slots=8)
    assert cf.contains_many(arr).all()


@FAST
@given(st.lists(st.integers(-(2**62), 2**62), min_size=2, max_size=100, unique=True))
def test_cuckoo_delete_removes_only_requested(keys):
    arr = np.asarray(keys, dtype=np.int64)
    cf = build_filter(arr, min_slots=8)
    victim = int(arr[0])
    assert cf.delete(victim)
    # remaining keys stay probe-positive unless they collide with the
    # victim on (bucket, fingerprint) — the documented cuckoo-delete
    # caveat; such collisions self-heal via a refetch, so the property
    # asserted here is the non-colliding majority
    rest = arr[1:]
    ok = cf.contains_many(rest)
    colliding = CuckooFilter.from_bytes(build_filter(np.asarray([victim]), min_slots=cf.n_slots).to_bytes())
    for k, present in zip(rest, ok):
        if not present:
            assert colliding.contains_many(np.asarray([k], dtype=np.int64))[0]


def _pending_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["url", "fp", "host", "priority"])
    pdf["host_hash"] = (pdf["host"] % 32).astype("int32")
    pdf["sitemap_seq"] = 0
    pdf["loc_seq"] = range(len(pdf))
    return spark.createDataFrame(pdf)


@SPARK_FAST
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),  # host
            st.integers(0, 3),  # priority
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 4),  # requests per minute
)
def test_admission_partitions_pending(spark, host_prios, rpm):
    rows = [
        (f"u{i}", i * 7919 + 3, h, p) for i, (h, p) in enumerate(host_prios)
    ]
    pending = _pending_df(spark, rows)
    robots = spark.createDataFrame(
        [(h, float(rpm), None, 5) for h in range(5)],
        "host long, requests_per_minute double, robots_crawl_delay double, retry_timeout_min int",
    )
    admitted, leftover, handle = politeness.admit_split(
        pending, robots, round_duration=120.0, n_salt=3
    )
    a = admitted.select("url", "host", "admit_rank").collect()
    lo = leftover.select("url").collect()
    if handle is not None:
        handle.unpersist()
    tokens = max(1, int(120.0 / (60.0 / rpm)))
    # partition property: admitted ∪ leftover == pending, disjoint
    assert {r["url"] for r in a} | {r["url"] for r in lo} == {r[0] for r in rows}
    assert not ({r["url"] for r in a} & {r["url"] for r in lo})
    # budget + dense-rank properties per host
    by_host = {}
    for r in a:
        by_host.setdefault(r["host"], []).append(r["admit_rank"])
    for h, ranks in by_host.items():
        assert len(ranks) <= tokens
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


@SPARK_FAST
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs", "Cc")
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_xml_doc_reparses_for_arbitrary_captions(spark, captions):
    pdf = pd.DataFrame(
        {
            "id": range(len(captions)),
            "caption": captions,
            "url": [f"https://h/{i}" for i in range(len(captions))],
            "round": 1,
        }
    )
    docs = spark.createDataFrame(pdf).withColumn("doc", build_xml_doc()).collect()
    for r, cap in zip(sorted(docs, key=lambda r: r["id"]), captions):
        el = ET.fromstring(r["doc"])
        assert el.get("position") == cap
        assert (el.text or "") == cap


@SPARK_FAST
@given(
    st.lists(
        st.lists(st.from_regex(r"[a-z]{1,6}", fullmatch=True), min_size=1, max_size=12),
        min_size=1,
        max_size=10,
    )
)
def test_simhash_is_a_bag_of_tokens(spark, token_lists):
    """Permuting a document's tokens never changes its fingerprint, and
    identical documents always collide (the recall-1 half of the
    oracle argument)."""
    from crawler_spark.operators.dedup import simhash_fingerprints

    rng = np.random.default_rng(0)
    rows = []
    for i, toks in enumerate(token_lists):
        perm = list(toks)
        rng.shuffle(perm)
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(perm)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = {r["id"]: r["sh"] for r in simhash_fingerprints(df).collect()}
    for i in range(len(token_lists)):
        assert fps[2 * i] == fps[2 * i + 1]


# ---------------------------------------------------- codec properties

img_st = st.tuples(
    st.integers(min_value=1, max_value=40),   # w
    st.integers(min_value=1, max_value=40),   # h
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
)


def _rand_img(w, h, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@FAST
@example((2, 2, 177))  # hypothesis-discovered: 49.89 dB — tiny images can't amortize rounding
@given(img_st)
def test_jpeg_q100_near_lossless_any_dims(params):
    """Quality 100 = all-ones quant tables: the only loss is DCT float
    rounding. The TRUE invariant is a max-abs per-channel error of a
    few counts (YCbCr<->RGB + DCT float rounding); PSNR >= 50 dB only
    holds once there are enough samples to amortize (a 2x2 image with
    max error 2 measures 49.89 dB — seed 177 below). So: bound the
    per-pixel error always, and the dB figure for >=64-pixel images
    (padding/odd-size paths included either way)."""
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from crawler_spark.functions.payload import psnr

    img = _rand_img(*params[:2], params[2])
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert int(np.max(np.abs(dec.astype(np.int16) - img.astype(np.int16)))) <= 3
    if img.shape[0] * img.shape[1] >= 64:
        assert psnr(dec, img) >= 50.0


@FAST
@given(
    img_st,
    st.integers(min_value=1, max_value=256),  # palette size
    st.booleans(),                            # interlace
)
def test_gif_roundtrip_is_lossless_for_any_palettized_image(params, n_colors, laced):
    """GIF is lossless over its palette BY DEFINITION: any image built
    from <=256 colors round-trips exactly, at any dims, palette size
    (down to 1 color — the mcs>=2 floor) and interlacing."""
    from crawler_spark.functions.gif import decode_gif, encode_gif

    w, h, seed = params
    rng = np.random.Generator(np.random.PCG64(seed))
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, size=(h, w))]
    assert np.array_equal(decode_gif(encode_gif(img, interlace=laced)), img)


@FAST
@given(img_st, st.booleans())  # arbitrary true color; rle8 over 3-3-2
def test_bmp_roundtrip_is_lossless_any_dims(params, rle):
    from crawler_spark.functions.bmp import decode_bmp, encode_bmp, encode_bmp_rle8
    from crawler_spark.functions.gif import quantize_332

    img = _rand_img(*params[:2], params[2])
    if rle:
        img = quantize_332(img)
        assert np.array_equal(decode_bmp(encode_bmp_rle8(img)), img)
    else:
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@FAST
@given(
    st.integers(min_value=1, max_value=3000),  # n samples
    st.integers(min_value=1, max_value=3),     # channels
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([256, 1024, 4096]),        # block size
)
def test_flac_roundtrip_is_lossless_for_any_pcm(n, nch, seed, bs):
    """FLAC is lossless BY DEFINITION: any int16 signal — noise, DC,
    extremes — must round-trip bit-exactly at any blocking."""
    from crawler_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.Generator(np.random.PCG64(seed))
    pcm = rng.integers(-32768, 32768, size=(n, nch)).astype(np.int16)
    dec, rate = decode_flac(encode_flac(pcm, 16000, block_size=bs))
    assert rate == 16000
    assert np.array_equal(dec, pcm)


@FAST
@given(
    st.integers(min_value=1, max_value=6),     # frames
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_container_preserves_frame_payloads_exactly(n_frames, seed):
    """The AVI shell is lossless around its frames: parse returns the
    EXACT jpeg bytes the encoder wrote, in order (the decode fidelity
    of a frame is the jpeg codec's property, tested separately)."""
    from crawler_spark.functions.jpeg import encode_jpeg
    from crawler_spark.functions.video import encode_avi_mjpeg, parse_avi_mjpeg

    frames = [_rand_img(16, 16, seed + i) for i in range(n_frames)]
    meta = parse_avi_mjpeg(encode_avi_mjpeg(frames, fps=10, quality=90))
    assert meta["n_frames"] == n_frames
    expected = [encode_jpeg(f, quality=90) for f in frames]
    assert [bytes(b) for b in meta["frames"]] == expected
