"""URL canonicalization / fingerprint / host tests (RFC-3986 cases)."""

import pandas as pd
import pytest

from crawler_spark.functions.urls import (
    canonicalize,
    fp64,
    host_bucket,
    host_of,
    with_url_identity,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTPS://WWW.Example.COM:443/a/./b/../c?x=1#frag", "https://www.example.com/a/c?x=1"),
        ("http://example.com:8080/%7euser/%61bc", "http://example.com:8080/~user/abc"),
        ("http://example.com:80/", "http://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/a/b/../../x", "https://example.com/x"),
        ("https://example.com/a%2Fb", "https://example.com/a/b"),
    ],
)
def test_canonicalize(raw, expected):
    assert canonicalize(raw) == expected
    assert canonicalize(canonicalize(raw)) == canonicalize(raw)  # idempotent


def test_fp64_deterministic_and_signed():
    a = fp64("https://portal0.example.de/jobs/1")
    assert a == fp64("https://portal0.example.de/jobs/1")
    assert a != fp64("https://portal0.example.de/jobs/2")
    assert -(1 << 63) <= a < (1 << 63)


def test_verbatim_fingerprint_distinguishes_noncanonical():
    # the reference compares URLs verbatim (src/harvester.py:133-166);
    # two spellings of the same resource are DIFFERENT frontier keys.
    assert fp64("http://E.com/a") != fp64("http://e.com/a")


def test_host_of():
    assert host_of("https://User:p@WWW.Ex.AT:8443/x?q=1") == "www.ex.at"
    assert host_of("https://portal0.example.de/jobs/1") == "portal0.example.de"


def test_host_bucket_range():
    for h in ["a.example", "b.example", "portal5.example.at"]:
        assert 0 <= host_bucket(h) < 1024


def test_with_url_identity_matches_local(spark):
    urls = ["https://portal0.example.de/jobs/7", "https://x.example.at/a b?q=%7e"]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    rows = {r["url"]: r for r in with_url_identity(df).collect()}
    for u in urls:
        assert rows[u]["fp"] == fp64(u)
        assert rows[u]["canon_url"] == canonicalize(u)
        assert rows[u]["host"] == host_of(u)
        assert rows[u]["host_hash"] == host_bucket(host_of(u))
