"""URL canonicalization, 64-bit fingerprinting, host extraction.

The reference compares URLs verbatim — there is NO canonicalization
in iKoulee/crawler (urls go straight into the UNIQUE column,
src/harvester.py:263-281, and dedup compares equality,
src/harvester.py:133-166). Fidelity mode therefore fingerprints the
VERBATIM url; canonicalization is the graft extension (north rule:
"RFC-3986 URL canonicalization + 64-bit fingerprinting in vectorized
Arrow UDFs") carried as a separate column.

The fingerprint is FNV-1a 64-bit: trivially portable, so the
single-process fidelity twin (tests/reference_twin.py) computes
bit-identical values without Spark. At cluster scale the seen-set
bucketing can switch to Spark's builtin xxhash64 (JVM-side, zero
Python) — the engine takes the fingerprint column as input and does
not care which hash produced it, as long as engine and oracle agree.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1

N_HOST_BUCKETS = 1024  # seen-set / politeness bucketing fan-out


def fp64(s: str) -> int:
    """FNV-1a 64-bit of the utf-8 bytes, as signed int64."""
    h = FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) & _MASK64
    return (h & ((1 << 63) - 1)) - (h & (1 << 63))


def host_of(url: str) -> str:
    """netloc minus userinfo/port, lowercased — urlparse(url).netloc
    analog of src/harvester.py:549 / src/advert_exporter.py:138."""
    netloc = urlsplit(url).netloc
    host = netloc.rsplit("@", 1)[-1]
    host = host.rsplit(":", 1)[0] if re.search(r":\d*$", host) else host
    return host.lower()


def host_bucket(host: str, n: int = N_HOST_BUCKETS) -> int:
    return (fp64(host) & _MASK64) % n


_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = re.compile(rb"[A-Za-z0-9\-._~]")


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res or "/"


def canonicalize(url: str) -> str:
    """RFC-3986 syntax-based normalization (§6.2.2) + default-port drop.

    Lowercase scheme/host, uppercase percent-encodings and decode
    unreserved octets, remove dot segments, drop default ports and
    empty fragments. Query order is preserved (reordering changes
    semantics for some endpoints).
    """
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if s.username:
        userinfo = s.username + (f":{s.password}" if s.password else "")
        netloc = f"{userinfo}@{netloc}"
    path = _remove_dot_segments(quote(unquote(s.path), safe="/:@!$&'()*+,;=~-._"))
    query = quote(unquote(s.query), safe="=&:@!$&'()*+,;=~-._/?")
    return urlunsplit((scheme, netloc, path, query, ""))


# ------------------------------------------------------------- UDFs


@F.pandas_udf(LongType())
def fp64_udf(urls: pd.Series) -> pd.Series:
    return urls.map(fp64).astype("int64")


@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize)


@F.pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


@F.pandas_udf(IntegerType())
def host_bucket_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(host_bucket).astype("int32")


def native_host(url_col: Column) -> Column:
    """JVM-side host extraction — parse_url(url,'HOST'), zero Python."""
    return F.lower(F.parse_url(url_col, F.lit("HOST")))


def with_url_identity(df, url_col: str = "url"):
    """Add (canon_url, fp, host, host_hash) to a frame of URLs.

    Python-reference variant: FNV-1a fingerprints + urlsplit hosts,
    bit-identical to the single-process fidelity twin
    (tests/reference_twin.py). Use :func:`with_url_identity_native`
    in the engine hot path.
    """
    c = F.col(url_col)
    return (
        df.withColumn("canon_url", canonicalize_udf(c))
        .withColumn("fp", fp64_udf(c))
        .withColumn("host", host_udf(c))
        .withColumn("host_hash", host_bucket_udf(F.col("host")))
    )


def with_url_identity_native(df, url_col: str = "url", n_buckets: int = N_HOST_BUCKETS):
    """Add (canon_url, fp, host, host_hash) with fp/host/host_hash as
    native JVM expressions (xxhash64 + parse_url, whole-stage codegen).

    The engine never interprets the fingerprint — any stable 64-bit
    hash works as the dedup/bucketing key, so the hot path uses
    Spark's builtin xxhash64 and keeps Python out of three of the four
    derived columns; only RFC-3986 canonicalization stays an Arrow UDF.
    """
    c = F.col(url_col)
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    return (
        df.withColumn("canon_url", canonicalize_udf(c))
        .withColumn("fp", F.xxhash64(c))
        .withColumn("host", host)
        .withColumn(
            "host_hash", F.pmod(F.xxhash64(F.col("host")), F.lit(n_buckets)).cast("int")
        )
    )
