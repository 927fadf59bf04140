"""Partitioned cuckoo filter — the deletable seen-set prefilter.

The north rule names a "cuckoo-filter/bloom URL-seen set"; the bloom
sidecar (`operators/seen.py`) is append-only, which is fine for a
monotone crawl but cannot forget. A cuckoo filter supports DELETE at
the same ~10-bits/key budget, which is what URL expiry / re-crawl
scheduling needs: drop the fingerprint and the URL becomes fetchable
again without rebuilding the whole sidecar.

Layout: per host_hash bucket (same partitioning as the bloom and the
politeness stage), a table of ``n_slots`` buckets x ``bucket_size``
16-bit fingerprints, numpy-backed and serialized to bytes for the
snapshot catalog. Classic two-choice cuckoo hashing:

    i1 = h(key) mod n,  i2 = i1 XOR (h(fingerprint) mod n)

so either bucket is derivable from the other plus the fingerprint —
the property that makes kicks (and deletes) possible without storing
keys. Standard construction per Fan et al., "Cuckoo Filter:
Practically Better Than Bloom" (CoNEXT'14); implementation from
scratch, vectorized numpy probes for the Arrow batch path.
"""

from __future__ import annotations

import numpy as np

FP_BITS = 16
EMPTY = 0
MAX_KICKS = 500


def _fp16(keys: np.ndarray) -> np.ndarray:
    """Nonzero 16-bit fingerprints from 64-bit keys (upper bits mixed in)."""
    u = keys.astype(np.uint64)
    f = ((u >> np.uint64(48)) ^ (u >> np.uint64(24)) ^ u) & np.uint64(0xFFFF)
    return np.where(f == 0, np.uint64(1), f).astype(np.uint16)


def _mix(x: np.ndarray) -> np.ndarray:
    """64-bit finalizer (splitmix64 tail) for bucket indexing."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class CuckooFilter:
    """Fixed-size cuckoo filter over int64 keys.

    ``n_slots`` must be a power of two (index XOR stays in range).
    Capacity ~= 0.95 * n_slots * bucket_size before inserts start
    failing; size for expected keys / 0.9.
    """

    def __init__(self, n_slots: int = 1 << 13, bucket_size: int = 4):
        if n_slots & (n_slots - 1):
            raise ValueError("n_slots must be a power of two")
        self.n_slots = n_slots
        self.bucket_size = bucket_size
        self.table = np.zeros((n_slots, bucket_size), dtype=np.uint16)
        self.count = 0

    # ------------------------------------------------------------ indexes
    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (_mix(keys) % np.uint64(self.n_slots)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fps: np.ndarray) -> np.ndarray:
        alt = _mix(fps.astype(np.uint64)) % np.uint64(self.n_slots)
        return (i1.astype(np.uint64) ^ alt).astype(np.int64)

    # ------------------------------------------------------------ mutate
    def insert(self, key: int) -> bool:
        """Insert one key; False if the filter is full (caller resizes)."""
        fp = int(_fp16(np.asarray([key]))[0])
        i1 = int(self._i1(np.asarray([key]))[0])
        i2 = int(self._i2(np.asarray([i1]), np.asarray([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.flatnonzero(row == EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick loop
        rng = np.random.Generator(np.random.PCG64(key & 0xFFFFFFFF))
        idx, cur = i1, fp
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(0, self.bucket_size))
            cur, self.table[idx][slot] = int(self.table[idx][slot]), cur
            idx = int(
                self._i2(np.asarray([idx]), np.asarray([cur], dtype=np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.flatnonzero(row == EMPTY)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False

    def insert_many(self, keys: np.ndarray) -> int:
        ok = 0
        for k in np.asarray(keys, dtype=np.int64):
            ok += self.insert(int(k))
        return ok

    def delete(self, key: int) -> bool:
        """Remove one occurrence of key's fingerprint; True if found."""
        fp = int(_fp16(np.asarray([key]))[0])
        i1 = int(self._i1(np.asarray([key]))[0])
        i2 = int(self._i2(np.asarray([i1]), np.asarray([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            hit = np.flatnonzero(row == fp)
            if len(hit):
                row[hit[0]] = EMPTY
                self.count -= 1
                return True
        return False

    # ------------------------------------------------------------- probe
    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (no false negatives)."""
        keys = np.asarray(keys, dtype=np.int64)
        fps = _fp16(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fps)
        b1 = self.table[i1]  # (n, bucket_size)
        b2 = self.table[i2]
        want = fps[:, None]
        return ((b1 == want).any(axis=1)) | ((b2 == want).any(axis=1))

    # --------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(
        cls, buf: bytes, n_slots: int | None = None, bucket_size: int = 4
    ) -> "CuckooFilter":
        if n_slots is None:  # infer from the serialized size
            n_slots = len(buf) // (2 * bucket_size)
        cf = cls(n_slots, bucket_size)
        cf.table = (
            np.frombuffer(buf, dtype=np.uint16).reshape(n_slots, bucket_size).copy()
        )
        cf.count = int((cf.table != EMPTY).sum())
        return cf


def cuckoo_maybe_contains(fps: np.ndarray, buf: bytes) -> np.ndarray:
    """Probe-side twin of seen.bloom_maybe_contains for the broadcast
    prefilter path: same signature, cuckoo semantics."""
    return CuckooFilter.from_bytes(buf).contains_many(fps)


def build_filter(fps: np.ndarray, min_slots: int = 1 << 13) -> CuckooFilter:
    """Build a filter sized for ``fps``, doubling slots until every key
    inserts.

    This is the rebuild path for a bucket whose fixed-capacity filter
    overflowed: a failed insert_many means newly-seen fingerprints
    were silently missing, and because the prefilter's negatives
    bypass the exact anti-join, those URLs would be re-fetched every
    round — the one failure mode a no-false-negative prefilter must
    never have.
    """
    fps = np.asarray(fps, dtype=np.int64)
    # ~90% load factor ceiling before kicks start failing
    need = 1 << max(0, int(np.ceil(np.log2(max(1, len(fps)) / (0.9 * 4)))))
    n_slots = max(min_slots, need)
    while True:
        cf = CuckooFilter(n_slots=n_slots)
        if cf.insert_many(fps) == len(fps):
            return cf
        n_slots *= 2


def update_cuckoos(cuckoo_df, new_seen):
    """Cogroup twin of seen.update_blooms for cuckoo sidecars.

    Inserts each bucket's new fingerprints into its serialized filter
    partition-side; a bucket that overflows is flagged
    (``needs_rebuild=1``) so the engine can rebuild it from the exact
    seen table (the filter stores only 16-bit fingerprints, so a
    bigger table cannot be rehashed from the filter itself).
    """
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from crawler_spark.operators.seen import BLOOM_SCHEMA

    out_schema = StructType(
        [*BLOOM_SCHEMA.fields, StructField("needs_rebuild", IntegerType(), False)]
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:
            out = left[["host_hash", "bitmap"]].copy()
            out["needs_rebuild"] = 0
            return out
        hh = int(right["host_hash"].iloc[0])
        cf = (
            CuckooFilter.from_bytes(bytes(left["bitmap"].iloc[0]))
            if not left.empty
            else CuckooFilter()
        )
        fps = right["fp"].to_numpy()
        ok = cf.insert_many(fps)
        return pd.DataFrame(
            {
                "host_hash": [hh],
                "bitmap": [cf.to_bytes()],
                "needs_rebuild": [int(ok < len(fps))],
            }
        )

    return (
        cuckoo_df.groupBy("host_hash")
        .cogroup(new_seen.select("host_hash", "fp").groupBy("host_hash"))
        .applyInPandas(merge, schema=out_schema)
    )


def build_cuckoos(seen_fps):
    """groupBy(host_hash).applyInPandas rebuild of whole buckets from
    the exact seen fingerprints (used for overflowed buckets)."""
    import pandas as pd

    from crawler_spark.operators.seen import BLOOM_SCHEMA

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        hh = int(pdf["host_hash"].iloc[0])
        cf = build_filter(pdf["fp"].to_numpy())
        return pd.DataFrame({"host_hash": [hh], "bitmap": [cf.to_bytes()]})

    return (
        seen_fps.select("host_hash", "fp").groupBy("host_hash").applyInPandas(
            build, schema=BLOOM_SCHEMA
        )
    )
