"""Snapshot-committed table storage with an Iceberg-shaped API.

The reference keeps all state in one SQLite file and commits every
100 rows (src/harvester.py:863-865, src/analyzer.py:291-293). Here
every scheduling round commits one atomic snapshot per state table,
which is what makes runs resumable from a checkpoint (north rule).

On a real cluster this maps 1:1 onto Iceberg:
  append    -> INSERT INTO
  overwrite -> INSERT OVERWRITE / MERGE
  snapshot  -> the Iceberg snapshot id
This sandbox has no iceberg-spark-runtime jar, so the same semantics
are emulated with parquet snapshot directories plus an atomically
renamed JSON manifest (write temp, os.replace). Each table version is
immutable; the manifest names the current version; resume = read the
manifest. The engine only talks to this class, so swapping in real
Iceberg is a constructor change.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def spark_schema_to_arrow(schema: StructType):
    """pyarrow schema for a (simple-typed) Spark schema — so the
    driver-direct writes produce parquet byte-compatible with what
    Spark would have written for the same StructType."""
    import pyarrow as pa

    mapping = {
        "integer": pa.int32(),
        "long": pa.int64(),
        "string": pa.string(),
        "binary": pa.binary(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
    }
    fields = []
    for f in schema.fields:
        t = f.dataType.typeName()
        if t not in mapping:
            raise TypeError(f"spark_schema_to_arrow: unsupported type {t} for {f.name}")
        fields.append(pa.field(f.name, mapping[t], nullable=f.nullable))
    return pa.schema(fields)


@dataclass
class SnapshotCatalog:
    """Versioned parquet tables under ``root`` with atomic manifests."""

    spark: SparkSession
    root: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    # ------------------------------------------------------------ paths
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_manifest.json")

    def _read_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, name: str, manifest: dict) -> None:
        d = self._table_dir(name)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(name))  # atomic commit point

    # ------------------------------------------------------------ reads
    def exists(self, name: str) -> bool:
        return self._read_manifest(name) is not None

    def read(self, name: str, schema: StructType | None = None) -> DataFrame:
        """Current snapshot of ``name``; empty DF with ``schema`` if absent."""
        if name in self._cache:
            return self._cache[name]
        m = self._read_manifest(name)
        if m is None:
            if schema is None:
                raise FileNotFoundError(f"table {name} has no snapshot and no schema given")
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.parquet(*[os.path.join(self._table_dir(name), p) for p in m["paths"]])
        self._cache[name] = df
        return df

    def snapshot_version(self, name: str) -> int:
        m = self._read_manifest(name)
        return -1 if m is None else m["version"]

    def properties(self, name: str) -> dict:
        m = self._read_manifest(name)
        return {} if m is None else m.get("properties", {})

    # ----------------------------------------------------------- writes
    def _write_version(self, name: str, df: DataFrame) -> str:
        m = self._read_manifest(name)
        version = 0 if m is None else m["version"] + 1
        rel = f"v{version:06d}-{int(time.time() * 1000)}"
        out = os.path.join(self._table_dir(name), rel)
        df.write.mode("overwrite").parquet(out)
        return rel

    def overwrite(self, name: str, df: DataFrame, properties: dict | None = None) -> None:
        """Replace table contents atomically (Iceberg INSERT OVERWRITE)."""
        rel = self.stage_overwrite(name, df)
        self.commit_staged_overwrite(name, rel, properties)

    def stage_overwrite(self, name: str, df: DataFrame) -> str:
        """Phase 1 of a two-phase overwrite: run the (expensive) Spark
        write job into a new immutable version directory WITHOUT
        advancing the manifest. Readers keep seeing the old snapshot;
        a crash here leaves only an orphan directory (same as a crash
        mid-:meth:`overwrite`). Returns the staged version path for
        :meth:`commit_staged_overwrite`.

        This is what lets the engine overlap the frontier overwrite's
        write job with the pages->seen->bloom commit chain on another
        thread while still committing the frontier pointer LAST — the
        crash-ordering contract is carried entirely by the manifest
        swap, not by when the bytes were written (Iceberg analog:
        writing data/manifest files vs. the catalog pointer CAS)."""
        return self._write_version(name, df)

    def commit_staged_overwrite(
        self, name: str, staged: str, properties: dict | None = None
    ) -> None:
        """Phase 2: atomically point the manifest at a staged version."""
        m = self._read_manifest(name)
        version = 0 if m is None else m["version"] + 1
        self._commit_manifest(
            name,
            {"version": version, "paths": [staged], "properties": properties or {}},
        )
        self._cache.pop(name, None)

    def append(self, name: str, df: DataFrame, properties: dict | None = None) -> None:
        """Append a new data file set atomically (Iceberg INSERT INTO).

        Appends reuse prior snapshot files by reference — no rewrite of
        existing data, which is what keeps per-round commits O(delta)
        instead of O(table) at 10^10-row scale.
        """
        rel = self._write_version(name, df)
        m = self._read_manifest(name)
        paths = ([*m["paths"], rel]) if m else [rel]
        version = 0 if m is None else m["version"] + 1
        props = (m.get("properties", {}) if m else {}) | (properties or {})
        self._commit_manifest(name, {"version": version, "paths": paths, "properties": props})
        self._cache.pop(name, None)

    def merge_insert(
        self, name: str, df: DataFrame, key: str, schema: StructType | None = None
    ) -> None:
        """MERGE ... WHEN NOT MATCHED THEN INSERT on ``key``.

        Analog of the reference's re-check-then-INSERT
        (src/harvester.py:234-281) and INSERT OR IGNORE
        (src/keyword_manager.py:72-77): only rows whose key is absent
        are appended. Implemented as left_anti + append so existing
        files are untouched.
        """
        if self.exists(name):
            current = self.read(name, schema)
            df = df.join(current.select(key), on=key, how="left_anti")
        self.append(name, df)

    def overwrite_arrow(self, name: str, table, properties: dict | None = None) -> None:
        """Overwrite a SMALL driver-resident table via pyarrow directly.

        Same snapshot/manifest semantics as :meth:`overwrite`, but the
        parquet file is written by the driver without a Spark job —
        round-trip of a python-local 16-row DataFrame through
        createDataFrame().write costs ~5s of fixed per-round overhead
        (pickled-RDD scan + python worker + committer), pure serial
        time at any cluster size. Spark reads the result identically.
        ``table``: a ``pyarrow.Table``.
        """
        import pyarrow.parquet as pq

        m = self._read_manifest(name)
        version = 0 if m is None else m["version"] + 1
        rel = f"v{version:06d}-{int(time.time() * 1000)}"
        out = os.path.join(self._table_dir(name), rel)
        os.makedirs(out, exist_ok=True)
        pq.write_table(table, os.path.join(out, "part-00000-arrow.parquet"))
        self._commit_manifest(
            name, {"version": version, "paths": [rel], "properties": properties or {}}
        )
        self._cache.pop(name, None)

    def append_arrow(self, name: str, table, properties: dict | None = None) -> None:
        """Append a SMALL driver-resident file set via pyarrow directly.

        Same manifest semantics as :meth:`append` (existing data files
        are reused by reference), same rationale as
        :meth:`overwrite_arrow`: when the rows are already on the
        driver (O(hosts) lineage metrics), a Spark write job is pure
        fixed serial overhead per round. ``table``: a ``pyarrow.Table``.
        """
        import pyarrow.parquet as pq

        m = self._read_manifest(name)
        version = 0 if m is None else m["version"] + 1
        rel = f"v{version:06d}-{int(time.time() * 1000)}"
        out = os.path.join(self._table_dir(name), rel)
        os.makedirs(out, exist_ok=True)
        pq.write_table(table, os.path.join(out, "part-00000-arrow.parquet"))
        paths = ([*m["paths"], rel]) if m else [rel]
        props = (m.get("properties", {}) if m else {}) | (properties or {})
        self._commit_manifest(name, {"version": version, "paths": paths, "properties": props})
        self._cache.pop(name, None)

    def set_properties(self, name: str, properties: dict) -> None:
        """Metadata-only commit: update table properties without
        touching data files (Iceberg's properties-update snapshot).
        Used to advance the scheduler clock over idle rounds — an
        O(manifest) write instead of an O(table) rewrite."""
        m = self._read_manifest(name)
        if m is None:
            raise FileNotFoundError(f"table {name} has no snapshot")
        m["version"] += 1
        m["properties"] = {**m.get("properties", {}), **properties}
        self._commit_manifest(name, m)

    def drop(self, name: str) -> None:
        d = self._table_dir(name)
        if os.path.exists(d):
            shutil.rmtree(d)
        self._cache.pop(name, None)

    def uncache(self, name: str | None = None) -> None:
        if name is None:
            self._cache.clear()
        else:
            self._cache.pop(name, None)

    def compact(self, name: str, schema: StructType | None = None) -> None:
        """Rewrite the table into a single snapshot (Iceberg rewrite_data_files)."""
        df = self.read(name, schema)
        self.overwrite(name, df)
