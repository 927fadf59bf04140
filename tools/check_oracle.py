"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs each __spark_entry__.queries() entry and its oracle_sql() twin at
the given sf dir, compares row count, sorted column names, and an
order-insensitive value hash (rows sorted, values normalized to
strings). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None or v != v:  # NaN
        return ""
    if isinstance(v, float):
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        ",".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from crawler_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spdf)} rows ({t1-t0:.1f}s)")
            if len(spdf) == 0 and name != "sparkonly":
                print(f"     WARN {name}: 0 rows")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(dpdf):
            problems.append(f"rows {len(spdf)} vs {len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(f"cols {sorted(spdf.columns)} vs {sorted(dpdf.columns)}")
        elif frame_hash(spdf) != frame_hash(dpdf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({t1-t0:.1f}s)")
            failures.append(name)
            if len(spdf) and sorted(spdf.columns) == sorted(dpdf.columns):
                cols = sorted(spdf.columns)
                s = spdf[cols].sort_values(cols).reset_index(drop=True)
                d = dpdf[cols].sort_values(cols).reset_index(drop=True)
                n = min(len(s), len(d))
                diff = None
                for i in range(n):
                    if [norm_cell(v) for v in s.iloc[i]] != [
                        norm_cell(v) for v in d.iloc[i]
                    ]:
                        diff = i
                        break
                if diff is not None:
                    print(f"     first diff @ row {diff}:")
                    print(f"     spark : {list(s.iloc[diff])}")
                    print(f"     duckdb: {list(d.iloc[diff])}")
        else:
            print(f"ok   {name}: {len(spdf)} rows match ({t1-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
