"""Plan audit: capture physical plans for the headline queries and
check the properties that matter at 100 TB.

For each audited query the script records the formatted plan plus
automated checks:
- parquet scans carry PushedFilters / a pruned ReadSchema (no
  full-width reads for narrow projections),
- small dimensions broadcast (BroadcastHashJoin), big sides shuffle,
- relational glue stays inside WholeStageCodegen,
- no Python evaluation nodes outside the intended UDF stages.

Writes EXPLAIN.md. Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

CODEGEN = r"codegen id : "  # whole-stage codegen span marker in formatted plans

AUDITS = {
    # query name -> (checks that must appear, forbidden patterns)
    "id_range_scan": (
        [r"PushedFilters: \[.*GreaterThanOrEqual\(doc_id,100\)", CODEGEN],
        [r"ArrowEvalPython", r"BatchEvalPython"],
    ),
    # AQE-wrapped plans don't annotate codegen ids before execution;
    # assert the operator shapes + python-free instead.
    "tpch_q1": (
        [r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", r"HashAggregate"],
        [r"ArrowEvalPython", r"BatchEvalPython"],
    ),
    "semi_join": ([r"LeftSemi"], [r"ArrowEvalPython"]),
    "keyword_titles": ([r"BroadcastHashJoin"], []),
    "text_analysis": (
        [CODEGEN],
        [r"ArrowEvalPython", r"BatchEvalPython"],  # all-native text ops
    ),
    "exact_dedup": ([r"Window", r"ReadSchema: struct<doc_id:bigint,text:string"], []),
    "minhash_lsh": ([r"xxhash64"], [r"ArrowEvalPython"]),  # signatures JVM-side
    "politeness_admission": ([r"Window"], []),
    # exact dedup is a LeftAnti join; the bloom prefilter is the
    # co-partitioned cogroup (FlatMapCoGroupsInPandas) in this query
    "seen_anti_join": ([r"LeftAnti", r"FlatMapCoGroupsInPandas"], []),
    "cosine_topk": ([r"Window", r"BroadcastNestedLoopJoin"], [r"ArrowEvalPython"]),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    sections = ["# EXPLAIN — physical-plan audit (auto-written by tools/explain_audit.py)", ""]
    failures = []
    for name, (required, forbidden) in AUDITS.items():
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        probs = []
        for pat in required:
            if not re.search(pat, plan):
                probs.append(f"MISSING {pat}")
        for pat in forbidden:
            if re.search(pat, plan):
                probs.append(f"FORBIDDEN {pat}")
        status = "OK" if not probs else "; ".join(probs)
        print(f"{name}: {status}")
        if probs:
            failures.append(name)
        sections += [
            f"## {name} — {status}",
            "",
            "```",
            # keep the plan section compact: header + scans + joins
            "\n".join(
                ln
                for ln in plan.splitlines()
                if re.search(
                    r"^\(\d+\)|PushedFilters|ReadSchema|WholeStageCodegen|"
                    r"Join|Window|Exchange|ArrowEval|Scan parquet",
                    ln,
                )
            )[:4000],
            "```",
            "",
        ]
    with open("EXPLAIN.md", "w") as f:
        f.write("\n".join(sections))
    print("\nwrote EXPLAIN.md;", ("FAILURES: " + ", ".join(failures)) if failures else "all checks pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
