"""Plan-audit core: capture a DataFrame's formatted physical plan and
check required/forbidden patterns.

Used by tools/explain_audit.py to write EXPLAIN.md; importable from
tests to pin plan shapes (e.g., "the seen anti-join stays LeftAnti",
"text analysis never leaves the JVM").
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# whole-stage codegen span marker in formatted plans (absent under an
# un-executed AdaptiveSparkPlan — use operator checks there instead)
CODEGEN = r"codegen id : "

_KEEP_LINES = re.compile(
    r"^\(\d+\)|PushedFilters|ReadSchema|WholeStageCodegen|"
    r"Join|Window|Exchange|ArrowEval|Scan parquet"
)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class AuditResult:
    name: str
    plan: str
    problems: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.problems

    @property
    def summary(self) -> str:
        return "OK" if self.ok else "; ".join(self.problems)

    @property
    def compact_plan(self) -> str:
        return "\n".join(
            ln for ln in self.plan.splitlines() if _KEEP_LINES.search(ln)
        )[:4000]


def audit_plan(
    name: str,
    df: DataFrame,
    required: list[str],
    forbidden: list[str] = (),
) -> AuditResult:
    plan = formatted_plan(df)
    res = AuditResult(name=name, plan=plan)
    for pat in required:
        if not re.search(pat, plan):
            res.problems.append(f"MISSING {pat}")
    for pat in forbidden:
        if re.search(pat, plan):
            res.problems.append(f"FORBIDDEN {pat}")
    return res
