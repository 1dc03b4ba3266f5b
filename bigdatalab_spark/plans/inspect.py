"""Physical-plan inspection (SURVEY §2.10 plan inspection; §4 audits).

The reference teaches plan reading (`explain`, `toDebugString` —
303-spark-sql/README.md:128-129,145-146; 301-solutions.scala:72-77);
this module is the engine's programmatic version, used by tests to
ASSERT the optimizations the reference demonstrates by hand:

- ``pushed_filters``: predicate pushdown reached the parquet scan
- ``read_schema_columns``: column pruning reached the scan
- ``has_broadcast_join``: broadcast strategy chosen
- ``exchange_count``: shuffle count — the scale-limiting metric
- ``wholestage_codegen_count``: codegen span coverage

Every operator we ship is audited with these (tests/test_plans.py); a
plan regression (lost pushdown, extra Exchange) fails CI, which is how
"would this survive 100x scale-up" stays enforced instead of hoped.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints to stdout)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into file-source scans (PushedFilters: [...])."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read by scans (ReadSchema) — column pruning."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _executed_plan(df) or "BroadcastNestedLoopJoin" in _executed_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the physical plan (excluding
    broadcast exchanges and AQE shuffle reads)."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", _executed_plan(df)))


def wholestage_codegen_count(df: DataFrame) -> int:
    """WholeStageCodegen spans in the FINAL plan. Under AQE the final
    plan only exists after execution, so this triggers the job (cheap at
    test scale) and reads the re-optimized plan."""
    plan = _executed_plan(df)
    if "isFinalPlan=false" in plan:
        # execute THIS df's plan (count()/limit() would spawn a new
        # queryExecution) without materializing rows on the driver —
        # foreachPartition runs the job and discards rows executor-side
        df.foreachPartition(lambda it: None)
        plan = _executed_plan(df)
    # codegen spans print as "*(n) Operator" in plan strings (and as
    # WholeStageCodegen nodes in formatted explain)
    spans = set(re.findall(r"\*\((\d+)\)", plan))
    return len(spans) or len(re.findall(r"WholeStageCodegen", plan))
