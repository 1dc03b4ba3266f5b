"""Declarative data-quality checks — one scan per table, whatever the
check count.

The expectation-suite pattern (Great Expectations / dbt tests / Deequ)
as a Spark-frugal operator: every row-level predicate and every
whole-column property of one table folds into a SINGLE aggregate pass
(conditional sums share the scan; uniqueness is count vs
count_distinct in the same aggregate), and referential checks are one
left-anti join each. At 100 TB the check suite costs one read of the
table — the design constraint that rules out per-check queries.

Returns one row per check: (check_name, n_rows, n_violations, passed)
— the report a pipeline gate consumes. NULL handling follows SQL
three-valued logic made explicit: a NULL predicate result counts as a
VIOLATION for ``expect`` checks (an unknown is not a pass), while
``not_null`` is its own check kind.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """Row-level predicate check: every row must satisfy ``cond``."""

    name: str
    cond: Column


@dataclass(frozen=True)
class NotNull:
    name: str
    col: str


@dataclass(frozen=True)
class Unique:
    """No duplicate values of ``col`` (NULLs ignored, like SQL UNIQUE)."""

    name: str
    col: str


@dataclass(frozen=True)
class ForeignKey:
    """Every non-NULL ``col`` value exists in ``ref[ref_col]``."""

    name: str
    col: str
    ref: DataFrame
    ref_col: str


def run_checks(df: DataFrame, checks: list) -> DataFrame:
    """Evaluate a check suite against ``df`` — see module docstring.

    All Expect/NotNull/Unique checks share ONE aggregate over one scan;
    each ForeignKey adds one anti-join aggregate, and all FK checks
    share a single extra row-count scan (constant, not per-FK). An
    empty suite returns an empty report frame. Results union into
    (check_name, n_rows, n_violations, passed).
    """
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    names: list[str] = []
    for c in checks:
        if isinstance(c, Expect):
            # NULL predicate = violation: coalesce(cond, false)
            viol = F.sum(
                (~F.coalesce(c.cond, F.lit(False))).cast("bigint")
            )
        elif isinstance(c, NotNull):
            viol = F.sum(F.col(c.col).isNull().cast("bigint"))
        elif isinstance(c, Unique):
            viol = F.count(c.col) - F.count_distinct(F.col(c.col))
        elif isinstance(c, ForeignKey):
            continue  # handled below
        else:
            raise TypeError(f"unknown check type: {type(c).__name__}")
        names.append(c.name)
        aggs.append(viol.alias(f"_v_{len(names) - 1}"))
    seen = {c.name for c in checks}
    if len(seen) != len(checks):
        raise ValueError("check names must be unique")

    parts: list[DataFrame] = []
    if names:
        wide = df.agg(*aggs)
        parts.append(
            wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(n).alias("check_name"),
                                F.col("_n_rows").alias("n_rows"),
                                F.col(f"_v_{i}").alias("n_violations"),
                            )
                            for i, n in enumerate(names)
                        ]
                    )
                ).alias("c")
            ).select("c.*")
        )
    fk_parts: list[DataFrame] = []
    for c in checks:
        if not isinstance(c, ForeignKey):
            continue
        refs = c.ref.select(F.col(c.ref_col).alias(c.col)).distinct()
        orphans = (
            df.select(c.col)
            .filter(F.col(c.col).isNotNull())
            .join(refs, c.col, "left_anti")
        )
        fk_parts.append(
            orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
                F.lit(c.name).alias("check_name"), "n_violations"
            )
        )
    if fk_parts:
        # ONE shared row-count scan for every FK check, not one per FK
        fk_all = fk_parts[0]
        for p in fk_parts[1:]:
            fk_all = fk_all.unionByName(p)
        parts.append(
            fk_all.crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows"))).select(
                "check_name", "n_rows", "n_violations"
            )
        )
    if not parts:  # empty suite -> empty report, not an IndexError
        return df.sparkSession.createDataFrame(
            [], "check_name string, n_rows bigint, n_violations bigint, passed boolean"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
