"""Self-check harness mimicking the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, and values
order-insensitively (floats within tolerance). Run as a script:

    python -m tools.oracle_check [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

from bigdatalab_spark.sources.readers import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df):
    """Sort columns by name and rows by stringified values."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.loc[key.sort_values().index].reset_index(drop=True)
    return df


def _values_equal(a, b, rel_tol=1e-9, abs_tol=1e-9) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if (isinstance(a, float) and math.isnan(a)) and (
                isinstance(b, float) and math.isnan(b)
            ):
                return True
            return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol)
        except (TypeError, ValueError):
            return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def compare_frames(spark_pdf, duck_pdf) -> list[str]:
    """Return list of problems; empty means parity."""
    problems: list[str] = []
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        return [f"schema mismatch: spark={sc} oracle={dc}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(duck_pdf)}")
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    n_bad = 0
    for i in range(len(a)):
        for col in a.columns:
            va, vb = a.at[i, col], b.at[i, col]
            va = None if va is None or (isinstance(va, float) and math.isnan(va)) else va
            vb = None if vb is None or (isinstance(vb, float) and math.isnan(vb)) else vb
            if not _values_equal(va, vb):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"row {i} col {col}: spark={va!r} oracle={vb!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems


def check_query(spark, con, name: str, sf_dir: str) -> list[str]:
    # go through the driver contract (__spark_entry__), not the registry
    # directly, so wrappers (UTC pinning) are under test too
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    ddf = con.execute(oracle).fetchdf()
    return compare_frames(sdf, ddf)


def main() -> int:
    from bigdatalab_spark.queries import REGISTRY
    from bigdatalab_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(REGISTRY)}")
        return 2
    spark = get_session(app_name="oracle-check")
    con = duckdb_connection(sf_dir)
    failed = 0
    for name in names:
        try:
            problems = check_query(spark, con, name, sf_dir)
        except Exception as exc:  # noqa: BLE001 — report and keep going
            problems = [f"exception: {exc}"]
        status = "OK " if not problems else "FAIL"
        oracle_tag = "" if REGISTRY[name].oracle else " (rows-only)"
        print(f"[{status}] {name}{oracle_tag}")
        for p in problems:
            print(f"       {p}")
        failed += bool(problems)
    print(f"{len(names) - failed}/{len(names)} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
