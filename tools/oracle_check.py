"""Self-check harness mimicking the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, per-column
dtype kind, and an EXACT canonical rendering of every value — no float
tolerance. This is deliberately as strict as the driver's value-hash:
an int sum rendered ``967`` must not be compared equal to a float
``967.0`` (DuckDB HUGEINT leaking through pandas as float64 was exactly
the round-1 hash-fail mode). Run as a script:

    python -m tools.oracle_check [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

from bigdatalab_spark.sources.readers import TABLES


#: spill directory per live connection (id(con) → path) so
#: close_connection can reclaim it — a failed spilling query can
#: strand tens of GB of temp storage otherwise
_SPILL_DIRS: dict[int, str] = {}


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Oracle session with BOUNDED memory and a spill directory: a
    long sf1 sweep runs ~180 oracles in one process next to a live
    Spark JVM, and an uncapped DuckDB under that cumulative pressure
    dies with 'bad allocation' on the heaviest replay (round-11
    cluster_split_decontam casualty) instead of degrading to disk.
    The cap leaves the Spark JVM its share of the box while keeping
    the heaviest single replay (the near-dup cluster pipeline at sf1)
    mostly in memory — too low a cap just moves the failure to disk
    (ENOSPC on ~60 GB of forced spill, measured). SPARK_GRAFT_ORACLE_MEM
    overrides. Close with :func:`close_connection` to reclaim spill."""
    import os
    import tempfile

    con = duckdb.connect()
    # 80GB ≈ what a solo uncapped run gets on this box (the sf1
    # cluster-leak replay PASSES there); 24GB and 48GB both moved the
    # failure to ENOSPC on forced spill — the workspace is real, the
    # cap must leave most of it in RAM. threads=16 halves per-operator
    # buffer fan-out for the same reason (peak, not throughput, is
    # the sweep's constraint).
    limit = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "80GB")
    con.execute(f"SET memory_limit='{limit}'")
    con.execute(f"SET threads={min(16, os.cpu_count() or 16)}")
    spill = tempfile.mkdtemp(prefix="duckdb_oracle_spill_")
    con.execute(f"SET temp_directory='{spill}'")
    _SPILL_DIRS[id(con)] = spill
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def close_connection(con: duckdb.DuckDBPyConnection) -> None:
    """Close + delete the connection's spill directory (DuckDB keeps
    temp storage files around for reuse within a connection, and a
    query that died mid-spill leaves them behind)."""
    import shutil

    spill = _SPILL_DIRS.pop(id(con), None)
    con.close()
    if spill:
        shutil.rmtree(spill, ignore_errors=True)


def _render(v) -> str:
    """Exact canonical rendering: ints stay ints, floats render via
    Python's shortest-roundtrip repr, arrays recurse. Two cells are
    equal iff their renderings are equal — no numeric tolerance."""
    import numpy as np

    if v is None:
        return "\x01null"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "\x01null" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    return str(v)


def _dtype_kind(dtype) -> str:
    """Collapse dtypes to comparable kinds: i=int, f=float, b=bool,
    O=object/string, M=datetime. int32 vs int64 is fine; int vs float
    is a representation bug the driver's hash would catch."""
    return getattr(dtype, "kind", "O")


def _normalize(df):
    """Sort columns by name and rows by canonical rendering."""
    df = df[sorted(df.columns)].copy()
    rendered = df.apply(lambda col: col.map(_render))
    if len(df):
        key = rendered.agg("\x00".join, axis=1)
        order = key.sort_values().index
        df = df.loc[order].reset_index(drop=True)
        rendered = rendered.loc[order].reset_index(drop=True)
    return df, rendered


def compare_frames(spark_pdf, duck_pdf) -> list[str]:
    """Return list of problems; empty means driver-strict parity."""
    problems: list[str] = []
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        return [f"schema mismatch: spark={sc} oracle={dc}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(duck_pdf)}")
        return problems
    for col in sc:
        ka = _dtype_kind(spark_pdf[col].dtype)
        kb = _dtype_kind(duck_pdf[col].dtype)
        if ka != kb:
            problems.append(
                f"dtype kind mismatch col {col}: spark={spark_pdf[col].dtype} "
                f"oracle={duck_pdf[col].dtype} (int-vs-float renders differently "
                f"under the driver hash)"
            )
    if problems:
        return problems
    (a, ra), (b, rb) = _normalize(spark_pdf), _normalize(duck_pdf)
    n_bad = 0
    for i in range(len(a)):
        for col in a.columns:
            if ra.at[i, col] != rb.at[i, col]:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(
                        f"row {i} col {col}: spark={a.at[i, col]!r} "
                        f"oracle={b.at[i, col]!r}"
                    )
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return "M"
    return "O"


def _duck_kind(typ: str) -> str:
    t = typ.upper()
    if t.startswith("DECIMAL") or t in ("DOUBLE", "FLOAT", "REAL"):
        return "f"
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "i"
    if t == "BOOLEAN":
        return "b"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "M"
    return "O"


def compare_distributed(spark, con, sdf_df, oracle: str, name: str) -> list[str]:
    """Compare without EVER materializing either side on the driver:
    the Spark result lands in temp parquet (distributed write), then
    BOTH sides run through the SAME DuckDB hashing SQL — column-wise
    canonical casts by dtype kind, then an order-insensitive
    ``sum(hash(row))`` content digest computed out-of-core. One engine
    renders both sides, so cross-engine float-formatting differences
    cannot fake a mismatch; int-vs-float still fails loudly via the
    kind check (the driver-hash failure mode). Used automatically when
    the oracle's row count exceeds the collect budget — e.g. the
    243M-pair simhash output at sf1 that no driver-side pandas compare
    can hold."""
    import os
    import shutil
    import tempfile

    spark_kinds = {
        f.name: _spark_kind(f.dataType) for f in sdf_df.schema.fields
    }
    desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle})").fetchall()
    duck_kinds = {r[0]: _duck_kind(r[1]) for r in desc}
    sc, dc = sorted(spark_kinds), sorted(duck_kinds)
    if sc != dc:
        return [f"schema mismatch: spark={sc} oracle={dc}"]
    problems = [
        f"dtype kind mismatch col {c}: spark kind={spark_kinds[c]} "
        f"oracle kind={duck_kinds[c]}"
        for c in sc
        if spark_kinds[c] != duck_kinds[c]
    ]
    if problems:
        return problems
    exprs = []
    for c in sc:
        k, q = spark_kinds[c], f'"{c}"'
        if k == "i":
            exprs.append(f"CAST({q} AS BIGINT)")
        elif k == "f":
            exprs.append(
                f"(CASE WHEN isnan(CAST({q} AS DOUBLE)) THEN NULL "
                f"ELSE CAST({q} AS DOUBLE) END)"
            )
        elif k == "b":
            exprs.append(f"CAST({q} AS BOOLEAN)")
        elif k == "M":
            exprs.append(f"CAST({q} AS TIMESTAMP)")
        else:
            exprs.append(f"CAST({q} AS VARCHAR)")
    digest = (
        "count(*) AS n, "
        f"COALESCE(SUM(CAST(hash({', '.join(exprs)}) AS HUGEINT)), 0) AS h"
    )
    tmp = tempfile.mkdtemp(prefix=f"oracle_dist_{name}_")
    try:
        out = os.path.join(tmp, "spark_result")
        sdf_df.write.mode("overwrite").parquet(out)
        ns, hs = con.execute(
            f"SELECT {digest} FROM read_parquet('{out}/*.parquet')"
        ).fetchone()
        no, ho = con.execute(f"SELECT {digest} FROM ({oracle})").fetchone()
        if ns != no:
            problems.append(f"row count: spark={ns} oracle={no}")
        elif hs != ho:
            problems.append(
                f"content digest mismatch over {ns} rows "
                "(order-insensitive sum of per-row hashes, both sides "
                "rendered by DuckDB)"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return problems


def check_query(
    spark, con, name: str, sf_dir: str, max_collect: int = 2_000_000
) -> tuple[list[str], str]:
    """Returns (problems, mode). Mode ``strict`` collects both sides to
    pandas and compares exact canonical renderings cell by cell;
    ``strict-distributed`` kicks in when the oracle's row count exceeds
    ``max_collect`` and compares counts + an in-engine content digest
    instead (same strictness on schema/kind, no driver materialization)."""
    # go through the driver contract (__spark_entry__), not the registry
    # directly, so wrappers (UTC pinning) are under test too
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    sdf_df = fn(spark, sf_dir)
    if oracle is None:
        # rows-only gate: the driver requires rows > 0, so do we
        n = sdf_df.limit(1).count()
        return ([] if n > 0 else ["rows-only query returned 0 rows"], "rows-only")
    n_oracle = con.execute(f"SELECT count(*) FROM ({oracle})").fetchone()[0]
    if n_oracle > max_collect:
        return (
            compare_distributed(spark, con, sdf_df, oracle, name),
            "strict-distributed",
        )
    sdf = sdf_df.toPandas()
    ddf = con.execute(oracle).fetchdf()
    return compare_frames(sdf, ddf), "strict"


def main() -> int:
    from bigdatalab_spark.queries import REGISTRY
    from bigdatalab_spark.session import get_session

    argv = list(sys.argv[1:])
    json_path = None
    max_collect = 2_000_000
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: python -m tools.oracle_check [sf_dir] [query ...] --json PATH")
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    restart_every = 0
    for a in list(argv):
        if a.startswith("--max-collect="):
            max_collect = int(a.split("=", 1)[1])
            argv.remove(a)
        elif a.startswith("--restart-every="):
            restart_every = int(a.split("=", 1)[1])
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(REGISTRY)}")
        return 2
    spark = get_session(app_name="oracle-check")
    con = duckdb_connection(sf_dir)
    failed = 0
    results: dict[str, dict] = {}
    for qi, name in enumerate(names):
        if restart_every and qi and qi % restart_every == 0:
            # long sf1 sweeps accumulate JVM pressure a clearCache
            # cannot release (codegen classes, broadcasts, statestore
            # providers); recycling the session every N queries keeps
            # every verdict real in ONE sequential pass — no chunked
            # artifacts, no log recovery
            spark.stop()
            from pyspark.sql import SparkSession

            SparkSession._instantiatedSession = None
            SparkSession._activeSession = None
            spark = get_session(app_name="oracle-check")
            # recycle the oracle session too: DuckDB's buffer pool and
            # temp spill accumulate the same way across a sweep
            close_connection(con)
            con = duckdb_connection(sf_dir)
        try:
            problems, mode = check_query(
                spark, con, name, sf_dir, max_collect=max_collect
            )
        except Exception as exc:  # noqa: BLE001 — report and keep going
            problems = [f"exception: {exc}"]
            mode = "strict" if REGISTRY[name].oracle else "rows-only"
        status = "OK " if not problems else "FAIL"
        oracle_tag = "" if mode == "strict" else f" ({mode})"
        print(f"[{status}] {name}{oracle_tag}")
        for p in problems:
            print(f"       {p}")
        results[name] = {
            "ok": not problems,
            "mode": mode,
            "problems": problems,
        }
        failed += bool(problems)
        # several operators persist shared intermediates that back their
        # lazy results (LSH shingles, zip_with_index stamps); drop them
        # between queries so an 80-query sweep doesn't accumulate cache
        spark.catalog.clearCache()
    close_connection(con)
    print(f"{len(names) - failed}/{len(names)} queries pass")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(names),
                    "n_pass": len(names) - failed,
                    "results": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
