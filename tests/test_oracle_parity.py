"""Every registered query with an oracle must hash-match DuckDB.

This mirrors the driver's correctness gate (row-count + schema +
order-insensitive values) at sf0.001 for speed; ``python -m
tools.oracle_check`` runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from bigdatalab_spark.queries import REGISTRY
from tools.oracle_check import check_query, duckdb_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    problems, _mode = check_query(spark, duck, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()


def test_contract_shapes():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    assert set(osql) <= set(qs)


def test_compare_frames_catches_injected_defects():
    """Self-test of the correctness gate: the comparator must reject a
    dropped row, a changed value, a renamed column, and an int->float
    dtype drift — the defect classes the oracle hash exists to catch."""
    import pandas as pd

    from tools.oracle_check import compare_frames

    good = pd.DataFrame({"k": ["a", "b", "c"], "n": [1, 2, 3]})
    assert compare_frames(good.copy(), good.copy()) == []
    assert compare_frames(good.iloc[:2].copy(), good.copy())      # dropped row
    mutated = good.copy(); mutated.loc[1, "n"] = 99
    assert compare_frames(mutated, good.copy())                   # wrong value
    renamed = good.rename(columns={"n": "count"})
    assert compare_frames(renamed, good.copy())                   # renamed col
    drifted = good.copy(); drifted["n"] = drifted["n"].astype(float)
    assert compare_frames(drifted, good.copy())                   # dtype drift


def test_compare_distributed_catches_injected_defects(spark, tmp_path):
    """The distributed comparator (in-engine order-insensitive digest,
    used above the collect budget) must agree with the pandas path on
    equal inputs AND catch the same defect classes: dropped row, wrong
    value, renamed column, int-vs-float kind drift. Row ORDER must not
    matter (the driver hash is order-insensitive)."""
    from tools.oracle_check import compare_distributed, duckdb_connection

    con = duckdb_connection("/root/testdata/sf0.01")
    sdf = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", float("nan"))],
        "k long, s string, x double",
    )
    base = (
        "SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), "
        "(3, 'c', CAST('nan' AS DOUBLE))) t(k, s, x)"
    )
    assert compare_distributed(spark, con, sdf, base, "eq") == []
    # order-insensitive
    assert (
        compare_distributed(
            spark, con, sdf, base + " ORDER BY k DESC", "ord"
        )
        == []
    )
    # dropped row
    assert compare_distributed(
        spark, con, sdf, base + " WHERE k < 3", "drop"
    )
    # wrong value
    bad_val = base.replace("2.5", "2.6")
    assert compare_distributed(spark, con, sdf, bad_val, "val")
    # renamed column
    bad_col = base.replace("t(k, s, x)", "t(k, s, y)")
    out = compare_distributed(spark, con, sdf, bad_col, "col")
    assert out and "schema" in out[0]
    # int-vs-float kind drift
    bad_kind = (
        "SELECT k, s, CAST(x AS BIGINT) AS x FROM (" + base + ")"
    )
    out = compare_distributed(spark, con, sdf, bad_kind, "kind")
    assert out and "kind" in out[0]
