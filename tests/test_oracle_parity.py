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
    problems = check_query(spark, duck, name, sf_dir)
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
