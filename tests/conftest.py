"""Shared pytest fixtures: one local SparkSession per test run.

Mirrors the reference's test harness (TestSpark.scala:17-26 — local
master, deterministic config, per-suite session) but session-scoped for
speed. Shuffle partitions pinned low so tiny-data tests don't pay 32-way
shuffle overhead; determinism comes from explicit ORDER BY in assertions,
never from partition layout.
"""

from __future__ import annotations

import os

import pytest

from bigdatalab_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    session = get_session(
        app_name="bigdatalab-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
