"""Smoke gates for the measurement tools.

The scale ledger's numbers come from tools/ (pipeline_bench,
variant_bench, ann_serve_bench); a tool that silently rots between
rounds poisons the next round's measurements. Each smoke runs the tool
in-process at sf0.001 and asserts the output contract (keys present,
counts consistent), not timings.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"


def _run_tool(module: str, *args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", module, *args],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_pipeline_bench_smoke(tmp_path):
    out = _run_tool("tools.pipeline_bench", SF)
    assert set(out["stages"]) == {
        "scan",
        "exact_dedup",
        "lsh_pairs",
        "connected_components",
        "quality_filter",
        "split_agg",
    }
    assert out["rows"]["scan"] > 0
    # stage row counts must be internally consistent: dedup keeps <= scan,
    # CC assigns every keeper a cluster
    assert out["rows"]["exact_dedup"] <= out["rows"]["scan"]
    assert out["rows"]["connected_components"] == out["rows"]["exact_dedup"]
    assert sum(n for n, _t in out["splits"].values()) == out["rows"]["quality_filter"]


def test_variant_bench_smoke(tmp_path):
    out = _run_tool("tools.variant_bench", SF, str(tmp_path / "vb"))
    assert out["n_rows"] > 0
    assert out["results_match"] is True  # A/B timing is meaningless otherwise
    for k in (
        "ingest_string_sec",
        "ingest_variant_sec",
        "query_string_reparse_sec",
        "query_variant_extract_sec",
    ):
        assert out[k] > 0


def test_ann_serve_bench_rejects_unknown_family():
    proc = subprocess.run(
        [sys.executable, "-m", "tools.ann_serve_bench", SF, "5", "nope"],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "nope" in (proc.stderr + proc.stdout)
