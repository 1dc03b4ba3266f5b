"""The rows-only quality artifact is regenerated — not hand-edited —
and every trained/approximate operator still clears its decision gate.

tools/quality_report.py is the decision-quality analogue of the strict
oracle artifact: this test refreshes QUALITY_r05.json in the repo root
so the committed numbers are always the last measured ones, and fails
if any metric drops below its threshold."""

from __future__ import annotations

import json
import pathlib

import pytest

from tests.conftest import SF_DIR_ORACLE


@pytest.mark.slow
def test_quality_report_refreshes_and_all_gates_pass(spark):
    from tools.quality_report import compute_metrics

    metrics = compute_metrics(spark, SF_DIR_ORACLE)
    operators = {m["operator"] for m in metrics}
    assert {
        "dedup_minhash_lsh",
        "ann_ivf_kmeans",
        "ann_pq_topk",
        "ann_ivf_pq",
        "quality_classifier",
        "als_recommendations",
        "semantic_dedup",
    } <= operators

    failing = [m for m in metrics if not m["pass"]]
    assert not failing, f"quality gates regressed: {failing}"

    out = pathlib.Path(__file__).resolve().parent.parent / "QUALITY_r05.json"
    with open(out, "w") as f:
        json.dump({"sf_dir": SF_DIR_ORACLE, "metrics": metrics}, f, indent=2)
        f.write("\n")
