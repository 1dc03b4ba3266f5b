"""Per-query shuffle/scan byte audit — measured evidence for the scale
claims in SCALE_NOTES.md.

Runs each headline query (same set and noop-sink execution as bench.py)
in a UI-enabled session and attributes shuffle byte deltas
from Spark's status REST API (``/api/v1/applications/<app>/stages``):
shuffle write bytes and shuffle read bytes. Execution is sequential, so
the before/after delta per query is exact attribution. (Input/scan bytes
are NOT reported: the vectorized parquet reader under-counts the
``inputBytes`` task metric, so only the shuffle-manager numbers — which
are exact — are shown.)

Why bytes and not just seconds: a query can look fast at sf0.1 while
shuffling its whole input — the byte profile is what predicts the 100 TB
behavior (shuffle ∝ input is fine for a global regroup, catastrophic for
an operator whose output is reduced).

Usage: python -m tools.shuffle_audit [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def _stage_totals(ui: str, app: str) -> dict[str, int]:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    tot = {"stages": len(stages), "shuffle_write": 0, "shuffle_read": 0}
    for s in stages:
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
    return tot


def _settled_totals(ui: str, app: str, min_stages: int = 0) -> dict[str, int]:
    """Stage totals once the status listener has drained.

    The listener posts completed-stage metrics asynchronously; a fixed
    sleep is a race on a loaded machine (late metrics get attributed to
    the NEXT query). Poll until the completed-stage count has reached
    ``min_stages`` (so a read taken before the listener posts anything
    can't masquerade as settled) AND two consecutive reads agree on
    both the stage count and the byte totals; bounded at ~10 s.
    """
    prev = None
    for _ in range(50):
        cur = _stage_totals(ui, app)
        if cur == prev and cur["stages"] >= min_stages:
            return cur
        prev = cur
        time.sleep(0.2)
    return prev


def _kb(n: int) -> str:
    return f"{n / 1e3:10.1f}"


def main() -> int:
    from bigdatalab_spark.queries import REGISTRY
    from bigdatalab_spark.session import get_session

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    names = argv[1:] or [
        "pricing_summary",
        "sql_entrypoint_revenue",
        "lineitem_part_supplier",
        "preagg_revenue_join",
        "top_parts_per_year",
        "word_count",
        "inverted_index",
        "events_sliding_6h_2h",
        "streaming_cumulative_counts",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "quality_scores",
    ]
    names = [n for n in names if n in REGISTRY]

    spark = get_session(
        app_name="shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print(
            "no Spark UI: session was created earlier in this process "
            "with spark.ui.enabled=false — run the audit in a fresh process"
        )
        return 2
    app = spark.sparkContext.applicationId

    print(f"{'query':34} {'shufW KB':>10} {'shufR KB':>10}")
    for name in names:
        spark.catalog.clearCache()
        before = _settled_totals(ui, app)
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        # every query runs >= 1 stage, so require the count to move
        after = _settled_totals(ui, app, min_stages=before["stages"] + 1)
        print(
            f"{name:34} "
            f"{_kb(after['shuffle_write'] - before['shuffle_write'])} "
            f"{_kb(after['shuffle_read'] - before['shuffle_read'])}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
