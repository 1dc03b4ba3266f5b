"""Sentinel-normalized bench comparison — is a delta a plan change or load?

Round 7's lesson: the driver's 10.70 s artifact vs the solo 9.63 s was
pure environment (loadavg 2.68 at start, CPU sentinel 1.3x solo), and
adjudicating that required a human re-running the bench. This tool
computes it from the artifacts alone: bench.py's env block records a
fixed-code CPU sentinel per run, so the ratio of sentinels between two
runs IS the environment's speed ratio, and dividing each per-query
delta by it isolates what the PLANS did from what the MACHINE did.

For two bench JSONs A (old) and B (new):

    raw_ratio(q)        = B.queries[q] / A.queries[q]
    env_ratio           = B.env.sentinel / A.env.sentinel
    normalized_ratio(q) = raw_ratio(q) / env_ratio

A query is flagged as a REGRESSION only when its normalized ratio
exceeds the threshold (default 1.3 — below that is run-to-run noise;
measured swing on this box is ±10-20% per query even solo). Queries
missing from either side are reported as added/removed, never
silently skipped.

Exit code: 0 = no normalized regression, 1 = at least one (so a round
close can gate on it), 2 = artifacts unusable (no overlap / missing
sentinel when --require-sentinel).

Usage: python -m tools.bench_compare OLD.json NEW.json [--threshold=1.3]
Output: one JSON line.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    """Accept both bench.py's raw one-line JSON and the driver's
    BENCH_r{N}.json wrapper (which nests the parsed line under
    'parsed')."""
    with open(path, encoding="utf-8") as fh:
        doc = json.loads(fh.read())
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc


def compare(a: dict, b: dict, threshold: float = 1.3) -> dict:
    qa, qb = a.get("queries", {}), b.get("queries", {})
    sa = (a.get("env") or {}).get("sentinel_nation_count_sec")
    sb = (b.get("env") or {}).get("sentinel_nation_count_sec")
    env_ratio = (sb / sa) if (sa and sb) else None
    shared = sorted(set(qa) & set(qb))
    per_query = {}
    regressions = []
    for q in shared:
        if not qa[q]:
            continue  # a 0-time old entry can't form a ratio
        raw = qb[q] / qa[q]
        norm = raw / env_ratio if env_ratio else raw
        per_query[q] = {"old": qa[q], "new": qb[q], "raw_ratio": round(raw, 3),
                        "normalized_ratio": round(norm, 3)}
        if norm > threshold:
            regressions.append(q)
    # legacy (query-engine-only) subtotal: exclude every LIFECYCLE
    # anchor either side declares, recomputed from the per-query
    # timings so artifacts predating the field still compare; the
    # default set covers anchors added before bench.py emitted the
    # field (round 11's commit-plane lifecycle bench)
    lifecycle = (
        set(a.get("lifecycle_queries") or [])
        | set(b.get("lifecycle_queries") or [])
        | {"managed_table_dml_read"}
    )
    legacy = {
        "lifecycle_queries": sorted(lifecycle),
        "old": round(sum(v for q, v in qa.items() if q not in lifecycle), 3),
        "new": round(sum(v for q, v in qb.items() if q not in lifecycle), 3),
    }
    if legacy["old"]:
        raw = legacy["new"] / legacy["old"]
        legacy["raw_ratio"] = round(raw, 3)
        legacy["normalized_ratio"] = round(
            raw / env_ratio if env_ratio else raw, 3
        )
    return {
        "old_total": a.get("value"),
        "new_total": b.get("value"),
        "legacy_subtotal": legacy,
        "env_ratio": round(env_ratio, 4) if env_ratio else None,
        "sentinels": {"old": sa, "new": sb},
        "threshold": threshold,
        "queries": per_query,
        "regressions": regressions,
        "added": sorted(set(qb) - set(qa)),
        "removed": sorted(set(qa) - set(qb)),
        "note": (
            "normalized by CPU sentinel ratio"
            if env_ratio
            else "NO sentinel in one artifact — raw ratios only, treat"
            " flags as environment-confounded"
        ),
    }


def main(argv: list[str]) -> int:
    args = [x for x in argv if not x.startswith("--")]
    if len(args) != 2:
        print(__doc__.strip().splitlines()[-2].strip(), file=sys.stderr)
        return 2
    threshold = 1.3
    for x in argv:
        if x.startswith("--threshold="):
            threshold = float(x.split("=", 1)[1])
    try:
        a, b = _load(args[0]), _load(args[1])
    except (OSError, json.JSONDecodeError) as exc:
        print(f"unreadable artifact: {exc}", file=sys.stderr)
        return 2
    out = compare(a, b, threshold)
    if not out["queries"]:
        print("no overlapping queries between artifacts", file=sys.stderr)
        return 2
    print(json.dumps(out))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
