"""Heavy hitters under a Zipf key at scale: exact MG+recount vs CMS.

`heavy_hitter_words` is gate-proven on a 31-word vocabulary; this tool
runs the exact heavy-hitter operator on a PLANTED Zipf token stream at
replica scale and records the two numbers its 100 TB contract makes:

- the CANDIDATE-SET size (must stay <= k * input partitions — KB-sized
  however big the stream; the pytest asserts the bound, this tool
  reports the measured value at scale);
- wall time vs the Count-Min estimate path over the same stream (the
  one-pass approximate alternative a pipeline would otherwise reach
  for).

The stream is events-table-sized: one token per event row, drawn
Zipf-ish by mapping the (deterministic) event_id through the harmonic
cumulative — rank r gets ~1/r of the mass, the canonical skewed-token
shape. The same construction at every scale factor means the decades
are comparable.

Usage: python -m tools.hh_bench [sf_dir] [k]
Output: one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    from pyspark.sql import functions as F

    from bigdatalab_spark.scale.heavyhitters import (
        exact_heavy_hitters,
        mg_candidates,
    )
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_session(app_name="hh-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    # Deterministic Zipf(s=2): u = uniform hash in (0,1], rank = int(1/u)
    # -> P(rank=r) = 1/r - 1/(r+1) ~ 1/r^2. Head token carries ~50% of
    # the mass; the vocabulary spans ~10^6 ranks, so the candidate pass
    # sees real tail churn (each prune cycles tail tokens through the
    # k counters), not a toy vocabulary.
    toks = ev.select(
        F.concat(
            F.lit("tok_"),
            (
                F.lit(1000000.0)
                / (F.pmod(F.xxhash64("event_id"), F.lit(1000000)).cast("double") + 1.0)
            ).cast("long"),
        ).alias("word")
    )
    n = toks.count()
    parts = toks.rdd.getNumPartitions()

    t0 = time.perf_counter()
    n_cand = mg_candidates(toks, "word", k).count()
    cand_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    hh = exact_heavy_hitters(toks, "word", k).collect()
    exact_sec = time.perf_counter() - t0

    # CMS estimate path over the same stream: build the portable sketch
    # and probe the distinct tokens (the one-pass approximate alternative)
    from bigdatalab_spark.scale.cms import build_portable_cms, cms_estimate

    eps, conf = 0.01, 0.95
    t0 = time.perf_counter()
    counters = build_portable_cms(toks, "word", eps, conf)
    probed = (
        toks.select("word")
        .distinct()
        .select("word", cms_estimate("word", counters, eps, conf).alias("est"))
        .collect()
    )
    cms_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_tokens": n,
                "partitions": parts,
                "k": k,
                "k_times_tasks_bound": k * parts,
                "n_candidates": n_cand,
                "n_heavy": len(hh),
                "candidates_sec": round(cand_sec, 3),
                "exact_total_sec": round(exact_sec, 3),
                "cms_total_sec": round(cms_sec, 3),
                "n_probed": len(probed),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
