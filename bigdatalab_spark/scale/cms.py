"""Portable Count-Min sketch (counters-as-data).

Companion to the portable Bloom filter (scale/dedup.py
``build_portable_bloom``): the sketch is plain data plus column
arithmetic instead of a JVM object behind a py4j handle
(operators/sketches.py keeps that bridge for serialization parity with
the lab's ``stat.countMinSketch``, 304-streaming/spark/README.md:236-243).

Build is one distributed explode + count aggregate — the partial
aggregate combines map-side, so the shuffle carries at most
depth x width counter partials per partition, and only the
depth x width counter table (a few KB) reaches the driver. The probe
is a pure column expression (``least`` over ``element_at`` lookups
against the counter table embedded as a literal array), so estimates
run in-plan over data-sized probe sets — no driver-side loop, and the
whole thing stays inside whole-stage codegen.

Geometry follows the classic CMS sizing for the lab's knobs: width =
ceil(e / eps), depth = ceil(ln(1 / (1 - confidence))) — eps=0.01,
confidence=0.99 gives the 272 x 5 table the lab exercises. The seed
selects the offset into the pinned universal-hash family
(scale/hashing.py), so builds are deterministic and replayable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatalab_spark.scale.hashing import MINHASH_COEFFS, MINHASH_P, portable_hash


def cms_dims(eps: float, confidence: float) -> tuple[int, int]:
    """(depth, width) for the standard CMS error contract:
    estimate <= true + eps * N with probability >= confidence."""
    width = math.ceil(math.e / eps)
    depth = math.ceil(math.log(1.0 / (1.0 - confidence)))
    return depth, width


def _cms_positions(
    hash_col: Column, depth: int, width: int, seed: int
) -> list[Column]:
    """One column position per sketch row: ((a_d*H + b_d) mod P) mod w."""
    coeffs = [
        MINHASH_COEFFS[(seed + d) % len(MINHASH_COEFFS)] for d in range(depth)
    ]
    return [
        ((hash_col * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)) % F.lit(width)
        for a, b in coeffs
    ]


def build_portable_cms(
    values: DataFrame,
    value_col: str,
    eps: float,
    confidence: float,
    seed: int = 0,
) -> list[int]:
    """Distributed CMS build over a string column -> flat counter table
    (row-major, ``depth * width`` longs). Each input row increments one
    counter per sketch row; the groupBy partial-aggregates map-side."""
    depth, width = cms_dims(eps, confidence)
    rows = (
        values.select(portable_hash(F.col(value_col)).alias("h"))
        .filter(F.col("h").isNotNull())
        .select(
            F.posexplode(
                F.array(*_cms_positions(F.col("h"), depth, width, seed))
            ).alias("d", "p")
        )
        .groupBy("d", "p")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counters = [0] * (depth * width)
    for r in rows:
        counters[r["d"] * width + r["p"]] = r["c"]
    return counters


def cms_estimate(
    value_col: Column | str,
    counters: list[int],
    eps: float,
    confidence: float,
    seed: int = 0,
) -> Column:
    """Frequency estimate as a pure column expression: min over the
    sketch rows of the probed counter. Never underestimates (every
    occurrence of the key incremented every probed counter); collisions
    only ever inflate, and the min over ``depth`` independent rows
    bounds the inflation by the CMS contract."""
    depth, width = cms_dims(eps, confidence)
    if len(counters) != depth * width:
        raise ValueError(
            f"counter table has {len(counters)} entries, expected "
            f"{depth}x{width} for eps={eps}, confidence={confidence}"
        )
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    h = portable_hash(c)
    arr = F.array(*[F.lit(int(x)) for x in counters])
    probes = [
        F.element_at(arr, (F.lit(d * width) + pos).cast("int") + 1)
        for d, pos in enumerate(_cms_positions(h, depth, width, seed))
    ]
    return F.least(*probes) if len(probes) > 1 else probes[0]
