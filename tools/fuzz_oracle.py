"""Randomized differential testing: Spark SQL vs DuckDB on one query text.

The engine's curated oracles are strong but hand-picked; this tool closes
the "what about the queries nobody wrote?" gap with a seeded grammar
over the fixture schemas. Each seed deterministically generates ONE
query in the common SQL subset both engines parse identically —
projections, arithmetic, string functions, filters, joins along real
FK edges, grouped aggregates, row_number windows, whole-partition
window aggregates, lag/lead under a total order, DISTINCT over derived
expressions, (NOT) IN subqueries along FK edges, order-by-key limits
— and runs the SAME text through Spark SQL and DuckDB, comparing with
the driver-strict machinery from tools.oracle_check (exact value
rendering, no float tolerance). The reference's own lesson is
plan-equivalence across surfaces (303-spark-sql/README.md:125-129);
this extends it to generated plans.

Dialect discipline baked into the grammar (each a measured divergence
if violated):
- SUM over integers is wrapped CAST(... AS BIGINT) — DuckDB sums to
  HUGEINT (pandas object/float), Spark to LONG;
- SUM/AVG over doubles is never generated — floating accumulation
  order differs between engines, so equality is not defined;
- ROUND is never generated (half-even vs half-away); FLOOR is value-
  safe but type-divergent — Spark floor() returns BIGINT, DuckDB
  DOUBLE — so a projected floor is canonicalized CAST(floor(x) AS
  BIGINT) (found by this tool's first 300-seed run: seeds 43, 72,
  127, 185, 259, 269 all failed on exactly this dtype-kind mismatch);
- LIMIT only ever appears under an ORDER BY covering EVERY projected
  column, so boundary ties are interchangeable rows and the kept
  multiset is well-defined in both engines (the declared key alone is
  NOT enough: the fixture's lineitem composite key is non-unique);
- lag/lead sources are pure functions of the ORDER-BY key — seeds
  5156/5214 of the 5000-range campaign caught lead(l_suppkey) flipping
  between tie orders on lineitem's duplicate (orderkey, linenumber)
  pairs; with a key-function source any tie resolution yields the same
  row multiset;
- timestamp columns are excluded from the column pool (pandas dtype
  normalization differs); numeric + varchar only;
- ROLLUP on an EMPTY input diverges: DuckDB (like Postgres and the
  standard's GROUP BY ()) emits the grand-total row with cnt=0, Spark
  emits nothing — found by seed 116 of the first widened-grammar run;
  canonicalized with a no-op-on-nonempty HAVING count(*) > 0.

Usage: python -m tools.fuzz_oracle [sf_dir] [--seeds=25] [--start=0]
Output: per-seed [OK]/[FAIL] lines + one JSON summary line.
Exit 1 on any mismatch — every discrepancy is either an engine bug, a
generator dialect bug, or a canonicalization to document.
"""

from __future__ import annotations

import json
import random
import sys

#: column pools per table: (ints, doubles, strings, primary key)
SCHEMAS: dict[str, dict] = {
    "region": {"i": ["r_regionkey"], "d": [], "s": ["r_name"], "pk": "r_regionkey"},
    "nation": {
        "i": ["n_nationkey", "n_regionkey"],
        "d": [],
        "s": ["n_name"],
        "pk": "n_nationkey",
    },
    "customer": {
        "i": ["c_custkey", "c_nationkey"],
        "d": ["c_acctbal"],
        "s": ["c_name", "c_mktsegment"],
        "pk": "c_custkey",
    },
    "orders": {
        "i": ["o_orderkey", "o_custkey"],
        "d": ["o_totalprice"],
        "s": ["o_orderstatus", "o_orderpriority"],
        "pk": "o_orderkey",
    },
    "lineitem": {
        "i": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "d": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "s": ["l_returnflag", "l_linestatus"],
        "pk": "l_orderkey",  # not unique — LIMIT shapes use a composite
        "pk2": "l_linenumber",
    },
    "part": {
        "i": ["p_partkey", "p_size"],
        "d": ["p_retailprice"],
        "s": ["p_name", "p_brand", "p_type"],
        "pk": "p_partkey",
    },
    "supplier": {
        "i": ["s_suppkey", "s_nationkey"],
        "d": ["s_acctbal"],
        "s": ["s_name"],
        "pk": "s_suppkey",
    },
    "events": {
        "i": ["event_id", "user_id"],
        "d": ["value"],
        "s": ["event_type"],
        "pk": "event_id",
    },
}

#: FK join edges: (left table, left col, right table, right col)
JOINS = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _int_expr(rng: random.Random, col: str) -> str:
    return rng.choice(
        [
            col,
            f"{col} + {rng.randint(1, 9)}",
            f"{col} * {rng.randint(2, 5)}",
            f"{col} % {rng.randint(2, 13)}",
            f"({col} + {rng.randint(1, 5)}) % {rng.randint(3, 11)}",
        ]
    )


def _str_expr(rng: random.Random, col: str) -> str:
    return rng.choice(
        [
            col,
            f"upper({col})",
            f"lower({col})",
            f"substr({col}, 1, {rng.randint(1, 4)})",
            f"length({col})",
            f"upper(substr({col}, {rng.randint(1, 2)}, 3))",
        ]
    )


def _dbl_expr(rng: random.Random, col: str) -> str:
    # per-row arithmetic only — never accumulated (order-dependent)
    return rng.choice(
        [
            col,
            f"{col} * 2",
            f"{col} + {col}",
            f"CAST(floor({col}) AS BIGINT)",  # see dialect note on floor
            f"{col} - floor({col})",
        ]
    )


def _predicate(rng: random.Random, sch: dict) -> str:
    cands = []
    if sch["i"]:
        c = rng.choice(sch["i"])
        cands += [
            f"{c} % {rng.randint(2, 7)} = {rng.randint(0, 1)}",
            f"{c} > {rng.randint(0, 50)}",
            f"{c} <= {rng.randint(10, 500)}",
        ]
    if sch["s"]:
        c = rng.choice(sch["s"])
        cands += [
            f"length({c}) > {rng.randint(3, 8)}",
            f"upper({c}) LIKE '%{rng.choice('AEIORST')}%'",
            f"substr({c}, 1, 1) >= '{rng.choice('ABCFMPa')}'",
        ]
    if sch["d"]:
        c = rng.choice(sch["d"])
        cands += [f"{c} > {rng.randint(0, 100)}", f"floor({c}) % 2 = 0"]
    p = rng.choice(cands)
    if rng.random() < 0.3:
        q = rng.choice([x for x in cands if x != p] or [p])
        p = f"({p}) {rng.choice(['AND', 'OR'])} ({q})"
    return p


def _aggs(rng: random.Random, sch: dict) -> list[str]:
    out = ["CAST(count(*) AS BIGINT) AS cnt"]
    if sch["i"]:
        c = rng.choice(sch["i"])
        out.append(
            rng.choice(
                [
                    f"CAST(sum({c}) AS BIGINT) AS sum_i",
                    f"min({c}) AS min_i",
                    f"max({c}) AS max_i",
                    f"avg({c} % 97) AS avg_i",  # exact int sum / count
                    # exact distinct count; CAST for the HUGEINT leak
                    f"CAST(count(DISTINCT {c} % 53) AS BIGINT) AS cd_i",
                ]
            )
        )
    if sch["s"]:
        c = rng.choice(sch["s"])
        out.append(rng.choice([f"min({c}) AS min_s", f"max({c}) AS max_s"]))
    if sch["d"] and rng.random() < 0.7:
        c = rng.choice(sch["d"])
        out.append(rng.choice([f"min({c}) AS min_d", f"max({c}) AS max_d"]))
    return out


def generate_query(seed: int) -> str:
    """Deterministic seed -> one dialect-neutral SQL text."""
    rng = random.Random(seed)
    shape = rng.choice(
        ["scan", "agg", "join", "join_agg", "window", "limit", "case",
         "having", "union", "window_agg", "lag_lead", "distinct",
         "in_subquery", "outer_join", "exists", "setop",
         "scalar_subquery", "rollup", "cte_chain", "derived_join",
         "rank_ties", "running_frame", "range_frame", "grouping_sets"]
    )
    t = rng.choice(sorted(SCHEMAS))
    sch = SCHEMAS[t]

    if shape == "scan":
        proj = [f"{sch['pk']} AS pk"]
        if sch["i"]:
            proj.append(f"{_int_expr(rng, rng.choice(sch['i']))} AS e_i")
        if sch["s"]:
            proj.append(f"{_str_expr(rng, rng.choice(sch['s']))} AS e_s")
        if sch["d"] and rng.random() < 0.6:
            proj.append(f"{_dbl_expr(rng, rng.choice(sch['d']))} AS e_d")
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        return f"SELECT {', '.join(proj)} FROM {t} WHERE {_predicate(rng, sch)}"

    if shape == "agg":
        keys = []
        if sch["s"]:
            keys.append(rng.choice(sch["s"]))
        if sch["i"] and (not keys or rng.random() < 0.5):
            keys.append(f"{rng.choice(sch['i'])} % {rng.randint(2, 9)}")
        sel = [f"{k} AS g{j}" for j, k in enumerate(keys)] + _aggs(rng, sch)
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.6 else ""
        return (
            f"SELECT {', '.join(sel)} FROM {t}{where} "
            f"GROUP BY {', '.join(f'g{j}' for j in range(len(keys)))}"
        )

    if shape in ("join", "join_agg"):
        lt, lc, rt, rc = rng.choice(JOINS)
        ls, rs = SCHEMAS[lt], SCHEMAS[rt]
        on = f"{lt}.{lc} = {rt}.{rc}"
        if shape == "join":
            proj = [f"{lt}.{ls['pk']} AS lpk", f"{rt}.{rs['pk']} AS rpk"]
            if ls["s"]:
                proj.append(f"{_str_expr(rng, lt + '.' + rng.choice(ls['s']))} AS e_ls")
            if rs["s"]:
                proj.append(f"{_str_expr(rng, rt + '.' + rng.choice(rs['s']))} AS e_rs")
            if "pk2" in ls:
                proj.append(f"{lt}.{ls['pk2']} AS lpk2")
            where = (
                f" AND {lt}.{ls['pk']} % {rng.randint(2, 5)} = 0"
                if rng.random() < 0.5
                else ""
            )
            return (
                f"SELECT {', '.join(proj)} FROM {lt} JOIN {rt} ON {on}{where}"
            )
        key = (
            f"{rt}.{rng.choice(rs['s'])}" if rs["s"] else f"{rt}.{rs['pk']} % 3"
        )
        aggs = ["CAST(count(*) AS BIGINT) AS cnt"]
        if ls["i"]:
            aggs.append(
                f"CAST(sum({lt}.{rng.choice(ls['i'])} % 89) AS BIGINT) AS sum_i"
            )
        if ls["s"]:
            aggs.append(f"max({lt}.{rng.choice(ls['s'])}) AS max_s")
        return (
            f"SELECT {key} AS g0, {', '.join(aggs)} "
            f"FROM {lt} JOIN {rt} ON {on} GROUP BY g0"
        )

    if shape == "window":
        # rank within a low-cardinality partition, ordered by the unique
        # key so ties are impossible and the rank is well-defined
        part = (
            rng.choice(sch["s"])
            if sch["s"]
            else f"{sch['pk']} % {rng.randint(2, 5)}"
        )
        order = sch["pk"] if "pk2" not in sch else f"{sch['pk']}, {sch['pk2']}"
        return (
            f"SELECT {sch['pk']} AS pk, {part} AS g, "
            f"row_number() OVER (PARTITION BY {part} ORDER BY {order}) AS rn "
            f"FROM {t} WHERE {_predicate(rng, sch)}"
        )

    if shape == "window_agg":
        # whole-partition frames only: with no ORDER BY inside the
        # OVER, the frame is the entire partition, so the result is
        # order-independent in both engines; integer modular sums keep
        # the accumulation exact (same discipline as _aggs)
        part = (
            rng.choice(sch["s"])
            if sch["s"]
            else f"{sch['pk']} % {rng.randint(2, 5)}"
        )
        ic = rng.choice(sch["i"])
        proj = [
            f"{sch['pk']} AS pk",
            f"{part} AS g",
            f"CAST(count(*) OVER (PARTITION BY {part}) AS BIGINT) AS w_cnt",
            f"CAST(sum({ic} % 97) OVER (PARTITION BY {part}) AS BIGINT) AS w_sum",
            f"min({ic}) OVER (PARTITION BY {part}) AS w_min",
        ]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return f"SELECT {', '.join(proj)} FROM {t}{where}"

    if shape == "lag_lead":
        # offset functions: the led/lagged VALUE must be a pure function
        # of the ORDER-BY key. The fixture's lineitem is TPC-H-ISH —
        # (l_orderkey, l_linenumber) is NOT unique (seeds 5156/5214 of
        # the 5000-range campaign caught lead(l_suppkey) flipping under
        # tie reorders) — but with a key-function source, tied rows are
        # identical in every projected column, so any tie resolution
        # yields the same row MULTISET and the sorted compare is exact.
        part = (
            rng.choice(sch["s"])
            if sch["s"]
            else f"{sch['pk']} % {rng.randint(2, 5)}"
        )
        order = sch["pk"] if "pk2" not in sch else f"{sch['pk']}, {sch['pk2']}"
        key_fn = (
            f"{sch['pk']} % {rng.randint(7, 97)}"
            if "pk2" not in sch
            else f"({sch['pk']} * 8 + {sch['pk2']}) % {rng.randint(7, 97)}"
        )
        fn = rng.choice(["lag", "lead"])
        proj = [
            f"{sch['pk']} AS pk",
            f"{fn}({key_fn}, {rng.randint(1, 2)}) "
            f"OVER (PARTITION BY {part} ORDER BY {order}) AS w_off",
        ]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        return f"SELECT {', '.join(proj)} FROM {t} WHERE {_predicate(rng, sch)}"

    if shape == "distinct":
        # DISTINCT over derived expressions — the deduped set is
        # well-defined; no floats (distinct on doubles is exact-equality
        # on both sides, but keep the pools int/string for clarity)
        proj = [f"{_int_expr(rng, rng.choice(sch['i']))} AS e_i"]
        if sch["s"]:
            proj.append(f"{_str_expr(rng, rng.choice(sch['s']))} AS e_s")
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return f"SELECT DISTINCT {', '.join(proj)} FROM {t}{where}"

    if shape == "in_subquery":
        # semi-join shape: outer rows filtered by an IN over a real FK
        # edge (possibly further predicated) — exercises both engines'
        # subquery decorrelation
        lt, lc, rt, rc = rng.choice(JOINS)
        ls, rs = SCHEMAS[lt], SCHEMAS[rt]
        proj = [f"{ls['pk']} AS pk"]
        if "pk2" in ls:
            proj.append(f"{ls['pk2']} AS pk2")
        if ls["s"]:
            proj.append(f"{_str_expr(rng, rng.choice(ls['s']))} AS e_s")
        inner_where = (
            f" WHERE {_predicate(rng, rs)}" if rng.random() < 0.6 else ""
        )
        neg = "NOT " if rng.random() < 0.3 else ""
        return (
            f"SELECT {', '.join(proj)} FROM {lt} "
            f"WHERE {lc} {neg}IN (SELECT {rc} FROM {rt}{inner_where})"
        )

    if shape == "outer_join":
        # LEFT JOIN along a REVERSED FK edge (dim LEFT JOIN fact), with
        # the fact-side predicate inside ON — the null-extension
        # semantics both engines must agree on: a dim row with no
        # surviving fact rows keeps exactly one output row of NULLs
        lt, lc, rt, rc = rng.choice(JOINS)
        ls, rs = SCHEMAS[lt], SCHEMAS[rt]
        on = f"{rt}.{rc} = {lt}.{lc}"
        if rng.random() < 0.7:
            on += f" AND {lt}.{ls['pk']} % {rng.randint(2, 6)} = 0"
        proj = [
            f"{rt}.{rs['pk']} AS rpk",
            f"{lt}.{ls['pk']} AS lpk",  # NULL where the ON never matched
        ]
        if ls["s"]:
            proj.append(f"upper({lt}.{rng.choice(ls['s'])}) AS e_ls")
        if "pk2" in ls:
            proj.append(f"{lt}.{ls['pk2']} AS lpk2")
        return f"SELECT {', '.join(proj)} FROM {rt} LEFT JOIN {lt} ON {on}"

    if shape == "exists":
        # correlated (NOT) EXISTS along a real FK edge — the other
        # decorrelation surface beside IN; the inner predicate makes
        # the semi/anti split non-trivial
        lt, lc, rt, rc = rng.choice(JOINS)
        ls, rs = SCHEMAS[lt], SCHEMAS[rt]
        proj = [f"{ls['pk']} AS pk"]
        if "pk2" in ls:
            proj.append(f"{ls['pk2']} AS pk2")
        if ls["s"]:
            proj.append(f"{_str_expr(rng, rng.choice(ls['s']))} AS e_s")
        inner_pred = (
            f" AND {_predicate(rng, rs)}" if rng.random() < 0.6 else ""
        )
        neg = "NOT " if rng.random() < 0.4 else ""
        return (
            f"SELECT {', '.join(proj)} FROM {lt} WHERE {neg}EXISTS ("
            f"SELECT 1 FROM {rt} WHERE {rt}.{rc} = {lt}.{lc}{inner_pred})"
        )

    if shape == "setop":
        # INTERSECT / EXCEPT over derived int/string projections of the
        # same table under two predicates — both engines default to
        # DISTINCT set semantics, so the result is a well-defined set
        proj = [f"{_int_expr(rng, rng.choice(sch['i']))} AS e_i"]
        if sch["s"]:
            proj.append(f"{_str_expr(rng, rng.choice(sch['s']))} AS e_s")
        op = rng.choice(["INTERSECT", "EXCEPT"])
        p1, p2 = _predicate(rng, sch), _predicate(rng, sch)
        sel = f"SELECT {', '.join(proj)} FROM {t}"
        return f"{sel} WHERE {p1} {op} {sel} WHERE {p2}"

    if shape == "scalar_subquery":
        # uncorrelated scalar subquery as a comparison bound —
        # min/max over ints only (exact in both engines)
        ic = rng.choice(sch["i"])
        st = rng.choice(sorted(SCHEMAS))
        ss = SCHEMAS[st]
        sc = rng.choice(ss["i"])
        fn = rng.choice(["min", "max"])
        inner_where = (
            f" WHERE {_predicate(rng, ss)}" if rng.random() < 0.5 else ""
        )
        proj = [f"{sch['pk']} AS pk"]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        # % bounds the scalar so the outer predicate stays selective
        return (
            f"SELECT {', '.join(proj)} FROM {t} WHERE {ic} > "
            f"(SELECT {fn}({sc}) % 53 FROM {st}{inner_where})"
        )

    if shape == "rollup":
        # ROLLUP over two low-cardinality keys: subtotal rows carry
        # grouping NULLs — the rendering and the set of rows must match
        # across engines; counts and int min/max only (exact).
        # HAVING count(*) > 0 canonicalizes a measured divergence
        # (found by seed 116 of this tool's first widened run): on an
        # EMPTY input, DuckDB — like Postgres and the standard's
        # GROUP BY () — still emits the grand-total row (cnt=0), Spark
        # emits nothing, even though Spark's own global aggregate on
        # the same empty input emits one row. On non-empty inputs every
        # rollup row has cnt >= 1, so the HAVING is a no-op.
        k1 = rng.choice(sch["s"]) if sch["s"] else f"{sch['pk']} % 5"
        k2 = f"{rng.choice(sch['i'])} % {rng.randint(2, 4)}"
        ic = rng.choice(sch["i"])
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return (
            f"SELECT {k1} AS g0, {k2} AS g1, "
            f"CAST(count(*) AS BIGINT) AS cnt, min({ic}) AS min_i "
            f"FROM {t}{where} GROUP BY ROLLUP (g0, g1) "
            f"HAVING count(*) > 0"
        )

    if shape == "running_frame":
        # cumulative ROWS frame over the declared order. The summed
        # expression is a PURE FUNCTION OF THE ORDER KEY (the lag_lead
        # discipline): tied rows then contribute equal amounts, so the
        # tie group's running sums form the same value multiset under
        # any tie resolution, and every projected column is the key
        # itself — the whole-row multiset is deterministic.
        order = sch["pk"] if "pk2" not in sch else f"{sch['pk']}, {sch['pk2']}"
        contrib = (
            f"({sch['pk']} % 97)"
            if "pk2" not in sch
            else f"(({sch['pk']} * 7 + {sch['pk2']}) % 97)"
        )
        proj = [f"{sch['pk']} AS pk"]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        proj.append(
            f"CAST(sum({contrib}) OVER (ORDER BY {order} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"AS BIGINT) AS run_sum"
        )
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return f"SELECT {', '.join(proj)} FROM {t}{where}"

    if shape == "range_frame":
        # value-based RANGE frame over an integer order column: frame
        # membership is defined by VALUE distance, so all peers of a
        # tie are in every frame that reaches them — the result is
        # order-independent by construction for any summed column
        # (kept integer-modular for exactness anyway).
        oc = rng.choice(sch["i"])
        ic = rng.choice(sch["i"])
        k = rng.randint(2, 50)
        proj = [f"{sch['pk']} AS pk", f"{oc} AS oc"]
        if "pk2" in sch:
            proj.insert(1, f"{sch['pk2']} AS pk2")
        proj.append(
            f"CAST(sum({ic} % 89) OVER (ORDER BY {oc} "
            f"RANGE BETWEEN {k} PRECEDING AND CURRENT ROW) "
            f"AS BIGINT) AS rng_sum"
        )
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return f"SELECT {', '.join(proj)} FROM {t}{where}"

    if shape == "grouping_sets":
        # explicit GROUPING SETS with grouping() disambiguation flags;
        # the empty set () is deliberately excluded — the rollup shape
        # documents the empty-input grand-total divergence it would
        # reintroduce. Raw expressions are repeated (not aliases) so
        # grouping(expr) resolves identically in both engines.
        k1 = rng.choice(sch["s"]) if sch["s"] else f"{sch['pk']} % 5"
        k2 = f"{rng.choice(sch['i'])} % {rng.randint(2, 4)}"
        ic = rng.choice(sch["i"])
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return (
            f"SELECT {k1} AS g0, {k2} AS g1, "
            f"CAST(grouping({k1}) AS BIGINT) AS gf0, "
            f"CAST(grouping({k2}) AS BIGINT) AS gf1, "
            f"CAST(count(*) AS BIGINT) AS cnt, min({ic}) AS min_i "
            f"FROM {t}{where} "
            f"GROUP BY GROUPING SETS (({k1}), ({k2}), ({k1}, {k2}))"
        )

    if shape == "cte_chain":
        # two chained CTEs: filter/derive -> aggregate -> final filter;
        # the multi-stage pipeline shape every curated query composes,
        # here with generated stages. All-int aggregates, exact.
        ic = rng.choice(sch["i"])
        key = rng.choice(sch["s"]) if sch["s"] else f"{sch['pk']} % 6"
        return (
            f"WITH base AS ("
            f"SELECT {key} AS g0, {ic} % 97 AS v FROM {t} "
            f"WHERE {_predicate(rng, sch)}"
            f"), rolled AS ("
            f"SELECT g0, CAST(count(*) AS BIGINT) AS cnt, "
            f"CAST(sum(v) AS BIGINT) AS sum_v, min(v) AS min_v "
            f"FROM base GROUP BY g0"
            f") SELECT g0, cnt, sum_v, min_v FROM rolled "
            f"WHERE cnt > {rng.randint(0, 5)}"
        )

    if shape == "derived_join":
        # dim JOIN (pre-aggregated fact subquery) — the manual pre-agg
        # optimization (302's lesson) as a generated shape: the derived
        # table collapses the fact side before the join
        lt, lc, rt, rc = rng.choice(JOINS)
        ls, rs = SCHEMAS[lt], SCHEMAS[rt]
        ic = rng.choice(ls["i"])
        inner_where = (
            f" WHERE {_predicate(rng, ls)}" if rng.random() < 0.5 else ""
        )
        proj = [f"{rt}.{rs['pk']} AS rpk", "f.cnt AS cnt", "f.sum_i AS sum_i"]
        if rs["s"]:
            proj.append(f"upper({rt}.{rng.choice(rs['s'])}) AS e_rs")
        return (
            f"SELECT {', '.join(proj)} FROM {rt} JOIN ("
            f"SELECT {lc} AS k, CAST(count(*) AS BIGINT) AS cnt, "
            f"CAST(sum({ic} % 89) AS BIGINT) AS sum_i "
            f"FROM {lt}{inner_where} GROUP BY {lc}"
            f") f ON f.k = {rt}.{rc}"
        )

    if shape == "rank_ties":
        # rank/dense_rank ordered by a DERIVED, deliberately tie-heavy
        # expression: unlike row_number, the rank VALUE is a pure
        # function of the order key, so ties are well-defined across
        # engines — this is exactly what row_number shapes must avoid
        # and rank shapes may embrace
        part = (
            rng.choice(sch["s"])
            if sch["s"]
            else f"{sch['pk']} % {rng.randint(2, 5)}"
        )
        ic = rng.choice(sch["i"])
        fn = rng.choice(["rank", "dense_rank"])
        proj = [
            f"{sch['pk']} AS pk",
            f"{fn}() OVER (PARTITION BY {part} "
            f"ORDER BY {ic} % {rng.randint(2, 7)}) AS rk",
        ]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return f"SELECT {', '.join(proj)} FROM {t}{where}"

    if shape == "case":
        ic = rng.choice(sch["i"]) if sch["i"] else f"length({rng.choice(sch['s'])})"
        arms = rng.randint(1, 3)
        case = "CASE"
        lo = 0
        for _ in range(arms):
            lo += rng.randint(2, 20)
            case += f" WHEN {ic} < {lo} THEN '{rng.choice('abcde')}{lo}'"
        case += " ELSE 'zz' END"
        proj = [f"{sch['pk']} AS pk", f"{case} AS cat"]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        where = f" WHERE {_predicate(rng, sch)}" if rng.random() < 0.5 else ""
        return f"SELECT {', '.join(proj)} FROM {t}{where}"

    if shape == "having":
        key = rng.choice(sch["s"]) if sch["s"] else f"{sch['pk']} % 7"
        # HAVING spelled with the full aggregate (alias reference in
        # HAVING is a dialect extension neither engine needs here)
        return (
            f"SELECT {key} AS g0, CAST(count(*) AS BIGINT) AS cnt "
            f"FROM {t} GROUP BY g0 HAVING count(*) > {rng.randint(1, 20)}"
        )

    if shape == "union":
        proj = [f"{sch['pk']} AS pk"]
        if "pk2" in sch:
            proj.append(f"{sch['pk2']} AS pk2")
        if sch["s"]:
            proj.append(f"{_str_expr(rng, rng.choice(sch['s']))} AS e_s")
        p1, p2 = _predicate(rng, sch), _predicate(rng, sch)
        sel = f"SELECT {', '.join(proj)} FROM {t}"
        return f"{sel} WHERE {p1} UNION ALL {sel} WHERE {p2}"

    # limit: the kept prefix is well-defined iff the ORDER BY covers
    # EVERY projected column — rows tied on all of them are
    # interchangeable at the boundary (same multiset either way). An
    # order on the declared key alone is not enough: lineitem's
    # composite key is non-unique in the fixture (see lag_lead note).
    proj = [f"{sch['pk']} AS pk"]
    order_cols = ["pk"]
    if "pk2" in sch:
        proj.append(f"{sch['pk2']} AS pk2")
        order_cols.append("pk2")
    if sch["s"]:
        proj.append(f"{_str_expr(rng, rng.choice(sch['s']))} AS e_s")
        order_cols.append("e_s")
    return (
        f"SELECT {', '.join(proj)} FROM {t} "
        f"ORDER BY {', '.join(order_cols)} LIMIT {rng.randint(1, 40)}"
    )


def run_seed(spark, con, seed: int, sf_dir: str) -> tuple[str, list[str]]:
    from tools.oracle_check import compare_frames

    q = generate_query(seed)
    sdf = spark.sql(q).toPandas()
    ddf = con.execute(q).fetchdf()
    return q, compare_frames(sdf, ddf)


def main() -> int:
    from bigdatalab_spark.session import get_session
    from bigdatalab_spark.sources.readers import TABLES
    from tools.oracle_check import duckdb_connection

    argv = list(sys.argv[1:])
    seeds, start = 25, 0
    pos = []
    for a in argv:
        if a.startswith("--seeds="):
            seeds = int(a.split("=", 1)[1])
        elif a.startswith("--start="):
            start = int(a.split("=", 1)[1])
        else:
            pos.append(a)
    sf_dir = pos[0] if pos else "/root/testdata/sf0.01"

    spark = get_session(app_name="fuzz-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    con = duckdb_connection(sf_dir)

    failures = []
    for seed in range(start, start + seeds):
        try:
            q, problems = run_seed(spark, con, seed, sf_dir)
        except Exception as exc:  # noqa: BLE001 — a parse divergence IS a finding
            q, problems = generate_query(seed), [f"exception: {exc}"]
        status = "OK " if not problems else "FAIL"
        print(f"[{status}] seed={seed}")
        if problems:
            print(f"       {q}")
            for p in problems[:4]:
                print(f"       {p}")
            failures.append(seed)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "seeds": list(range(start, start + seeds)),
                "n_pass": seeds - len(failures),
                "n_fail": len(failures),
                "failed_seeds": failures,
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
