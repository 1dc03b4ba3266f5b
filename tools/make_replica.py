"""Build a scaled replica of a testdata sf directory for scale decades.

The scale experiments (SCALE_NOTES.md) replicate sf0.1 by a factor F
into a scratch dir and re-run the benches; this tool pins that recipe
so every decade run is reproducible:

- dims (region/nation/customer/supplier/part) copy unchanged — at any
  real scale the dimension tables stay broadcast-sized.
- orders/lineitem replicate with orderkeys shifted by a per-replica
  span (joins stay key-correct; custkeys/partkeys/suppkeys unchanged,
  so each customer/part/supplier gains F x the facts — the realistic
  shape: facts grow, dims don't).
- events replicate with shifted event_ids and a per-replica timestamp
  jitter inside the hour, so replicas land in (and fill) the same
  window population rather than creating empty decades of time.
- documents replicate in NEAR-DUP FAMILIES OF 10: a family shares a
  marker token inserted every 4 words (so families are far apart in
  shingle space — insertion breaks every 4-gram) and members differ by
  one trailing token (so within a family every pair is a genuine
  near-dup). Duplication DENSITY thus stays constant as the corpus
  grows — pair output scales linearly with corpus size, not
  quadratically in F, which is how organic duplication behaves. (The
  x10 runs replicated every doc into ONE family — the worst case; at
  x100 that recipe would plant C(100,2)=4950 true pairs per base doc
  and measure output explosion, not engine scaling.)
- embeddings replicate with shifted vec_ids and a small deterministic
  per-replica offset so copies are distinct-but-close vectors.

Single parquet FILE per table (not a directory): the streaming source's
pathGlobFilter contract expects the testdata layout (SCALE_NOTES
round-4 gotcha).

Usage: python -m tools.make_replica <src_sf_dir> <dst_dir> <factor>
"""

from __future__ import annotations

import os
import sys

COPY_TABLES = ("region", "nation", "customer", "supplier", "part")


def build(src: str, dst: str, factor: int, doc_markers: str = "shared",
          only: tuple[str, ...] | None = None) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(os.cpu_count() - 2, 1)}")

    def src_tbl(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def copy(sql: str, name: str) -> None:
        if only is not None and name not in only:
            return
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in COPY_TABLES:
        copy(f"SELECT * FROM {src_tbl(t)}", t)

    ospan = con.sql(
        f"SELECT max(o_orderkey) + 1 FROM {src_tbl('orders')}"
    ).fetchone()[0]
    copy(
        f"""
        SELECT o_orderkey + i * {ospan} AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM {src_tbl('orders')}, range({factor}) r(i)
        """,
        "orders",
    )
    copy(
        f"""
        SELECT l_orderkey + i * {ospan} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM {src_tbl('lineitem')}, range({factor}) r(i)
        """,
        "lineitem",
    )

    espan = con.sql(
        f"SELECT max(event_id) + 1 FROM {src_tbl('events')}"
    ).fetchone()[0]
    copy(
        f"""
        SELECT event_id + i * {espan} AS event_id,
               ts + INTERVAL 1 SECOND * (i * 37 % 3600) AS ts,
               user_id, event_type, value, props
        FROM {src_tbl('events')}, range({factor}) r(i)
        """,
        "events",
    )

    dspan = con.sql(
        f"SELECT max(doc_id) + 1 FROM {src_tbl('documents')}"
    ).fetchone()[0]
    # Marker shape is a REGIME choice (round-6 finding): the original
    # 'f<fam>' markers are shared across base docs, which — combined
    # with the generator's ~31-word vocabulary — leaves the corpus with
    # NO shingle frequency tail: every 3-gram is corpus-hot, the
    # adversarial case for exact similarity joins (prefix-filter
    # candidates degrade toward all-pairs; only banding/LSH stays
    # output-bound). doc_markers="unique" suffixes the marker with the
    # base doc id, giving every family ~doc-unique rare shingles — the
    # NATURAL-text regime (real corpora have power-law shingle df with
    # a massive unique tail). Build one replica of each to measure both
    # regimes; family structure and true near-dup pairs are identical.
    if doc_markers == "unique":
        marker = "'\\1f' || (i // 10) || 'd' || doc_id || ' '"
    else:
        marker = "'\\1f' || (i // 10) || ' '"
    copy(
        f"""
        SELECT doc_id + i * {dspan} AS doc_id,
               regexp_replace(text, '((\\S+\\s+){{4}})',
                              {marker}, 'g')
                   || ' v' || (i % 10) AS text,
               lang, source,
               length(regexp_replace(text, '((\\S+\\s+){{4}})',
                                     {marker}, 'g')
                      || ' v' || (i % 10)) AS n_chars
        FROM {src_tbl('documents')}, range({factor}) r(i)
        """,
        "documents",
    )

    vspan = con.sql(
        f"SELECT max(vec_id) + 1 FROM {src_tbl('embeddings')}"
    ).fetchone()[0]
    copy(
        f"""
        SELECT vec_id + i * {vspan} AS vec_id,
               list_transform(embedding,
                   x -> x + 0.001 * ((hash(vec_id * 1000003 + i) % 997) / 997.0 - 0.5)
               ) AS embedding,
               label
        FROM {src_tbl('embeddings')}, range({factor}) r(i)
        """,
        "embeddings",
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    if len(args) != 3:
        print(__doc__)
        print(
            "Flags: --doc-markers=shared|unique   (unique = natural-text"
            " shingle-tail regime)\n"
            "       --only=documents[,events,...] (build a subset of tables)"
        )
        return 2
    src, dst, factor = args[0], args[1], int(args[2])
    only = tuple(flags["only"].split(",")) if "only" in flags else None
    build(src, dst, factor, doc_markers=flags.get("doc-markers", "shared"), only=only)
    return 0


if __name__ == "__main__":
    sys.exit(main())
