"""CLI: run a named query (or list them) against an sf directory.

    python -m bigdatalab_spark list
    python -m bigdatalab_spark run pricing_summary [--sf-dir DIR] [-n 20]
    python -m bigdatalab_spark explain pricing_summary [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bigdatalab_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd in ("run", "explain"):
        sp = sub.add_parser(cmd)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if cmd == "run":
            sp.add_argument("-n", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    from bigdatalab_spark.queries import REGISTRY

    if args.cmd == "list":
        for name in sorted(REGISTRY):
            spec = REGISTRY[name]
            oracle = "sql-oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{oracle}] {', '.join(spec.survey_ids)}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; try: python -m bigdatalab_spark list")
        return 2

    from bigdatalab_spark.engine import Engine

    eng = Engine(app_name=f"bdl-{args.cmd}")
    eng.spark.sparkContext.setLogLevel("ERROR")
    df = eng.query(args.query, args.sf_dir)
    if args.cmd == "explain":
        print(eng.explain(df))
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
