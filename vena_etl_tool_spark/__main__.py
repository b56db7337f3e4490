"""Engine CLI: run any registered query by name.

    python -m vena_etl_tool_spark list [filter]
    python -m vena_etl_tool_spark run <query> [--sf-dir DIR] [--explain] [-n ROWS]

`list` prints the registry (name, check class, tags); `run` executes one
query against the fixture tables and shows the first rows — with
`--explain`, the AQE-final physical plan instead. This is the ad-hoc
engine surface; the reference-parity pipeline CLI (upload/status/...)
lives at ``python -m vena_etl_tool_spark.pipeline.cli``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="python -m vena_etl_tool_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument(
        "filter", nargs="?", default="", help="substring filter (name or tag)"
    )
    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=None)
    p_run.add_argument("--explain", action="store_true", help="print the plan")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")
    args = parser.parse_args(argv)

    from .registry import all_specs

    specs = all_specs()
    if args.cmd == "list":
        for name, spec in specs.items():
            if args.filter in name or any(args.filter in t for t in spec.tags):
                kind = "oracle" if spec.oracle is not None else "rows-only"
                print(f"{name:40s} {kind:9s} {','.join(spec.tags)}")
        return 0

    if args.query not in specs:
        import difflib

        near = [n for n in specs if args.query in n] or difflib.get_close_matches(
            args.query, specs, n=5, cutoff=0.6
        )
        hint = f" (did you mean: {', '.join(near[:5])}?)" if near else ""
        print(f"unknown query: {args.query}{hint}", file=sys.stderr)
        return 2

    from .catalog import DEFAULT_SF_DIR  # already folds in $SPARK_GRAFT_SF_DIR
    from .session import get_spark

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark("cli-run")
    df = specs[args.query].fn(spark, sf_dir)
    if args.explain:
        # finalize AQE without holding the whole result on the driver:
        # toLocalIterator streams this DataFrame's own execution (a noop
        # write would finalize a DIFFERENT QueryExecution and leave this
        # plan initial)
        for _ in df.toLocalIterator():
            pass
        try:
            print(df._jdf.queryExecution().executedPlan().toString())
        except Exception:  # Spark Connect: no _jdf — show the static plan
            df.explain("formatted")
    else:
        df.show(args.n, truncate=40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
