"""Per-query optimization measurement harness (OPTIMIZATION r11).

Times named registry queries with the noop sink (guide §1.4) after a
sf0.001 warmup pass (JIT/codegen), min-of-N, and captures
``explain("formatted")`` into plans/r11/<query>_<tag>.txt (guide §1,
§7.2). Usage:

    python tools/opt_measure.py [--tag before|after] [--passes 3]
        [--no-explain] query [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per query: name, min/median seconds, pass times.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vena_etl_tool_spark.registry import all_specs
from vena_etl_tool_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None, help="plans/r11/<q>_<tag>.txt")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("opt-measure")
    specs = all_specs()
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS", "r12"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.queries:
        fn = specs[name].fn
        if not args.no_warmup and os.path.isdir(warm_dir) and warm_dir != sf_dir:
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        if args.tag and not args.no_explain:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"time:{name}:pass{i}")
            start = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - start, 3))
        spark.sparkContext.setJobDescription(None)
        if times:
            srt = sorted(times)
            print(
                f"{name}: min={srt[0]:.3f}s median={srt[len(srt) // 2]:.3f}s"
                f" passes={times}",
                flush=True,
            )
        else:
            print(f"{name}: plan captured", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
