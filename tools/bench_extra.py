"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink, best-of-N, and optionally dumps
.explain("formatted") to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/bench_extra.py [--sf DIR] [--runs N]
                                   [--plans TAG SUFFIX] name...
Prints one JSON line {"queries": {name: sec}}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", nargs=2, metavar=("TAG", "SUFFIX"),
                    default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from traval_spark.session import get_spark
    spark = get_spark("traval-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    # warm footer caches
    spark.read.parquet(f"{args.sf}/events.parquet").count()

    timings = {}
    for name in args.names:
        df = qs[name](spark, args.sf)
        if args.plans:
            tag, suffix = args.plans
            d = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "plans", tag)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            df = qs[name](spark, args.sf)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({"queries": timings, "sf": args.sf, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
