#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization guide §1 calls for).

Modes:
  --queries a,b,c [--reps N] [--warmup]   isolate named registry queries with
                                          the noop sink, one JSON line per run
  --explain a,b,c [--out DIR]             write .explain("formatted") of each
                                          query to DIR/<name>.txt
  --all                                   all registry queries

Same env contract as bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
Timings printed here are for the builder's optimization loop only; the
official numbers come from the driver running the round-start bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from bench import _cpustat, _force, _loadavg, _steal_pct, _warm_python_workers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain", default=None)
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--warmup", action="store_true",
                    help="one discarded run of each query before timing")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from amharic_ecommerce_data_extractor_spark.queries import SPARK_QUERIES
    from amharic_ecommerce_data_extractor_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=cpus, shuffle_partitions=cpus)
    spark.range(10).count()
    _warm_python_workers(spark, cpus)

    if args.explain:
        os.makedirs(args.out, exist_ok=True)
        for name in args.explain.split(","):
            df = SPARK_QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.out, f"{name}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
        spark.stop()
        return

    names = (sorted(SPARK_QUERIES) if args.all
             else [n for n in (args.queries or "").split(",") if n])
    results: dict[str, list[float]] = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        if args.warmup:
            _force(fn(spark, sf_dir))
        runs = []
        for _ in range(args.reps):
            la0, cs0 = _loadavg(), _cpustat()
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            sec = round(time.perf_counter() - t0, 3)
            runs.append({"sec": sec, "load_1m": [la0, _loadavg()],
                         "steal_pct": _steal_pct(cs0, _cpustat())})
        results[name] = runs
        print(json.dumps({"query": name, "sf_dir": sf_dir, "runs": runs}),
              flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
