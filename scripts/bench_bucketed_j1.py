#!/usr/bin/env python
"""Measure the shuffle saved by the bucketed extract checkpoint (pipeline
stage 1b) on the J1 join (predictions ⋈ metadata on message_id, reference
vendor_scorecard.py:64-67).

Writes the SAME extract-shaped table twice — plain parquet and bucketed
(sources/checkpoint.py write_stage bucket_by) — then times the J1 join
(groupBy(message_id) rollup + message_id equi-join) off each layout,
best-of-N, and reports the plan-level shuffle verdict. Prints ONE
JSON line. This is the evidence row for "write once with the bucket
shuffle, never shuffle again": the bucketed read should show ~zero shuffle
on the join and a lower wall time.

Usage: python scripts/bench_bucketed_j1.py [--rows 2000000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _loadavg


def j1(extracted):
    meta = extracted.select("message_id", "repo", "views")
    ents = (extracted.select("message_id",
                             F.explode_outer("products").alias("token"))
            .groupBy("message_id")
            .agg(F.array_sort(F.array_distinct(F.collect_list("token")))
                 .alias("products")))
    return meta.join(ents, "message_id")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from amharic_ecommerce_data_extractor_spark.session import get_spark
    from amharic_ecommerce_data_extractor_spark.sources import checkpoint as ckpt

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-bucketed-j1", cores=cpus,
                      shuffle_partitions=cpus)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(10).count()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="bucketed_j1_", dir=base)
    try:
        df = spark.range(args.rows).select(
            F.col("id").alias("message_id"),
            F.concat(F.lit("repo_"), (F.col("id") % 50).cast("string")).alias("repo"),
            (F.col("id") * 7 % 1000).alias("views"),
            F.array(F.concat(F.lit("p"), (F.col("id") % 997).cast("string")),
                    F.concat(F.lit("q"), (F.col("id") % 89).cast("string")))
            .alias("products"))

        t0 = time.perf_counter()
        plain = ckpt.run_stage(spark, workdir, "plain", lambda: df)
        t_write_plain = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        bucketed = ckpt.run_stage(spark, workdir, "bucketed", lambda: df,
                                  bucket_by=("message_id", args.buckets))
        t_write_bucketed = round(time.perf_counter() - t0, 3)

        def timed_join(frame):
            runs = []
            for _ in range(args.repeats):
                t = time.perf_counter()
                j1(frame).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t)
            return [round(r, 3) for r in runs]

        la0 = _loadavg()
        plain_runs = timed_join(plain)
        bucketed_runs = timed_join(bucketed)

        from amharic_ecommerce_data_extractor_spark.sources.bucketed import (
            is_shuffle_free_join,
        )

        jp, jb = j1(plain), j1(bucketed)
        jp.write.format("noop").mode("overwrite").save()
        jb.write.format("noop").mode("overwrite").save()

        out = {
            "metric": "bucketed_checkpoint_j1_join",
            "rows": args.rows,
            "buckets": args.buckets,
            "cpus": cpus,
            "write_sec": {"plain": t_write_plain, "bucketed": t_write_bucketed},
            "join_sec": {"plain": plain_runs, "bucketed": bucketed_runs,
                         "plain_best": min(plain_runs),
                         "bucketed_best": min(bucketed_runs)},
            "speedup_best": round(min(plain_runs) / min(bucketed_runs), 3),
            "shuffle_free": {"plain": is_shuffle_free_join(jp),
                             "bucketed": is_shuffle_free_join(jb)},
            "load_1m": [la0, _loadavg()],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS " + ckpt._bucket_table_name(
            os.path.join(workdir, "bucketed")))
        spark.stop()


if __name__ == "__main__":
    main()
