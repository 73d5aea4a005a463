#!/usr/bin/env python
"""KG-pipeline A/B harness: run_kg N times in ONE warmed session against a
pre-generated corpus (same draws discipline as bench.py run_full, which
reports the best of its draws). Builder-side instrumentation only —
official numbers come from the driver's round-start bench.py."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import _warm_python_workers, run_kg  # noqa: E402

from amharic_ecommerce_data_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/kg_corpus_20m"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    draws = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="kg-ab", cores=32, shuffle_partitions=32)
    spark.range(10).count()
    _warm_python_workers(spark, 32)
    runs = [run_kg(spark, n, corpus_path=corpus) for _ in range(draws)]
    for r in runs:
        print(json.dumps(r), flush=True)
    best = max(runs, key=lambda r: r["triples_per_sec"])
    print(json.dumps({"best_seconds": best["seconds"],
                      "best_tps": best["triples_per_sec"],
                      "extract_sec": best["extract_sec"],
                      "aggregate_sec": best["aggregate_sec"]}))
    spark.stop()


if __name__ == "__main__":
    main()
