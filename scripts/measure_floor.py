#!/usr/bin/env python
"""Measure the single-process baseline floor: the pinned pandas oracle
(kernels/pandas_oracle.py — the reference's working notebook-03 semantics,
already batch-vectorized, i.e. GENEROUS to the reference whose real code
runs iterrows loops and per-row model calls) end-to-end on one core.

BASELINE.md quotes this number as the floor the Spark engine is compared
against; hosts differ between rounds, so re-run it on the box that produced
the corresponding BENCH numbers:

    taskset -c 31 python scripts/measure_floor.py --messages 100000

Prints one JSON line: {"triples_per_sec": ..., "messages_per_sec": ...,
"messages": N, "triples": M, "seconds": s, "phase_sec": {...}}.

The corpus is the same seed-pinned synthetic generator the Spark bench
uses (data/synthetic.generate_messages), materialized to pandas OUTSIDE the
timed window; the timed window covers extract → triples → scorecard. Note
the asymmetry vs bench.py's Spark window: the Spark job additionally pays
parquet write+read I/O for the extract and triples stages inside ITS timed
window while this floor is pure in-memory compute — the "× floor" ratios
derived from the two are therefore conservative (they understate the
engine's advantage).
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
    ap.add_argument("--messages", type=int, default=100_000)
    args = ap.parse_args()

    from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages
    from amharic_ecommerce_data_extractor_spark.kernels import pandas_oracle as po
    from amharic_ecommerce_data_extractor_spark.session import get_spark

    # corpus generation via Spark (identical rows to the engine bench),
    # collected to pandas before any timing starts
    spark = get_spark(app_name="floor-gen", cores=2, shuffle_partitions=2)
    pdf = generate_messages(spark, n_rows=args.messages, n_vendors=50).toPandas()
    spark.stop()

    t0 = time.perf_counter()
    extracted = po.extract_frame(pdf)
    t_extract = time.perf_counter() - t0
    t1 = time.perf_counter()
    triples = po.emit_triples(extracted)
    t_triples = time.perf_counter() - t1
    t2 = time.perf_counter()
    po.vendor_scorecard(extracted)
    t_score = time.perf_counter() - t2
    elapsed = t_extract + t_triples + t_score

    print(json.dumps({
        "metric": "single_process_floor",
        "messages": args.messages,
        "triples": int(len(triples)),
        "seconds": round(elapsed, 3),
        "phase_sec": {"extract": round(t_extract, 3),
                      "triples": round(t_triples, 3),
                      "scorecard": round(t_score, 3)},
        "triples_per_sec": round(len(triples) / elapsed, 1),
        "messages_per_sec": round(args.messages / elapsed, 1),
    }))


if __name__ == "__main__":
    main()
