#!/usr/bin/env python
"""Timed pin for the winnowing max_chars chunking claim (operators/dedup.py):

Spark's UTF8String.substring seeks from the start of the string, so unchunked
per-gram extraction is O(L^2) byte scans per document, while max_chars
chunking bounds it at O(L * max_chars). The selection identity is pinned by
tests/test_dedup.py (test_winnowing_chunked_equals_unchunked); this script
pins the RUNTIME separation on long documents — the quadratic-vs-linear
growth curve, not just the argument.

Usage: python scripts/time_winnowing_chunking.py [--lengths 16384,65536,262144]
Prints one JSON line:
  {"lengths": [...], "unchunked_sec": [...], "chunked_sec": [...],
   "ratio": [...], "docs_per_length": N, "selections_equal": true}
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(spark, n_docs: int, length: int):
    # deterministic word soup: enough vocabulary that k-gram hashes vary,
    # enough repetition that winnowing has realistic tie runs
    rng = random.Random(42 + length)
    words = [f"w{rng.randrange(5000):04d}" for _ in range(max(length // 6, 1))]
    text = " ".join(words)[:length]
    rows = [(i, text[i % 97:] + text[: i % 97]) for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(n_docs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="16384,65536,262144")
    ap.add_argument("--docs", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from amharic_ecommerce_data_extractor_spark.operators.dedup import (
        winnowing_fingerprints,
    )
    from amharic_ecommerce_data_extractor_spark.session import get_spark

    spark = get_spark(app_name="winnow-timing", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.range(10).count()

    lengths = [int(x) for x in args.lengths.split(",")]
    out = {"lengths": lengths, "unchunked_sec": [], "chunked_sec": [],
           "ratio": [], "docs_per_length": args.docs, "selections_equal": True}
    for length in lengths:
        docs = _docs(spark, args.docs, length)
        docs.persist().count()  # input off the timed path
        results = {}
        for mode, max_chars in (("chunked", 8192), ("unchunked", None)):
            t0 = time.perf_counter()
            fp = winnowing_fingerprints(docs, max_chars=max_chars)
            # count + order-insensitive set hash of (id, pos, fp) in ONE
            # aggregation pass: the timed action also certifies the chunked
            # and unchunked SELECTION SETS are identical, not just
            # equinumerous (bit_xor, not sum: no ANSI long overflow)
            from pyspark.sql import functions as F

            row = fp.agg(F.count("*").alias("n"),
                         F.expr("bit_xor(xxhash64(id, pos, fp))").alias("h")).collect()[0]
            results[mode] = (round(time.perf_counter() - t0, 3),
                             (row["n"], row["h"]))
        docs.unpersist()
        if results["chunked"][1] != results["unchunked"][1]:
            out["selections_equal"] = False
        out["unchunked_sec"].append(results["unchunked"][0])
        out["chunked_sec"].append(results["chunked"][0])
        out["ratio"].append(round(results["unchunked"][0] / results["chunked"][0], 2))
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
