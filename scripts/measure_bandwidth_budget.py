"""Per-message byte budget of the KG pipeline's stages.

Memory bandwidth, not CPU, is the binding resource on bandwidth-starved
hosts (see BASELINE.md "Host change mid-round") and on dense multi-executor
nodes where all executors share the socket's memory controllers. This
script measures what the pipeline actually streams per message so executor
sizing can budget bytes/s, not just cores:

* corpus parquet bytes/message (what the scan streams, compressed)
* raw text bytes/message (what the Arrow batches carry into Python)
* extract-checkpoint bytes/message (what stage 1 writes + stage 2 rescans)
* triples parquet bytes/message (the sink)

Usage: python scripts/measure_bandwidth_budget.py [--messages 200000]
Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--messages", type=int, default=200_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages
    from amharic_ecommerce_data_extractor_spark.operators.extract import extract_entities
    from amharic_ecommerce_data_extractor_spark.operators.triples import emit_triples
    from amharic_ecommerce_data_extractor_spark.session import get_spark

    spark = get_spark(app_name="bandwidth-budget", cores=8,
                      shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="bw_budget_")
    n = args.messages
    try:
        corpus = f"{work}/messages"
        generate_messages(spark, n_rows=n, n_vendors=50).write.parquet(corpus)
        msgs = spark.read.parquet(corpus)
        text_bytes = msgs.select(
            F.sum(F.length(F.encode(F.coalesce("content", F.lit("")),
                                    "UTF-8")))).first()[0]

        ext = f"{work}/extracted"
        extract_entities(msgs, include_tokens=False,
                         include_clean_text=False).write.parquet(ext)
        tri = f"{work}/triples"
        emit_triples(spark.read.parquet(ext)).write.parquet(tri)
        n_triples = spark.read.parquet(tri).count()

        out = {
            "metric": "bytes_per_message_budget",
            "messages": n,
            "triples": n_triples,
            "corpus_parquet_b_per_msg": round(_du(corpus) / n, 1),
            "raw_text_b_per_msg": round(text_bytes / n, 1),
            "extract_parquet_b_per_msg": round(_du(ext) / n, 1),
            "triples_parquet_b_per_msg": round(_du(tri) / n, 1),
        }
        # the floor of what one message COSTS in streamed bytes end-to-end:
        # scan (compressed) + Arrow text in + Arrow rows out + checkpoint
        # write + checkpoint rescan + triples write. Arrow output rows and
        # decompression inflation are not counted — this is a lower bound.
        out["streamed_b_per_msg_lower_bound"] = round(
            out["corpus_parquet_b_per_msg"] + out["raw_text_b_per_msg"]
            + 2 * out["extract_parquet_b_per_msg"]
            + out["triples_parquet_b_per_msg"], 1)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
