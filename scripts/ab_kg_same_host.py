#!/usr/bin/env python
"""Same-host A/B of the KG pipeline across two code revisions (VERDICT r3
"What's wrong #2": the r2→r3 kg_pipeline delta was measured on different VMs
and the cross-host numbers drifted apart — 487k vs 264k t/s — with no way to
attribute host vs code).

Protocol: one pre-generated corpus on tmpfs shared by both trees; one
discarded warm-up per tree; then N interleaved pairs (treeA, treeB, ...) so
time-varying host load cancels in the per-pair ratio (same discipline as
bench.py --scaling --paired). Each run is `python bench.py --kg-only` from
that TREE's working copy, so each revision runs its own recorded methodology.

Usage:
  python scripts/ab_kg_same_host.py --tree-a /tmp/r2code --tree-b /root/repo \
      --messages 2000000 --pairs 3
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile


def one_run(tree: str, corpus: str, n: int, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--kg-only",
         "--messages", str(n), "--corpus", corpus],
        cwd=tree, env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])["kg"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--messages", type=int, default=2_000_000)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    base_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix="kg_ab_corpus_", dir=base_dir)
    corpus = f"{corpus_dir}/messages"
    gen = (
        "import sys; sys.path.insert(0, {tb!r})\n"
        "from amharic_ecommerce_data_extractor_spark.session import get_spark\n"
        "from amharic_ecommerce_data_extractor_spark.data.synthetic import generate_messages\n"
        "spark = get_spark(app_name='ab-gen')\n"
        "generate_messages(spark, n_rows={n}, n_vendors=50)"
        ".write.mode('overwrite').parquet({c!r})\n"
        "spark.stop()\n"
    ).format(tb=args.tree_b, n=args.messages, c=corpus)
    try:
        subprocess.run([sys.executable, "-c", gen], check=True,
                       capture_output=True, text=True)
        for tree in (args.tree_a, args.tree_b):  # discarded warm-ups
            one_run(tree, corpus, args.messages, args.cpus)
        pairs = []
        for _ in range(args.pairs):
            a = one_run(args.tree_a, corpus, args.messages, args.cpus)
            b = one_run(args.tree_b, corpus, args.messages, args.cpus)
            pairs.append({
                "a_tps": a["triples_per_sec"], "b_tps": b["triples_per_sec"],
                "b_over_a": round(b["triples_per_sec"] / a["triples_per_sec"], 4),
                "a": a, "b": b})
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "kg_ab_same_host", "messages": args.messages,
        "cpus": args.cpus, "tree_a": args.tree_a, "tree_b": args.tree_b,
        "pairs": [{k: p[k] for k in ("a_tps", "b_tps", "b_over_a")}
                  for p in pairs],
        "best_a": max(p["a_tps"] for p in pairs),
        "best_b": max(p["b_tps"] for p in pairs),
        "median_b_over_a": round(statistics.median(p["b_over_a"] for p in pairs), 4),
        "detail": pairs}))


if __name__ == "__main__":
    main()
