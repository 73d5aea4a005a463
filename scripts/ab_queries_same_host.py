#!/usr/bin/env python
"""Interleaved same-host A/B of registry queries between two repo roots.

The shared sandbox host carries unpredictable external load (other tenants;
observed 1-min load swings 0.3 -> 15 with zero processes in this namespace),
so absolute per-run timings of two code versions measured at different times
are not comparable. This harness removes the time-varying-load confound the
same way scripts/ab_kg_same_host.py does for the KG pipeline: each query runs
ALTERNATELY from root A (e.g. a git worktree at the baseline commit) and
root B (the candidate tree) in fresh subprocesses, so every A/B pair is
adjacent in time and shares the host's load regime; best-of-reps per side
damps the residual. Each timed run is preceded by one discarded warm-up of
the same query in the same JVM (JIT + page cache), and stamped with
before/after 1-min load averages.

Usage:
  git worktree add /tmp/wt_base <baseline-commit>
  python scripts/ab_queries_same_host.py \
      --base /tmp/wt_base --cand /root/repo \
      --queries q42_ngram_jaccard_pairs,q31_minhash_near_dup_pairs --reps 2

Interpretation: ratio B/A < 1 means the candidate is faster; pairs whose two
load stamps diverge wildly should be discarded (the stamps make that call
adjudicable from the artifact, not the narrative)."""
import argparse
import json
import subprocess
import sys

RUNNER = r'''
import json, sys, time
root, name, sf_dir, cores = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
sys.path.insert(0, root)
from bench import _force, _warm_python_workers, _loadavg
from amharic_ecommerce_data_extractor_spark.session import get_spark
from amharic_ecommerce_data_extractor_spark.queries import SPARK_QUERIES
spark = get_spark(app_name="ab-query", cores=cores, shuffle_partitions=cores)
spark.range(10).count()
_warm_python_workers(spark, cores)
fn = SPARK_QUERIES[name]
_force(fn(spark, sf_dir))  # discarded warm-up
la0 = _loadavg(); t0 = time.perf_counter()
_force(fn(spark, sf_dir))
dt = time.perf_counter() - t0
print(json.dumps({"sec": round(dt, 3), "load": [la0, _loadavg()]}))
spark.stop()
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="repo root A (baseline)")
    ap.add_argument("--cand", required=True, help="repo root B (candidate)")
    ap.add_argument("--queries", required=True, help="comma-separated names")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    roots = {"A": args.base, "B": args.cand}
    out = {}
    for q in args.queries.split(","):
        out[q] = {"A": [], "B": []}
        for _ in range(args.reps):
            for side in ("A", "B"):
                r = subprocess.run(
                    [sys.executable, "-c", RUNNER, roots[side], q,
                     args.sf_dir, str(args.cores)],
                    capture_output=True, text=True, timeout=900)
                line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
                try:
                    out[q][side].append(json.loads(line))
                except json.JSONDecodeError:
                    out[q][side].append({"err": r.stderr[-300:]})
        a = min(x.get("sec", float("inf")) for x in out[q]["A"])
        b = min(x.get("sec", float("inf")) for x in out[q]["B"])
        if a == float("inf") or b == float("inf"):
            bad = " ".join(s for s, v in (("A", a), ("B", b))
                           if v == float("inf"))
            print(f"{q}: ALL REPS FAILED on side(s) {bad} — no ratio; "
                  "see 'err' entries in the JSON", file=sys.stderr, flush=True)
        else:
            print(f"{q}: A(base)={a:.2f}s B(cand)={b:.2f}s ratio B/A={b/a:.3f}",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
