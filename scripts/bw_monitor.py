"""Low-impact memory-bandwidth share monitor.

Samples OUR single-stream bandwidth (two timed 256 MiB numpy sums) every
--interval seconds and appends JSONL rows {ts, gbps, load_1m}. Run it
taskset-pinned to a core OUTSIDE the workload's pinned set, concurrently
with a benchmark: a co-tenant pressing the shared memory controllers/LLC
shows up as dips in our share — the contention channel that neither
load_1m nor steal_pct can see (our vCPUs keep running, just at lower IPC).

Usage:
    taskset -c 31 python scripts/bw_monitor.py --out /tmp/bw.jsonl \
        --interval 20 --duration 2400 &
"""

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--interval", type=float, default=20.0)
    ap.add_argument("--duration", type=float, default=2400.0)
    args = ap.parse_args()

    import numpy as np

    a = np.random.default_rng(0).integers(0, 255, size=256 << 20 >> 3,
                                          dtype=np.int64)
    a.sum()  # touch
    t_stop = time.time() + args.duration
    sink = 0
    while time.time() < t_stop:
        t0 = time.perf_counter()
        sink ^= int(a.sum())
        sink ^= int(a.sum())
        dt = time.perf_counter() - t0
        row = {"ts": round(time.time(), 1),
               "gbps": round(2 * 0.25 / dt, 2),
               "load_1m": round(os.getloadavg()[0], 2)}
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        time.sleep(args.interval)
    if sink == -1:  # keep the sums live
        print(sink)


if __name__ == "__main__":
    main()
