"""Real mid-run kill/resume: the pipeline CLI is SIGKILLed mid-extract in a
separate process, then re-run; finished chunks must not be recomputed and
the final outputs must be complete."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

CMD = [sys.executable, "-m", "amharic_ecommerce_data_extractor_spark.plans.pipeline"]


@pytest.mark.slow
def test_kill_mid_extract_then_resume(tmp_path):
    wd = str(tmp_path / "kg")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.Popen(
        CMD + ["--workdir", wd, "--messages", "3000", "--chunks", "6", "--cpus", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)

    # wait until at least two extract chunks committed, then SIGKILL
    deadline = time.time() + 240
    def committed():
        d = os.path.join(wd, "extract")
        if not os.path.isdir(d):
            return []
        return sorted(c for c in os.listdir(d)
                      if c.startswith("chunk=")
                      and os.path.exists(os.path.join(d, c, "_STAGE_DONE")))
    while time.time() < deadline and len(committed()) < 2:
        if proc.poll() is not None:
            break
        time.sleep(1.0)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    done_before = committed()
    assert done_before, "no chunk committed before the kill"
    mtimes = {c: os.path.getmtime(os.path.join(wd, "extract", c, "_STAGE_DONE"))
              for c in done_before}

    # resume in a fresh process
    out = subprocess.run(
        CMD + ["--workdir", wd, "--messages", "3000", "--chunks", "6", "--cpus", "2"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["messages"] == 3000
    assert summary["triples"] > 0 and summary["vendors"] > 0

    for c, m in mtimes.items():
        assert os.path.getmtime(os.path.join(wd, "extract", c, "_STAGE_DONE")) == m, \
            f"{c} was recomputed after resume"
