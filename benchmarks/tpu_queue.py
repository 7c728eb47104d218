"""Serial TPU job queue with tunnel-outage tolerance.

The image's TPU is one tunnel-attached chip (CLAUDE.md): exactly one TPU
process may run at a time, and the tunnel relay can die for minutes at a
time. This runner executes a list of stages one by one, probing the device
with a tiny matmul (bounded by a subprocess timeout) before each stage and
retrying a stage once if it fails while the probe says the device is dead.

Usage: python benchmarks/tpu_queue.py <queue.json> <status.jsonl>
where queue.json is [{"name": ..., "cmd": [...], "timeout_s": N}, ...].
Status lines (one JSON per stage attempt) append to status.jsonl.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((256, 256))\n"
    "print('probe-ok', float((x @ x).sum()))\n"
)


def probe_once(timeout_s: int = 780) -> bool:
    """Own process group, stdout to a temp file (no pipes): a wedged claim
    can hang past subprocess.run's timeout — the child kill leaves
    pipe-holding descendants and communicate() blocks forever (observed
    2026-08-20). killpg makes the timeout unconditional."""
    import signal
    import tempfile
    with tempfile.TemporaryFile() as out:
        p = subprocess.Popen([sys.executable, "-c", PROBE_SRC],
                             cwd="/root/repo", stdout=out,
                             stderr=subprocess.DEVNULL,
                             start_new_session=True)
        try:
            rc = p.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            p.wait()
            return False
        out.seek(0)
        return rc == 0 and b"probe-ok" in out.read()


def wait_for_tpu(status, max_wait_s: int = 3600) -> bool:
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        if probe_once():
            return True
        status.write(json.dumps({"event": "probe-failed",
                                 "ts": time.time()}) + "\n")
        status.flush()
        time.sleep(120)
    return False


def run_stage(stage, status) -> int:
    name, cmd = stage["name"], stage["cmd"]
    cap = int(stage.get("timeout_s", 7200))
    log = stage.get("log", f"/tmp/queue_{name}.log")
    t0 = time.time()
    with open(log, "w") as lf:
        # own process group: on timeout kill the WHOLE group, not just the
        # direct child — a surviving grandchild (e.g. a bench worker) would
        # keep holding the single chip and wedge every later stage
        import signal
        p = subprocess.Popen(cmd, cwd="/root/repo", stdout=lf,
                             stderr=subprocess.STDOUT,
                             start_new_session=True)
        try:
            rc = p.wait(timeout=cap)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            p.wait()
            rc = -9
    status.write(json.dumps({"stage": name, "rc": rc,
                             "wall_s": round(time.time() - t0, 1),
                             "log": log, "ts": time.time()}) + "\n")
    status.flush()
    return rc


def main() -> int:
    queue_path, status_path = sys.argv[1], sys.argv[2]
    with open(queue_path) as f:
        stages = json.load(f)
    with open(status_path, "a") as status:
        for stage in stages:
            if not wait_for_tpu(status):
                status.write(json.dumps({"stage": stage["name"],
                                         "rc": None,
                                         "error": "tpu-never-came-back"})
                             + "\n")
                status.flush()
                continue
            rc = run_stage(stage, status)
            if rc != 0 and not probe_once():
                # stage likely died WITH the tunnel — wait and retry once
                if wait_for_tpu(status):
                    run_stage({**stage, "name": stage["name"] + "-retry"},
                              status)
        status.write(json.dumps({"event": "queue-done",
                                 "ts": time.time()}) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
