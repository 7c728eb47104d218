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


def probe_once(timeout_s: int = 540) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC], cwd="/root/repo",
                           capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "probe-ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


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
        try:
            r = subprocess.run(cmd, cwd="/root/repo", stdout=lf,
                               stderr=subprocess.STDOUT, timeout=cap)
            rc = r.returncode
        except subprocess.TimeoutExpired:
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
