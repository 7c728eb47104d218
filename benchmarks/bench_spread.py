"""Summarize N bench.py captures into a spread table (VERDICT r3 #3).

The tunnel backend's throughput wanders across captures (claimed ±8% in
round 3 with no committed evidence). This reads bench JSON lines from the
given log files (each `bench.py` run prints exactly one line starting with
'{'), computes per-metric min/median/max and relative spread, and writes
runs/bench_r4/spread.json.

Usage: python benchmarks/bench_spread.py LOG [LOG ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys

METRICS = ("value", "pallas_eval_pts_per_sec", "pallas_bf16_eval_pts_per_sec",
           "xla_eval_pts_per_sec", "bf16_eval_pts_per_sec",
           "train_step_pts_per_sec",
           "fused_train_step_pts_per_sec",
           "fused_train_step_relaxed_pts_per_sec", "eval_mfu",
           "eval_mfu_vs_f32_peak")


def last_json_line(path: str) -> dict:
    line = None
    with open(path) as f:
        for raw in f:
            raw = raw.strip()
            if raw.startswith("{") and '"metric"' in raw:
                line = raw
    if line is None:
        raise SystemExit(f"{path}: no bench JSON line")
    return json.loads(line)


def main(argv) -> int:
    captures = [last_json_line(p) for p in argv]
    out = {"n_captures": len(captures),
           "sources": list(argv),
           "captured_at": [c.get("captured_at") for c in captures],
           "metrics": {}}
    for m in METRICS:
        vals = [c[m] for c in captures if c.get(m) is not None]
        if not vals:
            continue
        med = statistics.median(vals)
        out["metrics"][m] = {
            "values": vals, "min": min(vals), "median": med,
            "max": max(vals),
            "rel_spread_pct": round(100.0 * (max(vals) - min(vals))
                                    / med, 2) if med else None,
        }
    os.makedirs("runs/bench_r4", exist_ok=True)
    with open("runs/bench_r4/spread.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({m: v["rel_spread_pct"]
                      for m, v in out["metrics"].items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
