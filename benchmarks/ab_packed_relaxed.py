"""A/B: exact vs relaxed fused gradient on the PACKED-ensemble path, END TO
END at the paper protocol (p3_harmonic modes 0-5 lane-packed M=2, Δγ=0.5 ramp).

Round 4 flipped the single-run fused training default to
relaxed+fresh_values+extrapolate (runs/ab_relaxed_fused/summary.json: inside
training noise at 1.23×/step). The packed path (train/packed.py — adopted by
compare.train_multiple_runs and paper_tables --packed) kept the exact default
because its accuracy families were not part of that A/B. Per-step the packed
relaxed mode is 1.15× (runs/ab_packed_ensemble: 199 vs 230 µs at this shape);
this script answers whether the accuracy holds at the protocol level.

Arms (same seeds, same protocol — only the kernel mode differs):
  exact         delayed=False (current packed default)
  relaxed       plain one-step-stale cotangents (known-biased single-run)
  fresh_extrap  delayed + fresh_values + extrapolate (the single-run default)

Per arm: train_plpinn_modes_packed at the committed paper protocol
(≤5001 epochs/γ, tol=0, patience=2000, loss_faithful LR, Δγ=0.5 ramp 0→100,
f32-highest GEMMs), reporting per-(mode, checkpoint γ) μ, |Δμ| vs the exact
arm, mean abs err vs the float64 Newton oracle, and wall time.

Run on TPU:  python benchmarks/ab_packed_relaxed.py [--epochs N] [--step S]
CPU smoke:   GPE_TPU_AB_INTERPRET=1 python benchmarks/ab_packed_relaxed.py
Writes runs/ab_packed_relaxed/summary.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "runs/ab_packed_relaxed/summary.json"

ARMS = {
    "exact": {},
    "relaxed": {"GPE_TPU_RELAXED_FUSED": "1"},
    "fresh_extrap": {"GPE_TPU_RELAXED_FUSED": "1",
                     "GPE_TPU_RELAXED_FRESH": "1",
                     "GPE_TPU_RELAXED_EXTRAP": "1"},
}
_ENV_KEYS = sorted({k for v in ARMS.values() for k in v})


def _set_arm_env(arm_env: dict) -> None:
    for k in _ENV_KEYS:
        os.environ.pop(k, None)
    os.environ.update(arm_env)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5001)
    ap.add_argument("--step", type=float, default=0.5)
    ap.add_argument("--gamma-max", type=float, default=100.0)
    ap.add_argument("--modes", type=int, nargs="+",
                    default=[0, 1, 2, 3, 4, 5])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    interpret = bool(os.environ.get("GPE_TPU_AB_INTERPRET"))
    import jax
    if interpret:
        jax.config.update("jax_platforms", "cpu")
        args.epochs, args.step, args.gamma_max = 8, 1.0, 1.0
        args.modes = args.modes[:2]
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np
    from gpe_tpu.experiments.paper_tables import CHECKPOINTS, _families, _oracle_mu
    from gpe_tpu.train.packed import train_plpinn_modes_packed

    fam = _families()["p3_harmonic"]
    spec = fam["spec"]
    ramp = [round(g, 6) for g in
            np.arange(0.0, args.gamma_max + args.step / 2, args.step)]
    checkpoints = ([g for g in CHECKPOINTS if g <= args.gamma_max]
                   if not interpret else [ramp[-1]])

    oracle = {m: _oracle_mu(spec, m, checkpoints) for m in args.modes} \
        if not interpret else None

    summary = {"protocol": {"epochs": args.epochs, "step": args.step,
                            "gamma_max": args.gamma_max, "tol": 0.0,
                            "patience": 2000, "lr_mode": "loss_faithful",
                            "modes": args.modes, "seed": args.seed,
                            "interpret": interpret},
               "arms": {}}
    mu_by_arm = {}
    for name, env in ARMS.items():
        _set_arm_env(env)
        t0 = time.time()
        res = train_plpinn_modes_packed(
            spec, ramp, modes=tuple(args.modes), epochs=args.epochs,
            tol=0.0, patience=2000, lr=1e-3, seed=args.seed,
            lr_mode="loss_faithful", keep_params=False,
            interpret=interpret, verbose=True)
        wall = time.time() - t0
        mus = {m: dict(res.mu_table[m]) for m in args.modes}
        mu_by_arm[name] = mus
        rows = []
        for m in args.modes:
            for g in checkpoints:
                row = {"mode": m, "gamma": g, "mu": mus[m][g]}
                if oracle:
                    row["abs_err"] = abs(mus[m][g] - oracle[m][g])
                rows.append(row)
        arm = {"wall_s": round(wall, 1), "rows": rows}
        if oracle:
            arm["mean_abs_err"] = float(np.mean([r["abs_err"] for r in rows]))
            arm["max_abs_err"] = float(np.max([r["abs_err"] for r in rows]))
        summary["arms"][name] = arm
        print(f"arm {name}: wall {wall:.0f}s"
              + (f", mean err {arm['mean_abs_err']:.3g}, max "
                 f"{arm['max_abs_err']:.3g}" if oracle else ""), flush=True)
    _set_arm_env({})

    for name in ARMS:
        if name == "exact":
            continue
        dmu = [abs(mu_by_arm[name][m][g] - mu_by_arm["exact"][m][g])
               for m in args.modes for g in checkpoints]
        summary["arms"][name]["max_dmu_vs_exact"] = float(max(dmu))
        summary["arms"][name]["mean_dmu_vs_exact"] = float(np.mean(dmu))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "rows"}
                      for k, v in summary["arms"].items()}))


if __name__ == "__main__":
    main()
