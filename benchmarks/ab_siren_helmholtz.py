"""A/B: tanh/xavier vs sin/siren on the Helmholtz PINNs (square + circle).

The Helmholtz targets are oscillatory (sin(ax)sin(by) on the square,
Bessel J_n(kr)cos(nθ) on the disk) — the same regime where SIREN beat the
tanh distill by 500× on the vortex field (runs/gpe2d_vortex/ab_siren.json).
Arms run the committed experiment protocol (epochs=4000, lbfgs=100,
lm=120 — experiments/run.py helmholtz branch) with identical budgets.

Run (CPU is fine — accuracy A/B, not a throughput bench):
  python benchmarks/ab_siren_helmholtz.py [--epochs N]
Writes runs/helmholtz_ab_siren/ab.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "runs/helmholtz_ab_siren/ab.json"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--lbfgs", type=int, default=100)
    ap.add_argument("--lm", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    from gpe_tpu.helmholtz.problem import HelmholtzSpec, train_helmholtz

    domains = {
        "square": dict(domain="square", k=2.0),
        "circle": dict(domain="circle", k=3.0, mode_n=1),
    }
    arms = [
        {"name": "tanh_xavier", "activation": "tanh",
         "init_scheme": "xavier_uniform", "w0": 0.0},
        {"name": "sin_siren_w4", "activation": "sin",
         "init_scheme": "siren", "w0": 4.0},
        {"name": "sin_siren_w6", "activation": "sin",
         "init_scheme": "siren", "w0": 6.0},
        {"name": "sin_siren_w10", "activation": "sin",
         "init_scheme": "siren", "w0": 10.0},
    ]
    results = []
    for dname, dkw in domains.items():
        for arm in arms:
            spec = HelmholtzSpec(**dkw, activation=arm["activation"],
                                 init_scheme=arm["init_scheme"],
                                 w0=arm["w0"] or 6.0)
            t0 = time.time()
            res = train_helmholtz(spec, epochs=args.epochs,
                                  lbfgs_steps=args.lbfgs, lm_steps=args.lm)
            row = {"domain": dname, **arm, "test_mae": res.test_mae,
                   "interior_mse": res.interior_mse,
                   "wall_s": round(time.time() - t0, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"epochs": args.epochs, "lbfgs": args.lbfgs,
                   "lm": args.lm, "arms": results}, f, indent=2)
    print(json.dumps({"written": OUT}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
