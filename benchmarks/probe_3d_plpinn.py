"""Diagnose the 3D PL-PINN γ≥20 branch loss: budget or basin? (VERDICT r4 #7)

The 3D flagship module note (experiments/gpe3d_ground_state.py) reports that
the 2D paper-protocol PL-PINN recipe falls off the ground-state branch at
γ≥20 in 3D (μ freezes near 1.97 while the oracle ground state is 2.2968) and
attributes it to a spurious Adam basin. This probe separates the two
hypotheses with three arms on the SAME 36³ spec:

  paper     PL-PINN continuation 0→20 (Δγ=0.5) at the paper budget
            (≤5001 epochs/γ, tol=0, patience=2000) — replicates the failure.
  budget3x  identical ramp at 3× the budget (15003 epochs, patience 6000).
            If μ(20) recovers → the failure was budget. If it freezes at the
            same spurious value → budget is not the limiter.
  stay      the net is DISTILLED onto the true γ=20 state (perturbation
            target (ψ*₂₀ − base)/q from the f64 oracle, regridded 64³→36³)
            and then handed to the SAME Adam/loss at γ=20. If it walks away,
            the true state is not an attractor of this loss/optimizer at
            this resolution (basin geometry); if it stays, the basin exists
            and only the continuation path misses it.

Writes runs/probe_3d_plpinn/summary.json with μ trajectories + verdict.
Run (TPU): python benchmarks/probe_3d_plpinn.py [--n 36] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "runs/probe_3d_plpinn"
MU_STAR_20 = None  # filled from the oracle ladder


def _spec(n, width):
    from gpe_tpu.train import GPESpec
    return GPESpec(dim=3, lb=-6.0, ub=6.0, n_points=n,
                   layers=(3, width, width, width, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   basis="hermite", kinetic=0.5, nonlinearity="abs_power",
                   use_perturbation=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=36)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=5001)
    ap.add_argument("--quick", action="store_true",
                    help="tiny budgets for a CPU smoke")
    args = ap.parse_args(argv)
    if args.quick:
        args.n, args.width, args.epochs = 12, 32, 60

    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy.interpolate import RegularGridInterpolator

    from gpe_tpu.models import mlp
    from gpe_tpu.train import (fit, make_batch, make_loss_fn, make_optimizer,
                               train_plpinn)
    from gpe_tpu.train.problem import base_triple
    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe

    os.makedirs(OUT, exist_ok=True)
    spec = _spec(args.n, args.width)
    ramp = [0.5 * k for k in range(41)]            # 0 → 20
    if args.quick:
        ramp = [0.0, 10.0, 20.0]

    # f64 split-step oracle μ*/ψ* at γ=20 (ladder warm start, CPU numpy)
    n_or = 48 if not args.quick else 16
    x_or = np.linspace(spec.lb, spec.ub, n_or)
    dx_or = x_or[1] - x_or[0]
    G = np.meshgrid(x_or, x_or, x_or, indexing="ij")
    V_or = 0.5 * sum(g ** 2 for g in G)
    psi_o = None
    t0 = time.time()
    for g in ([0.0, 5.0, 10.0, 20.0] if not args.quick else [0.0, 20.0]):
        mu_star, psi_o = imaginary_time_gpe(
            V_or, dx_or, g, kinetic=0.5, p=3.0, tau=4e-3,
            steps=4000 if not args.quick else 300, psi0=psi_o,
            richardson=1)
    print(f"oracle μ*(20) = {mu_star:.6f} ({time.time()-t0:.0f}s)", flush=True)

    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    summary = {"config": f"3D PL-PINN branch diagnosis, {args.n}³ pts, "
                         f"width {args.width}",
               "mu_star_20": float(mu_star), "arms": {}}

    def run_ramp(name, epochs, patience):
        t1 = time.time()
        res = train_plpinn(spec, ramp, modes=(0,), epochs=epochs, tol=0.0,
                           patience=patience, keep_params=False,
                           check_every=512, verbose=False)
        mus = dict(res.mu_table[0])
        row = {"mu_20": mus[20.0],
               "err_20": abs(mus[20.0] - mu_star),
               "mu_trajectory": {f"{g:g}": mus[g] for g in ramp},
               "wall_s": round(time.time() - t1, 1)}
        summary["arms"][name] = row
        print(json.dumps({name: {k: row[k] for k in
                                 ("mu_20", "err_20", "wall_s")}}), flush=True)

    run_ramp("paper", args.epochs, 2000)
    run_ramp("budget3x", 3 * args.epochs, 6000)

    # --- stay arm ---
    t1 = time.time()
    base = base_triple(spec, 0, batch["x"])
    interp = RegularGridInterpolator((x_or, x_or, x_or), psi_o,
                                     bounds_error=False, fill_value=0.0)
    pts = np.asarray(batch["x"], np.float64)
    psi_star_pts = interp(pts)
    # sign-align oracle to the (positive) base
    if np.sum(psi_star_pts * np.asarray(base.value)) < 0:
        psi_star_pts = -psi_star_pts
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    from gpe_tpu.train import pretrain_to_base
    params, pre_mse = pretrain_to_base(params, batch["x"],
                                       np.asarray(base.value),
                                       spec.activation, epochs=2000)
    const = float(jnp.max(mlp.mlp_apply(params, batch["x"], spec.activation)))
    scale = 0.01 / const
    # distill the net onto the perturbation target (ψ* − base)/q
    target = (psi_star_pts - np.asarray(base.value, np.float64)) / scale
    params, dist_mse = pretrain_to_base(params, batch["x"],
                                        target.astype(np.float32),
                                        spec.activation, epochs=4000)
    _, aux0 = jax.jit(loss_fn)(params, batch, jnp.float32(20.0),
                               jnp.float32(scale))
    mu_init = float(aux0["mu"])
    res = fit(loss_fn, make_optimizer("adam", 1e-3, clip_norm=1.0), params,
              batch, jnp.float32(20.0), jnp.float32(scale),
              epochs=args.epochs, tol=0.0, patience=10**9, check_every=512)
    summary["arms"]["stay"] = {
        "distill_mse": float(dist_mse), "mu_init": mu_init,
        "mu_final": float(res.mu), "mu_best": float(res.mu_best),
        "err_init": abs(mu_init - mu_star),
        "err_final": abs(float(res.mu) - mu_star),
        "walked_away": bool(abs(float(res.mu) - mu_star) > 5 *
                            max(abs(mu_init - mu_star), 1e-4)),
        "wall_s": round(time.time() - t1, 1)}
    print(json.dumps(summary["arms"]["stay"]), flush=True)

    paper_err = summary["arms"]["paper"]["err_20"]
    b3_err = summary["arms"]["budget3x"]["err_20"]
    stay = summary["arms"]["stay"]
    summary["verdict"] = (
        "budget-limited" if b3_err < 0.1 * paper_err else
        ("basin: the true state is not an attractor of this loss/optimizer "
         "at this resolution" if stay["walked_away"] else
         "basin: the true state IS a stable attractor — the continuation "
         "path (not the budget) misses it"))
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"verdict": summary["verdict"]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
