"""BASELINE config #4 via the PL-PINN family itself: optical lattice with a
NUMERIC base (physics/numeric.py).

The committed hermite-base PL-PINN run lands on the localized single-well
branch (runs/gpe2d_lattice/summary.json) — the Gaussian base is topologically
wrong for the delocalized 3×3-well ground state. The reference's scheme
(mode selection purely by analytic base choice,
harmonic_pinn_simulation.py:127-134) simply has no base for this potential.
Here the γ=0 DELOCALIZED linear eigenstate from the float64 Dirichlet DST-I
oracle becomes the base: its sine-series expansion gives spectrally-exact
val/∇/Δ streams, and the standard PL machinery (q-scaled perturbation,
rebased continuation, per-checkpoint LM polish) then tracks the TRUE ground
state along the γ ramp — the oracle seeds only the γ=0 LINEAR state; every
γ>0 number is the net's own continuation.

Run AFTER lattice_summary.py (needs oracle_cache.npz):
    python -m gpe_tpu.experiments.gpe2d_lattice_plpinn
Adds the "plpinn_numeric_base" section to runs/gpe2d_lattice/summary.json.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/gpe2d_lattice")
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--dgamma", type=float, default=0.5)
    ap.add_argument("--lm-steps", type=int, default=300)
    ap.add_argument("--polish-x64", action="store_true",
                    help="f64 host LM endgame + f64 μ at each checkpoint")
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    from gpe_tpu.physics.numeric import SineSeries2D, register_numeric_basis
    from gpe_tpu.train import GPESpec, train_plpinn

    cache = np.load(os.path.join(args.dir, "oracle_cache.npz"))
    gammas = [float(g) for g in cache["gammas"]]
    xi, dx = np.asarray(cache["xi"]), float(cache["dx"])
    lb, ub = float(xi[0] - dx), float(xi[-1] + dx)

    # γ=0 linear eigenstate only — the continuation must EARN every γ>0 state
    basis = register_numeric_basis(
        "lattice_gs", SineSeries2D(xi, np.asarray(cache["psis"][0]), lb, ub))

    spec = GPESpec(dim=2, lb=lb, ub=ub, n_points=128,
                   layers=(2, 128, 128, 128, 1), activation="shifted_tanh",
                   potential="optical_lattice",
                   potential_kwargs=(("V0", 4.0), ("k", 0.7853981633974483)),
                   basis=basis, kinetic=0.5, nonlinearity="abs_power")

    gmax = gammas[-1]
    n_steps = int(round(gmax / args.dgamma))
    ramp = [k * args.dgamma for k in range(n_steps + 1)]

    t0 = time.time()
    res = train_plpinn(spec, ramp, modes=(0,), epochs=args.epochs, tol=0.0,
                       patience=10**9, rebase=True, keep_params=False,
                       polish_checkpoints=gammas, lm_steps=args.lm_steps,
                       polish_x64=args.polish_x64, verbose=True)

    mu = dict(res.mu_table[0])
    polished = (res.polished.get(0, {}) or {}).get("by_gamma", {})
    rows = []
    for i, g in enumerate(gammas):
        mu_ref = float(cache["mu_refs"][i])
        rows.append({"gamma": g, "mu_pl": mu[g], "mu_pl_lm": polished.get(g),
                     "mu_ref": mu_ref,
                     "abs_err_pl": abs(mu[g] - mu_ref),
                     "abs_err_pl_lm": (abs(polished[g] - mu_ref)
                                       if g in polished else None)})
        print(json.dumps(rows[-1]), flush=True)

    section = {
        "note": "PL-PINN-R with the numeric sine-series base "
                "(physics/numeric.py): γ=0 linear Dirichlet eigenstate as "
                "base, q-scaled perturbation + rebased Δγ=%g continuation + "
                "per-checkpoint LM polish — the PL family reaching the "
                "DELOCALIZED lattice ground state that the hermite base "
                "cannot (branch analysis above)" % args.dgamma,
        "rows": rows,
        "max_abs_err_pl_lm": max(r["abs_err_pl_lm"] for r in rows
                                 if r["abs_err_pl_lm"] is not None),
        "epochs_per_gamma": args.epochs,
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(args.dir, "summary.json")
    summary = {}
    if os.path.exists(path):
        with open(path) as f:
            summary = json.load(f)
    summary["plpinn_numeric_base"] = section
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"max_abs_err_pl_lm": section["max_abs_err_pl_lm"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
