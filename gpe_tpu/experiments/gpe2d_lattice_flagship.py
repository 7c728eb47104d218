"""BASELINE config #4 ground-state run: 2D optical lattice, Dirichlet box.

The PL-PINN perturbation ansatz (hermite Gaussian base) converges to the
LOCALIZED single-well branch of the lattice (see lattice_summary.py) — the
delocalized 3×3-well ground state is a finite density rearrangement away that
a q-scaled perturbation cannot traverse. This run uses the flagship recipe
instead (same as gpe2d_flagship for config #3): distill the float64 Dirichlet
imaginary-time grid state (oracle_cache.npz from lattice_summary.py) into the
direct net per γ, then Levenberg–Marquardt polish of the mesh-free GPE
residual. μ is reported from the net's ANALYTIC forward-Laplacian derivatives
— the oracle seeds the net; the final number is the net's own.

Run AFTER lattice_summary.py:
    python -m gpe_tpu.experiments.gpe2d_lattice_flagship
Updates runs/gpe2d_lattice/summary.json with the ground_state section.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/gpe2d_lattice")
    ap.add_argument("--pretrain-epochs", type=int, default=3000)
    ap.add_argument("--distill-epochs", type=int, default=1500)
    ap.add_argument("--lbfgs-steps", type=int, default=120)
    ap.add_argument("--lm-steps", type=int, default=120)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    # accuracy-critical: bf16-class default matmuls cap μ error ~1e-3
    jax.config.update("jax_default_matmul_precision", "highest")

    from scipy.interpolate import RegularGridInterpolator

    from gpe_tpu.models import mlp
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn
    from gpe_tpu.train.gauss_newton import make_gpe_residual_fn, make_lm_solver
    from gpe_tpu.train.pretrain import pretrain_to_base

    cache = np.load(os.path.join(args.dir, "oracle_cache.npz"))
    gammas = [float(g) for g in cache["gammas"]]
    xi, dx = np.asarray(cache["xi"]), float(cache["dx"])
    lb, ub = float(xi[0] - dx), float(xi[-1] + dx)

    spec = GPESpec(dim=2, lb=lb, ub=ub, n_points=128,
                   layers=(2, 128, 128, 128, 1), activation="shifted_tanh",
                   potential="optical_lattice",
                   potential_kwargs=(("V0", 4.0), ("k", 0.7853981633974483)),
                   basis="hermite", kinetic=0.5, nonlinearity="abs_power",
                   use_perturbation=False)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    rfn = make_gpe_residual_fn(spec)
    xcol = np.asarray(batch["x"])

    # full-grid (with zero Dirichlet boundary) interpolators per γ
    grid = np.concatenate([[lb], xi, [ub]])

    def target_at_collocation(psi_interior):
        full = np.zeros((grid.size, grid.size))
        full[1:-1, 1:-1] = psi_interior
        it = RegularGridInterpolator((grid, grid), full, method="cubic")
        return it(xcol)

    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    lm = None
    rows = []
    t0 = time.time()
    for i, g in enumerate(gammas):
        target = target_at_collocation(np.asarray(cache["psis"][i]))
        epochs = args.pretrain_epochs if i == 0 else args.distill_epochs
        params, mse = pretrain_to_base(params, batch["x"], target,
                                       spec.activation, epochs=epochs,
                                       lbfgs_steps=args.lbfgs_steps)
        if lm is None:
            lm = make_lm_solver(rfn, params, steps=args.lm_steps, cg_iters=80)
        params = lm(params, batch, jnp.float32(g), jnp.float32(1.0)).params
        _, aux = jax.jit(loss_fn)(params, batch, jnp.float32(g),
                                  jnp.float32(1.0))
        mu_net = float(aux["mu"])
        mu_ref = float(cache["mu_refs"][i])
        rows.append({"gamma": g, "distill_mse": float(mse),
                     "mu_net": mu_net, "mu_ref": mu_ref,
                     "abs_err": abs(mu_net - mu_ref),
                     "pde_loss": float(aux["pde"])})
        print(json.dumps(rows[-1]), flush=True)

    section = {
        "note": "direct net, oracle-distilled + LM residual polish (the "
                "flagship recipe); μ from the net's analytic derivatives",
        "rows": rows,
        "max_abs_err": max(r["abs_err"] for r in rows),
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(args.dir, "summary.json")
    summary = {}
    if os.path.exists(path):
        with open(path) as f:
            summary = json.load(f)
    summary["ground_state"] = section
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)

    from gpe_tpu.io import save_params
    save_params(os.path.join(args.dir, "ground_state_params.pkl"), params)
    print(json.dumps({"max_abs_err": section["max_abs_err"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
