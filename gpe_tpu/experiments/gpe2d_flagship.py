"""Flagship run — BASELINE.json config #3: 2D GPE ground state, harmonic trap,
β(γ)=100, ~50k collocation points. Target: |μ − μ_ref| < 1e-3.

Pipeline: pretrain the net to the linear ground state → γ-continuation with
the spectral-flow distillation solver (train/spectral_flow.py) → report both
the mesh-free μ (net's analytic derivatives) and the spectral μ of the net's
grid values, vs the float64 imaginary-time oracle.

Run: python -m gpe_tpu.experiments.gpe2d_flagship [--n 224] [--width 128]
"""
from __future__ import annotations

import argparse
import json
import time


def psi_errors(params, spec, x1, psi_ref):
    """Wavefunction errors of the net vs the oracle grid solution: evaluate
    the net on the oracle's (finer) grid, L2-normalize with the grid measure,
    sign-align, and report ‖ψ_net − ψ_ref‖_L2 (≈ √∫(Δψ)² dxdy) and max|Δψ|.

    Solution-quality evidence beyond the eigenvalue (the reference's F1/F7
    plots are visual-only; SURVEY.md §4 item 2 uses ψ as a regression target).
    """
    import numpy as np
    import jax.numpy as jnp
    from gpe_tpu.models import mlp

    n = x1.size
    dx = float(x1[1] - x1[0])
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    xy = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1), jnp.float32)
    u = np.asarray(mlp.mlp_apply(params, xy, spec.activation),
                   dtype=np.float64).reshape(n, n)
    u = u / np.sqrt(np.sum(u * u) * dx * dx)
    ref = np.asarray(psi_ref, dtype=np.float64)
    if np.sum(u * ref) < 0:
        u = -u
    diff = u - ref
    l2 = float(np.sqrt(np.sum(diff * diff) * dx * dx))
    return l2, float(np.max(np.abs(diff)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=224, help="grid side (n² points)")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--gammas", type=float, nargs="*",
                    default=[2.0, 5.0, 10.0, 20.0, 35.0, 50.0, 70.0, 100.0])
    ap.add_argument("--outer", type=int, default=200)
    ap.add_argument("--inner", type=int, default=80)
    ap.add_argument("--out", default="runs/gpe2d_flagship")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    # Accuracy-critical path: TPU's default matmul precision is bf16-class,
    # which caps the net-distillation MSE (and hence the mesh-free μ) around
    # 1e-5. Three-pass f32 MXU matmuls restore the f32 ceiling at ~3× GEMM
    # cost — negligible here, decisive for |μ_net − μ_ref| < 1e-3.
    jax.config.update("jax_default_matmul_precision", "highest")

    from gpe_tpu.models import mlp
    from gpe_tpu.train import GPESpec, make_batch, pretrain_to_base
    from gpe_tpu.train.problem import base_triple
    from gpe_tpu.train.spectral_flow import make_spectral_flow_solver
    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe
    from gpe_tpu.io import save_params
    from gpe_tpu import viz

    spec = GPESpec(dim=2, n_points=args.n, layers=(2, args.width, args.width, args.width, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, lb=-8.0, ub=8.0, use_perturbation=False,
                   basis="hermite", nonlinearity="abs_power")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    base = base_triple(GPESpec(dim=2, n_points=args.n, lb=-8.0, ub=8.0,
                               basis="hermite"), 0, batch["x"])
    t0 = time.time()
    params, pre_mse = pretrain_to_base(params, batch["x"], np.asarray(base.value),
                                       spec.activation, epochs=3000, lbfgs_steps=100)
    print(f"pretrain mse {pre_mse:.2e} ({time.time()-t0:.0f}s)", flush=True)

    solver = make_spectral_flow_solver(spec, outer_steps=args.outer,
                                       inner_steps=args.inner, tau=2e-2,
                                       final_inner_steps=4000,
                                       final_lbfgs_steps=400,
                                       polish_steps=60)
    results = []
    for g in args.gammas:
        t1 = time.time()
        res = solver(params, batch, g)
        params = res.params
        results.append({"gamma": g, "mu_net": res.mu, "mu_grid": res.mu_grid,
                        "pde_loss": res.pde_loss, "wall_s": round(time.time() - t1, 1)})
        print(json.dumps(results[-1]), flush=True)

    # float64 oracle on a finer grid
    gmax = args.gammas[-1]
    x1 = np.linspace(-8, 8, 384)
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    mu_ref, psi_ref = imaginary_time_gpe(0.5 * (X**2 + Y**2), x1[1] - x1[0],
                                         gmax, kinetic=0.5, tau=2e-3,
                                         richardson=True)
    psi_l2, psi_max = psi_errors(params, spec, x1, psi_ref)
    summary = {
        "config": "BASELINE#3 2D GPE beta=100 ~50k pts",
        "n_points": args.n ** 2,
        "gamma": gmax,
        "mu_net": results[-1]["mu_net"],
        "mu_grid": results[-1]["mu_grid"],
        "mu_ref": mu_ref,
        "abs_err_net": abs(results[-1]["mu_net"] - mu_ref),
        "abs_err_grid": abs(results[-1]["mu_grid"] - mu_ref),
        "psi_l2_err": psi_l2,
        "psi_max_err": psi_max,
        "target": 1e-3,
        "total_wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)

    import os
    os.makedirs(args.out, exist_ok=True)
    save_params(os.path.join(args.out, "params.pkl"), params)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"ramp": results, "summary": summary}, f, indent=2)
    u = mlp.mlp_apply(params, batch["x"], spec.activation)
    viz.plot_solution_2d(np.asarray(batch["x"]), np.asarray(u), args.out,
                         "flagship_solution.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
