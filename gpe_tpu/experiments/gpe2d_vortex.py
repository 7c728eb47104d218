"""Rotating-frame vortex experiment — BASELINE.json config #5: 2D GPE with
the ΩL_z term, complex ψ, vortex states via distillation + LM polish.

Run: python -m gpe_tpu.experiments.gpe2d_vortex [--omegas 0.0 0.7 0.9]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--gamma", type=float, default=50.0)
    ap.add_argument("--omegas", type=float, nargs="*", default=[0.0, 0.7, 0.9])
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--fit-epochs", type=int, default=12000)
    ap.add_argument("--lbfgs-steps", type=int, default=800)
    # 60 LM steps left the net at pde_loss ~1e-3 / μ err 2.7e-2 at Ω=0.7
    # (round-2 committed run) — the complex residual converges slower than
    # the real lattice one (5e-6 at the same step count)
    ap.add_argument("--polish-steps", type=int, default=240)
    # sin/siren + Sobolev (H¹) distill is the round-4 default: the tanh
    # value-only distill floors at fit MSE ~2e-6 on phase-winding fields
    # (runs/gpe2d_vortex/ab_siren.json — SIREN reaches 1e-7 at equal budget)
    ap.add_argument("--activation", default="sin")
    ap.add_argument("--init-scheme", default="siren")
    ap.add_argument("--w0", type=float, default=3.0)
    ap.add_argument("--no-sobolev", action="store_true")
    ap.add_argument("--no-config-cache", action="store_true",
                    help="ignore config_oracle_cache.npz and rebuild the "
                         "oracle at --n (the pre-round-5 mixed-config row)")
    ap.add_argument("--out", default="runs/gpe2d_vortex")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    from gpe_tpu.models import mlp
    from gpe_tpu.rotating import RotatingSpec, train_rotating_vortex

    os.makedirs(args.out, exist_ok=True)
    results = []
    t0 = time.time()
    for omega in args.omegas:
        spec = RotatingSpec(n_points=args.n,
                            layers=(2, args.width, args.width, args.width, 2),
                            activation=args.activation,
                            init_scheme=args.init_scheme, w0=args.w0,
                            gamma=args.gamma, omega=omega)
        # Ω=0.9 is multi-stable (n=128 lands on the superseded 9-vortex
        # state; grid convergence selects 7 vortices at n≥192 with lower
        # energy — config_oracle_table.json). Distill from the CONVERGED
        # lowest-energy configuration's finest cached oracle ψ instead of
        # rebuilding a fresh n=128 oracle (VERDICT r4 #3).
        target, target_src = None, None
        cache_path = os.path.join(args.out, "config_oracle_cache.npz")
        table_path = os.path.join(args.out, "config_oracle_table.json")
        if (not args.no_config_cache and omega == 0.9 and args.gamma == 50.0
                and os.path.exists(cache_path) and os.path.exists(table_path)):
            from gpe_tpu.validate.rotating import regrid_psi
            with open(table_path) as f:
                table = json.load(f)
            cache = np.load(cache_path)
            name = min(table, key=lambda k: table[k]["E_star"])
            psi_o = cache[f"{name}_psi_re"] + 1j * cache[f"{name}_psi_im"]
            x_dst = np.linspace(spec.lb, spec.ub, args.n)
            target = (regrid_psi(psi_o, cache[f"{name}_x"], x_dst),
                      float(cache[f"{name}_mu"]), float(cache[f"{name}_lz"]))
            target_src = {"config": name,
                          "oracle_n": int(cache[f"{name}_x"].shape[0]),
                          "mu_star": target[1],
                          "E_star": table[name]["E_star"]}
            print(f"omega=0.9: distilling from cached {name} oracle "
                  f"(n={target_src['oracle_n']}, mu*={target[1]:.6f})",
                  flush=True)
        t1 = time.time()
        res = train_rotating_vortex(spec, fit_epochs=args.fit_epochs,
                                    lbfgs_steps=args.lbfgs_steps,
                                    polish_steps=args.polish_steps,
                                    polish_cg_iters=100, target=target,
                                    sobolev=not args.no_sobolev,
                                    sobolev_n=128, verbose=True)
        row = {"omega": omega, "mu_net": res.mu, "mu_grid": res.mu_grid,
               "abs_err": abs(res.mu - res.mu_grid), "lz_net": res.lz,
               "lz_grid": res.lz_grid, "n_vortices": res.n_vortices,
               "pde_loss": res.pde_loss, "fit_mse": res.fit_mse,
               "wall_s": round(time.time() - t1, 1)}
        if target_src is not None:
            row["oracle_source"] = target_src
        results.append(row)
        print(json.dumps(row), flush=True)

        # density + phase plot of the net's wavefunction
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            batch_x = np.linspace(spec.lb, spec.ub, args.n)
            from gpe_tpu.rotating import make_rotating_batch
            batch = make_rotating_batch(spec)
            v = np.asarray(mlp.mlp_apply(res.params, batch["x"],
                                         spec.activation))
            psi = (v[:, 0] + 1j * v[:, 1]).reshape(args.n, args.n)
            fig, axes = plt.subplots(1, 2, figsize=(9, 4))
            axes[0].imshow(np.abs(psi).T ** 2, origin="lower",
                           extent=[spec.lb, spec.ub, spec.lb, spec.ub])
            axes[0].set_title(f"|ψ|²  Ω={omega}")
            axes[1].imshow(np.angle(psi).T, origin="lower", cmap="twilight",
                           extent=[spec.lb, spec.ub, spec.lb, spec.ub])
            axes[1].set_title("arg ψ")
            fig.savefig(os.path.join(args.out, f"vortex_omega{omega:g}.png"),
                        dpi=130, bbox_inches="tight")
            plt.close(fig)
        except Exception as e:
            print(f"plotting failed: {e}")

    # merge with the committed summary: a targeted re-run (e.g. --omegas 0.9
    # re-distilling from the converged cached oracle) must not drop the
    # other Ω rows from the flagship table
    sum_path = os.path.join(args.out, "summary.json")
    if os.path.exists(sum_path):
        with open(sum_path) as f:
            prev = json.load(f)
        if prev.get("gamma") == args.gamma:
            fresh = {r["omega"] for r in results}
            results = sorted(
                [r for r in prev.get("results", []) if r["omega"] not in fresh]
                + results, key=lambda r: r["omega"])
    summary = {"config": "BASELINE#5 rotating-frame vortex states",
               "gamma": args.gamma, "results": results,
               "total_wall_s": round(time.time() - t0, 1)}
    with open(sum_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"summary": "written", "wall_s": summary["total_wall_s"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
