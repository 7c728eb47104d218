"""CLI experiment runner: `python -m gpe_tpu.experiments.run <name> [options]`.

The reference has no CLI (constants in __main__ blocks, SURVEY.md §5); this
exposes every registered experiment with train-or-load bundle semantics,
error tables vs exact/oracle eigenvalues, and the plotting suite.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def _plot_wavefunctions_from_bundle(cfg, bundle, out_dir, viz):
    """F1: per-(mode, γ) complete-solution wavefunction grid, reconstructed
    from the bundle's per-γ best params (1D only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gpe_tpu.models import mlp
    from gpe_tpu.models.ansatz import box_sine_factor
    from gpe_tpu.train.problem import make_batch

    spec = cfg.spec
    if spec.dim != 1 or not bundle["params_by_mode"]:
        return
    const = bundle["constant_history"]
    u_by = {}
    b = None
    for mode, by_g in bundle["params_by_mode"].items():
        if not by_g:
            continue
        b = make_batch(spec, mode)
        scale = (cfg.perturb_const / const[mode]
                 if spec.use_perturbation else 1.0)
        gs = sorted(by_g)
        sel = gs[::max(1, len(gs) // 6)]
        u_by[mode] = {}
        for g in sel:
            p = jax.tree.map(jnp.asarray, by_g[g])
            v = mlp.mlp_apply(p, b["x"], spec.activation) * scale
            if spec.hard_bc:
                v = v * box_sine_factor(spec.lb, spec.ub)(b["x"]).value
            if spec.use_perturbation:
                v = b["base_val"] + v
            u_by[mode][g] = np.asarray(v)
    if u_by and b is not None:
        viz.plot_wavefunctions(np.asarray(b["x"][:, 0]), u_by, out_dir)


def _emit(out_dir, records):
    """Persist the run's printed JSON record(s) as <out_dir>/summary.json so
    every algorithm branch leaves a committable artifact (the reference keeps
    equivalent evidence as committed CSVs, SURVEY.md §2.E4)."""
    path = os.path.join(out_dir, "summary.json")
    with open(path, "w") as f:
        json.dump(records if len(records) != 1 else records[0], f, indent=2,
                  default=str)


def main(argv=None):
    ap = argparse.ArgumentParser(description="gpe_tpu experiment runner")
    ap.add_argument("name", help="experiment name (see --list)")
    ap.add_argument("--list", action="store_true", help="list experiments and exit")
    ap.add_argument("--train", action="store_true", help="force fresh training")
    ap.add_argument("--out", default="runs", help="output directory")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--modes", type=int, nargs="*", default=None)
    ap.add_argument("--gammas", type=float, nargs="*", default=None)
    ap.add_argument("--betas", type=float, nargs="*", default=None)
    ap.add_argument("--pretrain", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--plots", action="store_true", help="regenerate plots only")
    ap.add_argument("--lbfgs-steps", type=int, default=None,
                    help="helmholtz: L-BFGS polish steps (default 100)")
    ap.add_argument("--lm-steps", type=int, default=None,
                    help="helmholtz: LM polish steps (default 120; the LM/CG "
                         "polish dominates wall time — smoke runs want ~5)")
    args = ap.parse_args(argv)

    # one function-scoped jax import: a branch-local `import jax` would make
    # `jax` local to main() and UnboundLocalError every other branch that
    # touches it (bit the helmholtz branch when run without --cpu)
    import jax
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")

    from gpe_tpu.experiments.configs import EXPERIMENTS
    from gpe_tpu.io import load_bundle, save_bundle
    from gpe_tpu.train import train_plpinn
    from gpe_tpu.train.two_stage import train_two_stage
    from gpe_tpu.train.compare import compare_methods, train_multiple_runs
    from gpe_tpu import viz

    if args.name == "list" or args.list:
        for k, v in EXPERIMENTS.items():
            print(f"{k:32s} algo={v.algorithm:10s} modes={v.modes} "
                  f"γ∈[{v.gamma_values[0]:g},{v.gamma_values[-1]:g}]×{len(v.gamma_values)}")
        return 0

    cfg = EXPERIMENTS[args.name]
    if args.epochs is not None:
        cfg = dataclasses.replace(cfg, epochs=args.epochs)
    if args.modes is not None:
        cfg = dataclasses.replace(cfg, modes=tuple(args.modes))
    if args.gammas is not None:
        cfg = dataclasses.replace(cfg, gamma_values=tuple(args.gammas))
    if args.betas is not None:
        cfg = dataclasses.replace(cfg, beta_values=tuple(args.betas))
    if args.pretrain is not None:
        cfg = dataclasses.replace(cfg, pretrain_epochs=args.pretrain)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)

    out_dir = os.path.join(args.out, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    bundle_path = os.path.join(out_dir, "bundle.pkl")

    records = []

    def emit(obj):
        print(json.dumps(obj, default=str))
        records.append(obj)

    t0 = time.time()
    if cfg.algorithm == "plpinn":
        mesh = None
        if cfg.use_mesh:
            from gpe_tpu.parallel import make_mesh
            mesh = make_mesh()
            print(f"mesh: {len(mesh.devices.flat)} devices, "
                  f"{cfg.spec.n_points ** cfg.spec.dim} collocation points "
                  f"sharded on axis {mesh.axis_names[0]!r}")
        polished = None
        if (args.train or not os.path.exists(bundle_path)) and not args.plots:
            res = train_plpinn(cfg.spec, cfg.gamma_values, cfg.modes,
                               epochs=cfg.epochs, tol=cfg.tol, patience=cfg.patience,
                               perturb_const=cfg.perturb_const, lr=cfg.lr,
                               seed=cfg.seed, pretrain_epochs=cfg.pretrain_epochs,
                               rebase=cfg.rebase, mesh=mesh,
                               lm_polish=cfg.lm_polish, verbose=True)
            polished = res.polished
            save_bundle(bundle_path, res, cfg.spec)
        bundle = load_bundle(bundle_path)
        viz.use_publication_style()
        viz.plot_mu_vs_gamma(bundle["mu_table"], out_dir)
        viz.plot_loss_history(bundle["training_history"], out_dir)
        viz.plot_epochs_heatmap(bundle["epochs_history"], out_dir)
        try:
            _plot_wavefunctions_from_bundle(cfg, bundle, out_dir, viz)
        except Exception as e:       # plotting must never fail a run
            print(f"wavefunction plot skipped: {e}")
        extra = {}
        if mesh:
            extra["mesh_devices"] = len(mesh.devices.flat)
        if polished:
            extra["lm_polished"] = {
                m: {k: v for k, v in pol.items()
                    if k not in ("params", "base_val")}
                for m, pol in polished.items()}
            polished = extra["lm_polished"]
            # opportunistic oracle error for the 2D harmonic flagship family
            if (cfg.spec.dim == 2 and cfg.spec.potential == "harmonic"
                    and not cfg.spec.hard_bc):
                try:
                    import numpy as np

                    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe
                    a = dict(cfg.spec.potential_kwargs).get("a", 1.0)
                    x1 = np.linspace(cfg.spec.lb, cfg.spec.ub, 384)
                    X, Y = np.meshgrid(x1, x1, indexing="ij")
                    for m, pol in polished.items():
                        mu_ref, _ = imaginary_time_gpe(
                            a * (X**2 + Y**2), x1[1] - x1[0],
                            float(pol["gamma"]), kinetic=cfg.spec.kinetic,
                            p=cfg.spec.p, tau=2e-3, richardson=2)
                        pol["mu_ref"] = float(mu_ref)
                        pol["mu_abs_err"] = abs(pol["mu"] - float(mu_ref))
                except Exception as e:
                    print(f"oracle eval skipped: {e}")
        emit({"experiment": cfg.name,
              "mu_table_tail": {str(m): v[-1] for m, v in bundle["mu_table"].items()},
              **extra,
              "wall_s": round(time.time() - t0, 1)})
    elif cfg.algorithm == "two_stage":
        res = train_two_stage(cfg.spec, cfg.beta_values, cfg.gamma_values,
                              epochs=cfg.epochs, tol=cfg.tol, patience=cfg.patience,
                              perturb_const=cfg.perturb_const, lr=cfg.lr,
                              seed=cfg.seed, verbose=True)
        emit({"experiment": cfg.name, "mu_beta": res.mu_beta,
              "mu_gamma": res.mu_gamma,
              "wall_s": round(time.time() - t0, 1)})
    elif cfg.algorithm == "beta_sweep":
        from gpe_tpu.train.beta_sweep import train_beta_sweep
        if args.train or not os.path.exists(bundle_path):
            res = train_beta_sweep(cfg.spec, cfg.beta_values,
                                   gamma=cfg.gamma_values[0], modes=cfg.modes,
                                   epochs=cfg.epochs, tol=cfg.tol,
                                   patience=cfg.patience,
                                   perturb_const=cfg.perturb_const, lr=cfg.lr,
                                   seed=cfg.seed,
                                   pretrain_epochs=cfg.pretrain_epochs,
                                   verbose=True)
            save_bundle(bundle_path, res, cfg.spec)
        bundle = load_bundle(bundle_path)
        viz.use_publication_style()
        viz.plot_mu_vs_gamma(bundle["mu_table"], out_dir, "mu_vs_beta.png",
                             every=1, xlabel="β")
        viz.plot_epochs_heatmap(bundle["epochs_history"], out_dir,
                                "epochs_vs_beta_heatmap.png", xlabel="β")
        viz.plot_loss_history(bundle["training_history"], out_dir)
        emit({"experiment": cfg.name,
              "mu_table_tail": {str(m): v[-1] for m, v in bundle["mu_table"].items()},
              "wall_s": round(time.time() - t0, 1)})
    elif cfg.algorithm == "p_ramp":
        from gpe_tpu.train.p_ramp import train_p_ramp
        res = train_p_ramp(cfg.spec, cfg.p_values, cfg.gamma_values[0],
                           mode=cfg.modes[0], epochs=cfg.epochs, tol=cfg.tol,
                           patience=cfg.patience, lr=cfg.lr, seed=cfg.seed,
                           pretrain_epochs=cfg.pretrain_epochs, verbose=True)
        emit({"experiment": cfg.name, "mu_table": res.mu_table,
              "wall_s": round(time.time() - t0, 1)})
    elif cfg.algorithm == "helmholtz":
        from gpe_tpu.experiments.configs import _helmholtz_specs
        from gpe_tpu.helmholtz.problem import train_helmholtz
        # accuracy-critical fit: bf16-class default matmuls cap the
        # achievable MAE around 1e-3 on TPU (same rationale as paper_tables)
        jax.config.update("jax_default_matmul_precision", "highest")
        hspec = _helmholtz_specs()[cfg.name]
        res = train_helmholtz(
            hspec, epochs=cfg.epochs, lr=cfg.lr, seed=cfg.seed,
            lbfgs_steps=(100 if args.lbfgs_steps is None else args.lbfgs_steps),
            lm_steps=(120 if args.lm_steps is None else args.lm_steps))
        emit({"experiment": cfg.name, "k": res.k,
              "test_mae": res.test_mae,
              "interior_mse": res.interior_mse,
              "k_error": res.k_error,
              "wall_s": round(time.time() - t0, 1)})
    elif cfg.algorithm == "deflation":
        from gpe_tpu.train.deflation import train_deflation
        res = train_deflation(cfg.spec, cfg.gamma_values[0],
                              n_modes=len(cfg.modes), epochs=cfg.epochs,
                              lr=cfg.lr, seed=cfg.seed, orth_weight=500.0,
                              polish_steps=60, verbose=True)
        emit({"experiment": cfg.name, "mu_table": res.mu_table,
              "wall_s": round(time.time() - t0, 1)})
    elif cfg.algorithm == "cross_potential":
        # F6 (mode_0_loss_for_all_potentials.py:41-138): train-or-load a quick
        # mode-0 γ-ramp per potential family, overlay the γ=0 loss curves
        from dataclasses import replace as _replace
        from gpe_tpu.experiments.configs import _PAPER_1D
        fams = {
            "harmonic": _PAPER_1D,
            "box": _replace(_PAPER_1D, lb=0.0, ub=1.0, potential="box",
                            basis="box", hard_bc=True),
            "gravity_well": _replace(_PAPER_1D, lb=0.0, ub=35.0,
                                     potential="linear", basis="airy"),
            "gaussian": _replace(_PAPER_1D, potential="gaussian"),
        }
        loss_by_pot = {}
        for label, fspec in fams.items():
            bpath = os.path.join(out_dir, f"{label}_bundle.pkl")
            if args.train or not os.path.exists(bpath):
                res = train_plpinn(fspec, cfg.gamma_values, (0,),
                                   epochs=cfg.epochs, tol=cfg.tol,
                                   patience=cfg.patience,
                                   perturb_const=cfg.perturb_const, lr=cfg.lr,
                                   seed=cfg.seed,
                                   pretrain_epochs=cfg.pretrain_epochs,
                                   verbose=True)
                save_bundle(bpath, res, fspec)
            b = load_bundle(bpath)
            g0 = sorted(b["training_history"][0])[0]
            loss_by_pot[label] = b["training_history"][0][g0]["loss"]
            emit({"potential": label,
                  "mu_final": b["mu_table"][0][-1],
                  "gamma0_final_loss": float(loss_by_pot[label][-1])})
        viz.use_publication_style()
        viz.plot_mode0_cross_potential(loss_by_pot, out_dir, smooth=9)
    elif cfg.algorithm == "optimizer_sweep":
        # reference D3+D4: the curriculum η-ramp trained once per optimizer in
        # the zoo (src/gross_pitaevskii_1D_Different_Optimizers.py:982-998)
        from gpe_tpu.train.curriculum import train_curriculum
        sweep = {}
        for opt_name in cfg.optimizers:
            res = train_curriculum(cfg.spec, cfg.gamma_values,
                                   mode=cfg.modes[0], epochs=cfg.epochs,
                                   lr=cfg.lr, seed=cfg.seed,
                                   optimizer=opt_name, verbose=True)
            sweep[opt_name] = res
            emit({"optimizer": opt_name,
                  "mu_table": [[e, m] for e, m in res.mu_table]})
        viz.use_publication_style()
        viz.plot_method_comparison(
            {o: r.history_by_eta[max(r.history_by_eta)]["loss"]
             for o, r in sweep.items()},
            out_dir, "optimizer_comparison.png")
    elif cfg.algorithm == "relobralo":
        import jax
        from gpe_tpu.train.balanced import fit_relobralo
        from gpe_tpu.train.problem import init_params, make_batch
        batch = make_batch(cfg.spec, cfg.modes[0])
        params = init_params(cfg.spec, jax.random.PRNGKey(cfg.seed))
        for g in cfg.gamma_values:
            res = fit_relobralo(cfg.spec, params, batch, g, epochs=cfg.epochs,
                                lr=cfg.lr, seed=cfg.seed)
            params = res.params
            emit({"gamma": g, "mu": res.mu, "loss": res.best_loss,
                  "lambdas": dict(zip(res.term_names,
                                      res.lambda_history[-1].tolist()))})
    elif cfg.algorithm == "fit":
        # single-model training per γ (warm-started), honoring spec.weighting /
        # objective — the path for self-adaptive, anti-trivial, and Riesz runs
        import jax
        from gpe_tpu.train import fit, make_optimizer
        from gpe_tpu.train.problem import init_params, make_batch, make_loss_fn
        batch = make_batch(cfg.spec, cfg.modes[0])
        loss_fn = make_loss_fn(cfg.spec)
        params = init_params(cfg.spec, jax.random.PRNGKey(cfg.seed))
        opt = make_optimizer("adam", cfg.lr, clip_norm=1.0)
        from gpe_tpu.train.deflation import _normalized_mu
        for g in cfg.gamma_values:
            res = fit(loss_fn, opt, params, batch, g, 1.0, epochs=cfg.epochs,
                      tol=cfg.tol, patience=cfg.patience)
            params = res.final_params
            # report μ of the NORMALIZED best state (the nonlinear-term
            # strength depends on ∫u²=1; the raw Rayleigh quotient drifts
            # with the residual normalization error)
            from gpe_tpu.train.problem import net_params
            mu = float(_normalized_mu(cfg.spec, net_params(res.params), batch, g)) \
                if not cfg.spec.use_perturbation else res.mu_best
            emit({"gamma": g, "mu": mu, "loss": res.best_loss,
                  "epochs": res.epochs_run})
    elif cfg.algorithm == "compare":
        if cfg.n_runs > 1:
            # reference success thresholds: PL 1e-11, vanilla 1e-5
            # (plot_box_potential_at_ground_state_multiple_runs.py:1140-1146)
            thr = {"pl_pinn": 1e-11, "vanilla": 1e-5}
            # key by (method, gamma): a bare method key would silently keep
            # only the last gamma's stats on multi-gamma configs
            stats = {(f"{m}_g{g:g}" if len(cfg.gamma_values) > 1 else m):
                     train_multiple_runs(cfg.spec, g, n_runs=cfg.n_runs,
                                         use_perturbation=(m == "pl_pinn"),
                                         epochs=cfg.epochs, tol=cfg.tol,
                                         patience=cfg.patience,
                                         success_threshold=thr[m])
                     for g in cfg.gamma_values for m in ("pl_pinn", "vanilla")}
            summary = {k: {"mu_median": v["mu_median"], "mu_std": v["mu_std"],
                           "mu_runs": [float(x) for x in v["mu_runs"]],
                           "epochs_run": [int(x) for x in v["epochs_run"]]}
                       for k, v in stats.items()}
            with open(os.path.join(out_dir, "multirun_stats.json"), "w") as f:
                json.dump(summary, f, indent=2)
            emit({k: {"mu_median": v["mu_median"], "mu_std": v["mu_std"]}
                  for k, v in summary.items()})
        else:
            for g in cfg.gamma_values:
                out = compare_methods(cfg.spec, g, epochs=cfg.epochs, tol=cfg.tol,
                                      patience=cfg.patience)
                emit({"gamma": g, **{m: {"mu": d["mu"], "loss": d["best_loss"]}
                                     for m, d in out.items()}})
    elif cfg.algorithm == "deeponet":
        # B6 end-to-end: train the V↦ψ operator on a sampled potential
        # family, then evaluate generalization on HELD-OUT potentials vs the
        # f64 FDM oracle (reference notebook cells 9, 11)
        import numpy as np

        from gpe_tpu.deeponet.model import (DeepONetSpec, evaluate_deeponet,
                                            train_deeponet)
        dspec = DeepONetSpec(p=cfg.spec.p if cfg.spec else 3.0)
        gamma = cfg.gamma_values[0]
        res = train_deeponet(dspec, gamma=gamma, epochs=cfg.epochs,
                             n_functions=64, seed=cfg.seed)
        # held-out β grid: strictly between training samples, incl. mild
        # extrapolation at both ends
        test_betas = [0.45, 0.6, 0.77, 0.93, 1.11, 1.34, 1.58, 1.83, 2.1]
        rows, u_pred, x = evaluate_deeponet(dspec, res.params, test_betas,
                                            gamma)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            viz.use_publication_style()
            fig, axes = plt.subplots(1, 2, figsize=(11, 4))
            axes[0].plot([r["beta"] for r in rows],
                         [r["mu_ref"] for r in rows], "k-", label="FDM oracle")
            axes[0].plot([r["beta"] for r in rows],
                         [r["mu_pred"] for r in rows], "o", ms=5,
                         label="DeepONet")
            axes[0].set_xlabel(r"$\beta$"); axes[0].set_ylabel(r"$\mu$")
            axes[0].legend(); axes[0].set_title("held-out potentials")
            for i in (0, len(rows) // 2, len(rows) - 1):
                dxg = x[1] - x[0]
                psi = u_pred[i] / np.sqrt(np.sum(u_pred[i] ** 2) * dxg)
                axes[1].plot(x, np.abs(psi),
                             label=rf"$\beta$={rows[i]['beta']:.2f}")
            axes[1].set_xlabel("x"); axes[1].set_ylabel(r"$|\psi|$")
            axes[1].legend()
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, "deeponet_heldout.png"), dpi=200)
            plt.close(fig)
        except Exception as e:
            print(f"deeponet plot skipped: {e}")
        interp = [r for r in rows if 0.5 <= r["beta"] <= 2.0]
        extrap = [r for r in rows if not (0.5 <= r["beta"] <= 2.0)]
        emit({"experiment": cfg.name, "gamma": gamma,
              "train_mu_range": [float(res.mu_per_fn.min()),
                                 float(res.mu_per_fn.max())],
              "heldout": rows,
              # unseen potentials INSIDE the training family range vs mild
              # extrapolation beyond it — the operator interpolates far
              # better than it extrapolates, report both
              "interp_max_mu_err": max(r["mu_abs_err"] for r in interp),
              "interp_max_psi_l2": max(r["psi_l2_err"] for r in interp),
              "extrap_max_mu_err": (max(r["mu_abs_err"] for r in extrap)
                                    if extrap else None),
              "wall_s": round(time.time() - t0, 1)})
    else:
        raise SystemExit(f"unknown algorithm {cfg.algorithm}")
    if records:
        _emit(out_dir, records)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
