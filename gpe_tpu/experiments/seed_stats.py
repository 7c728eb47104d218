"""Multi-seed statistics for the headline parity families (VERDICT r4 #8).

The reference's comparison protocol is 5 seeds → median±std applied to its
whole table (plot_box_potential_at_ground_state_multiple_runs.py:987-1055);
our committed parity table (runs/reference_parity/parity.md) is single-seed
except for two multirun configs. This experiment runs the PL-PINN and
PL-PINN-R γ-continuation ramps for N seeds (default 6 ⊇ the reference's 5) per mode via the lane-packed
ensemble (train/packed.py): packing the SEED axis costs nothing new —
`train_plpinn_modes_packed(modes=[m]*N, seed=s0)` gives lane i the init key
`s0 + 1000·i` (seeds s0, s0+1000, …), identical base/protocol per lane, and
all N ramps advance in ~N/M kernel invocations (M = lane budget // width).

Per (family, mode, method): per-checkpoint-γ per-seed μ and |Δμ| vs the
committed float64 Newton-FDM oracle values (reuse from the family's
raw_comparison_results.csv — the same numbers the parity table scores
against), the per-seed mean-over-γ |Δμ| (the parity.md cell statistic), and
its across-seed median/std/min/max. Writes runs/seed_stats_<family>.json;
reference_compare.py folds the ± columns into parity.md.

Run (TPU): python -m gpe_tpu.experiments.seed_stats --family p3_harmonic
           python -m gpe_tpu.experiments.seed_stats --family p3_box
CPU smoke: ... --family p3_harmonic --modes 0 --epochs 30 --n-seeds 4
               --interpret
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import time


def _oracle_from_csv(out_dir: str):
    """{(mode, γ) -> μ_ref} from the family's committed raw CSV."""
    ref = {}
    with open(os.path.join(out_dir, "raw_comparison_results.csv"),
              newline="") as f:
        for row in csv.DictReader(f):
            ref[(int(row["Mode"]), float(row["Gamma"]))] = float(row["mu_ref"])
    return ref


def _train_seeds_vmapped(spec, ramp, mode, n_seeds, base_seed, epochs,
                         patience, lr_mode, rebase, perturb_const=0.01,
                         check_every: int = 512, verbose=False):
    """train_plpinn's ramp semantics, vmapped over the SEED axis through
    fit_ensemble — the path for specs the lane-packed kernels cannot take
    (hard-BC box/gaussian). Same per-seed init keys as the packed path
    (base_seed + 1000·i), same pretrain → normal_const → q-scale, warm
    start, tol=0 full-budget best-restore, and (rebase=True) the per-run
    incremental-base fold carried via fit_ensemble(per_run_batch=…).
    Returns {γ: [μ_best per seed]}."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gpe_tpu.models import mlp
    from gpe_tpu.train.loop import fit_ensemble
    from gpe_tpu.train.plpinn import _rebase, ramp_optimizer
    from gpe_tpu.train.pretrain import pretrain_to_base
    from gpe_tpu.train.problem import base_triple, make_batch, make_loss_fn

    batch = make_batch(spec, mode)
    loss_fn = make_loss_fn(spec)
    target = np.asarray(base_triple(spec, mode, batch["x"]).value)
    params_list, scales = [], []
    for i in range(n_seeds):
        p = mlp.init_mlp(jax.random.PRNGKey(base_seed + 1000 * i),
                         spec.layers, "xavier_uniform")
        p, _ = pretrain_to_base(p, batch["x"], target, spec.activation,
                                epochs=2000, lr=1e-3)
        const = float(jnp.max(mlp.mlp_apply(p, batch["x"], spec.activation)))
        scales.append(perturb_const / const)
        params_list.append(p)
    params_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    scale_vec = jnp.asarray(scales, jnp.float32)

    _BASE_KEYS = ("base_val", "base_grad", "base_lap", "base_bval",
                  "base_val_reflect")
    prb = None
    if rebase:  # per-run copies of the (initially shared) base arrays
        prb = {k: jnp.stack([batch[k]] * n_seeds)
               for k in _BASE_KEYS if k in batch}
    optimizer = ramp_optimizer(1e-3, lr_mode)
    out = {}
    for gi, gamma in enumerate(ramp):
        ens = fit_ensemble(loss_fn, optimizer, params_batch, batch, gamma,
                           scale_vec, epochs=epochs, tol=0.0,
                           patience=patience, check_every=check_every,
                           per_run_batch=prb)
        params_batch = jax.tree.map(jnp.asarray, ens.params)  # best restored
        out[float(gamma)] = [float(m) for m in ens.mu_best]
        if verbose:
            print(f"  γ={gamma:g}: μ="
                  + " ".join(f"{m:.5f}" for m in out[float(gamma)]),
                  flush=True)
        if rebase:
            new_p, new_prb = [], {k: [] for k in prb}
            for r in range(n_seeds):
                batch_r = dict(batch)
                for k in prb:
                    batch_r[k] = prb[k][r]
                p_r = jax.tree.map(lambda a, r=r: a[r], params_batch)
                rb_key = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.PRNGKey(base_seed + 1000 * r), 0x5EBA5E),
                    gi)
                batch_r, p_r = _rebase(spec, batch_r, p_r,
                                       float(scale_vec[r]), rb_key)
                for k in new_prb:
                    new_prb[k].append(batch_r[k])
                new_p.append(p_r)
            params_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *new_p)
            prb = {k: jnp.stack(v) for k, v in new_prb.items()}
    return out


def run_seed_stats(family: str, modes=None, n_seeds: int = 6,
                   base_seed: int = 42, epochs: int = 5001,
                   patience: int = 2000, ramp_step: float = 0.5,
                   lr_mode: str = "loss_faithful", interpret: bool = False,
                   out_path: str | None = None, verbose: bool = True):
    import numpy as np
    from gpe_tpu.experiments.paper_tables import _families
    from gpe_tpu.train.packed import (_pick_m, packed_runs_available,
                                      train_plpinn_modes_packed)

    fam = _families()[family]
    spec, checkpoints = fam["spec"], fam["checkpoints"]
    modes = tuple(modes) if modes else fam["modes"]
    # identical ramp construction to paper_tables.run_family (0 → γ_max,
    # signed step handles the attractive family)
    step = fam.get("gamma_step", ramp_step)
    gmax = float(checkpoints[-1])
    n_ramp = int(round(gmax / step))
    ramp = [k * step for k in range(n_ramp + 1)]
    # interpret mode (CPU tests) skips the TPU-backend gate the same way
    # make_packed_value_and_grad(interpret=True) does
    packable = bool(packed_runs_available(spec, n_seeds) if not interpret
                    else (_pick_m(spec.layers, n_seeds) >= 2
                          and not spec.hard_bc))
    ref = _oracle_from_csv(f"runs/comparison_results_{family}")

    cps = [float(g) for g in checkpoints
           if any(abs(float(g) - r) < 1e-9 for r in ramp)]
    out = {"family": family, "n_seeds": n_seeds,
           "seeds": [base_seed + 1000 * i for i in range(n_seeds)],
           "protocol": {"epochs": epochs, "patience": patience,
                        "ramp_step": step, "lr_mode": lr_mode,
                        "checkpoints": cps},
           "modes": {}}
    t0 = time.time()
    for mode in modes:
        per_mode = {}
        for method, rebase in (("PL-PINN", False), ("PL-PINN-R", True)):
            t1 = time.time()
            if packable:
                res = train_plpinn_modes_packed(
                    spec, ramp, modes=[mode] * n_seeds, epochs=epochs,
                    tol=0.0, patience=patience, seed=base_seed,
                    keep_params=False, rebase=rebase, lr_mode=lr_mode,
                    interpret=interpret, verbose=False)
                # mu_table[mode] holds the lanes flattened in ramp order:
                # [(γ0, s0), (γ0, s1), …, (γ0, sN-1), (γ1, s0), …]
                flat = res.mu_table[mode]
                assert len(flat) == len(ramp) * n_seeds
                mu_by_gamma = {}
                for gi, g in enumerate(ramp):
                    chunk = flat[gi * n_seeds:(gi + 1) * n_seeds]
                    assert all(abs(cg - g) < 1e-9 for cg, _ in chunk)
                    mu_by_gamma[float(g)] = [m for _, m in chunk]
            else:  # hard-BC specs (box/gaussian): vmapped seed ensemble
                mu_by_gamma = _train_seeds_vmapped(
                    spec, ramp, mode, n_seeds, base_seed, epochs, patience,
                    lr_mode, rebase, verbose=False)
            rows = []
            per_seed_errs = np.zeros((n_seeds, len(cps)))
            for ci, g in enumerate(cps):
                mus = np.asarray(mu_by_gamma[float(g)])
                errs = np.abs(mus - ref[(mode, float(g))])
                per_seed_errs[:, ci] = errs
                rows.append({"gamma": float(g), "mu_ref": ref[(mode, float(g))],
                             "mu_seeds": mus.tolist(),
                             "abs_err_median": float(np.median(errs)),
                             "abs_err_std": float(np.std(errs))})
            mean_errs = per_seed_errs.mean(axis=1)  # parity cell per seed
            per_mode[method] = {
                "rows": rows,
                "mean_abs_err_per_seed": mean_errs.tolist(),
                "cell_median": float(np.median(mean_errs)),
                "cell_std": float(np.std(mean_errs)),
                "cell_min": float(mean_errs.min()),
                "cell_max": float(mean_errs.max()),
                "wall_s": round(time.time() - t1, 1),
            }
            if verbose:
                print(f"{family} mode {mode} {method}: cell "
                      f"{per_mode[method]['cell_median']:.3e} "
                      f"± {per_mode[method]['cell_std']:.1e} "
                      f"(range {mean_errs.min():.2e}–{mean_errs.max():.2e}, "
                      f"{per_mode[method]['wall_s']}s)", flush=True)
        out["modes"][str(mode)] = per_mode
        # checkpoint after every mode: a queue timeout keeps the completed
        # modes (reference_compare reads whatever modes are present)
        out["partial"] = True
        out["wall_s"] = round(time.time() - t0, 1)
        path = out_path or f"runs/seed_stats_{family}.json"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    out.pop("partial", None)
    out["wall_s"] = round(time.time() - t0, 1)
    path = out_path or f"runs/seed_stats_{family}.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "wall_s": out["wall_s"]}), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="p3_harmonic")
    ap.add_argument("--modes", default=None,
                    help="comma-separated subset (default: family modes)")
    ap.add_argument("--n-seeds", type=int, default=6,
                help="must be divisible by the lane pack M (2 for width 64); 6 (>= the reference's 5) is the default")
    ap.add_argument("--base-seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=5001)
    ap.add_argument("--patience", type=int, default=2000)
    ap.add_argument("--ramp-step", type=float, default=0.5)
    ap.add_argument("--lr-mode", default="loss_faithful")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    modes = ([int(m) for m in args.modes.split(",")] if args.modes else None)
    run_seed_stats(args.family, modes=modes, n_seeds=args.n_seeds,
                   base_seed=args.base_seed, epochs=args.epochs,
                   patience=args.patience, ramp_step=args.ramp_step,
                   lr_mode=args.lr_mode,
                   interpret=args.interpret, out_path=args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
