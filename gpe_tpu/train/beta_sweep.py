"""Potential-strength (β) continuation sweeps — reference D8:
`train_gpe_model(gamma, beta_values, ...)` in the three vary-β drivers
(final/refine/vary_potential_parameter_harmonic.py:344-557,
 vary_potential_parameter_gravity_well.py, and the box→gaussian interpolation
 vary_potential_parameter_box_and_gaussian.py:141-151,227 — β ramps a gaussian
 bump V = β·exp(−x²/2) inside a hard-walled box whose base eigenfunctions stay
 the box sines).

Semantics preserved:
- β ramp sorted ascending; warm start across β from the previous best state;
- PL-PINN ansatz: pretrain to the analytic base at the first β, capture
  normal_const once, perturbation scale q/normal_const thereafter;
- per-(mode, β): Adam + cosine-warm-restarts + grad clip 1.0, early stop
  (tol/patience), best-state restore;
- outputs: μ-vs-β table, epochs-to-converge per β, loss histories — the data
  behind the reference's μ-vs-β curves and epochs heatmaps (:1110-1183).

TPU design: β enters by rescaling the precomputed batch["V"] on the host
(same shapes → the compiled chunked scan is reused across the whole ramp and
across β families; zero recompilation inside the sweep).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.train.loop import fit
from gpe_tpu.train.optimizers import make_optimizer
from gpe_tpu.train.pretrain import pretrain_to_base
from gpe_tpu.train.problem import GPESpec, base_triple, make_batch, make_loss_fn
from gpe_tpu.train.schedules import cosine_warm_restarts


class BetaSweepResult(NamedTuple):
    params_by_mode: dict        # mode -> {beta: best params}
    mu_table: dict              # mode -> list[(beta, mu)]
    training_history: dict      # mode -> {beta: {"loss", "mu"}}
    constant_history: dict      # mode -> normal_const
    epochs_history: dict        # mode -> {beta: epochs_run}


def train_beta_sweep(spec: GPESpec, beta_values, gamma: float = 0.0,
                     modes=(0,), epochs: int = 5001, tol: float = 1e-5,
                     patience: int = 2000, perturb_const: float = 0.01,
                     lr: float = 1e-3, seed: int = 0,
                     pretrain_epochs: int = 2000, check_every: int = 512,
                     keep_params: bool = True,
                     verbose: bool = False) -> BetaSweepResult:
    """β-continuation sweep at fixed γ. The spec's potential is the UNIT
    potential V(x); each β step trains against β·V(x)."""
    beta_values = sorted(float(b) for b in beta_values)
    loss_fn = make_loss_fn(spec)
    from gpe_tpu.train.problem import make_fused_value_and_grad
    fused_vag = make_fused_value_and_grad(spec)

    params_by_mode, mu_table, training_history = {}, {}, {}
    constant_history, epochs_history = {}, {}

    for mi, mode in enumerate(modes):
        batch0 = make_batch(spec, mode)
        V_unit = batch0["V"]
        key = jax.random.PRNGKey(seed + 1000 * mi)
        params = mlp.init_mlp(key, spec.layers, "xavier_uniform")

        if spec.use_perturbation:
            target = np.asarray(base_triple(spec, mode, batch0["x"]).value)
            params, pre_mse = pretrain_to_base(
                params, batch0["x"], target, spec.activation,
                epochs=pretrain_epochs, lr=1e-3)
            if verbose:
                print(f"mode {mode}: pretrain MSE {pre_mse:.3e}")
            normal_const = float(jnp.max(
                mlp.mlp_apply(params, batch0["x"], spec.activation)))
            scale = perturb_const / normal_const
        else:
            normal_const = 1.0
            scale = 1.0
        constant_history[mode] = normal_const

        mus, by_beta_params, by_beta_hist, by_beta_epochs = [], {}, {}, {}
        optimizer = make_optimizer(
            "adam", cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6),
            clip_norm=1.0)
        for beta in beta_values:
            batch = dict(batch0)
            batch["V"] = V_unit * jnp.asarray(beta, V_unit.dtype)
            res = fit(loss_fn, optimizer, params, batch, gamma, scale,
                      epochs=epochs, tol=tol, patience=patience,
                      check_every=check_every, value_and_grad_fn=fused_vag)
            params = res.params          # warm start from restored best state
            mus.append((beta, res.mu_best))
            if keep_params:
                by_beta_params[beta] = jax.tree.map(np.asarray, res.params)
            by_beta_hist[beta] = {"loss": res.loss_history, "mu": res.mu_history}
            by_beta_epochs[beta] = res.epochs_run
            if verbose:
                print(f"mode {mode} β={beta:g}: μ={res.mu:.6f} "
                      f"loss={res.best_loss:.3e} epochs={res.epochs_run}")

        params_by_mode[mode] = by_beta_params
        mu_table[mode] = mus
        training_history[mode] = by_beta_hist
        epochs_history[mode] = by_beta_epochs

    return BetaSweepResult(params_by_mode, mu_table, training_history,
                           constant_history, epochs_history)
