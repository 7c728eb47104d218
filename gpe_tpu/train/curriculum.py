"""Curriculum / continuation trainer with stacked frozen-base mixing
(reference D3: train_pinn_with_optimizer + update_alpha_beta,
src/gross_pitaevskii_1D_Different_Optimizers.py:492-623,65-71;
src/gross_pitaevskii_1D_Different_Modes.py:184-213).

Semantics: ramp interaction strength η; at each step the complete solution is
ψ_k(x) = ψ_{k−1}(x) + α·net_k(x), where ψ_{k−1} is the FROZEN previous-η
solution (the analytic base at η=0) and α follows the reference's adaptive
schedule α(t) = 2 − β(t), β(t) = max(0.1, β₀·e^(−decay·t)).

TPU design: the collocation grid is fixed, so the frozen stack ψ_{k−1}
flattens into precomputed (value, grad, lap) arrays — each η-step trains
against base *arrays*, not a chain of frozen network evaluations. The α(t)
schedule threads through the compiled scan as a scale_schedule.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.train.loop import fit
from gpe_tpu.train.optimizers import make_optimizer
from gpe_tpu.train.problem import GPESpec, base_triple, make_batch, make_loss_fn


class CurriculumResult(NamedTuple):
    params_by_eta: dict        # eta -> best params
    mu_table: list             # [(eta, mu)]
    history_by_eta: dict       # eta -> {"loss", "mu"}
    epochs_by_eta: dict


def alpha_schedule(beta_init: float = 1.0, decay_rate: float = 1e-3,
                   floor: float = 0.1):
    """Reference update_alpha_beta as a pure epoch→α function."""
    def alpha(epoch):
        t = epoch.astype(jnp.float32) if hasattr(epoch, "astype") else jnp.float32(epoch)
        beta = jnp.maximum(floor, beta_init * jnp.exp(-decay_rate * t))
        return 1.0 + (1.0 - beta)
    return alpha


def train_curriculum(spec: GPESpec, eta_values, mode: int = 0,
                     epochs: int = 3000, lr: float = 1e-3, seed: int = 0,
                     beta_init: float = 1.0, decay_rate: float = 1e-3,
                     tol: float = 0.0, patience: int = 10**9,
                     check_every: int = 512, fresh_net_per_eta: bool = True,
                     optimizer: str = "adam",
                     verbose: bool = False) -> CurriculumResult:
    """η-ramp continuation with frozen-previous-solution stacking.

    `optimizer` selects from the zoo (reference D4 trains this exact ramp
    with each optimizer in its dict-dispatch table)."""
    if not spec.use_perturbation:
        raise ValueError("curriculum training stacks on a base; spec.use_perturbation must be True")
    eta_values = sorted(float(e) for e in eta_values)
    loss_fn = make_loss_fn(spec)
    batch = dict(make_batch(spec, mode))
    sched = alpha_schedule(beta_init, decay_rate)

    key = jax.random.PRNGKey(seed)
    params = mlp.init_mlp(key, spec.layers, "xavier_uniform")

    params_by_eta, mu_table, hist, eps = {}, [], {}, {}
    for k, eta in enumerate(eta_values):
        if fresh_net_per_eta and k > 0:
            key, sub = jax.random.split(key)
            params = mlp.init_mlp(sub, spec.layers, "xavier_uniform")
        opt = make_optimizer(optimizer, lr, clip_norm=1.0)
        res = fit(loss_fn, opt, params, batch, eta, 1.0, epochs=epochs,
                  tol=tol, patience=patience, check_every=check_every,
                  scale_schedule=sched)
        params = res.params
        mu_table.append((eta, res.mu_best))
        params_by_eta[eta] = jax.tree.map(np.asarray, res.params)
        hist[eta] = {"loss": res.loss_history, "mu": res.mu_history}
        eps[eta] = res.epochs_run
        if verbose:
            print(f"η={eta:g}: μ={res.mu:.6f} loss={res.best_loss:.3e}")

        # Freeze ψ_k = base + α_final·net_k into the next step's base arrays.
        alpha_final = float(sched(jnp.asarray(res.epochs_run)))
        n = mlp.mlp_vgl(res.params, batch["x"], spec.activation)
        batch["base_val"] = batch["base_val"] + alpha_final * n.value
        batch["base_grad"] = batch["base_grad"] + alpha_final * n.grad
        batch["base_lap"] = batch["base_lap"] + alpha_final * n.lap
        nb = mlp.mlp_apply(res.params, batch["bx"], spec.activation)
        batch["base_bval"] = batch["base_bval"] + alpha_final * nb

    return CurriculumResult(params_by_eta, mu_table, hist, eps)
