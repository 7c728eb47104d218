"""Nonlinearity-power (p) continuation — reference D12:
src/gross_pitaevskii_1D_Different_Optimizers_and_Nonlinearity_Powers.py and
Gross_Pitaevskii_1D_power_Test.ipynb cells 10,20-22: γ fixed, ramp the
nonlinearity power p ∈ {2,3,4,5,...}, warm-starting each p from the previous
p's trained weights (the paper also reports single-p runs at p=4/8/16 —
harmonic_p4/p8/p16 configs; this driver supplies the missing warm-start ramp).

p is a compile-time constant of the Hamiltonian (a static exponent fused into
the residual kernel), so each p gets its own compiled executable — a handful
of compilations for a handful of p values, with the whole epoch loop still a
single chunked scan per p.
"""
from __future__ import annotations

from dataclasses import replace
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


class PRampResult(NamedTuple):
    params_by_p: dict           # p -> best params
    mu_table: list              # [(p, mu)]
    training_history: dict      # p -> {"loss", "mu"}
    epochs_history: dict        # p -> epochs_run


def train_p_ramp(spec: GPESpec, p_values, gamma: float, mode: int = 0,
                 epochs: int = 3001, tol: float = 1e-5, patience: int = 2000,
                 perturb_const: float = 0.01, lr: float = 1e-3, seed: int = 0,
                 pretrain_epochs: int = 2000, check_every: int = 512,
                 verbose: bool = False) -> PRampResult:
    """Ramp the nonlinearity power p at fixed γ, warm-starting across p."""
    p_values = sorted(float(p) for p in p_values)
    batch = make_batch(spec, mode)
    key = jax.random.PRNGKey(seed)
    params = mlp.init_mlp(key, spec.layers, "xavier_uniform")

    if spec.use_perturbation:
        target = np.asarray(base_triple(spec, mode, batch["x"]).value)
        params, _ = pretrain_to_base(params, batch["x"], target,
                                     spec.activation, epochs=pretrain_epochs)
        normal_const = float(jnp.max(
            mlp.mlp_apply(params, batch["x"], spec.activation)))
        scale = perturb_const / normal_const
    else:
        scale = 1.0

    optimizer = make_optimizer(
        "adam", cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6),
        clip_norm=1.0)
    params_by_p, mus, hist, eps = {}, [], {}, {}
    for p in p_values:
        loss_fn = make_loss_fn(replace(spec, p=p))
        res = fit(loss_fn, optimizer, params, batch, gamma, scale,
                  epochs=epochs, tol=tol, patience=patience,
                  check_every=check_every)
        params = res.params              # warm start the next p
        params_by_p[p] = jax.tree.map(np.asarray, res.params)
        mus.append((p, res.mu_best))
        hist[p] = {"loss": res.loss_history, "mu": res.mu_history}
        eps[p] = res.epochs_run
        if verbose:
            print(f"p={p:g}: μ={res.mu:.6f} loss={res.best_loss:.3e} "
                  f"epochs={res.epochs_run}")

    return PRampResult(params_by_p, mus, hist, eps)
