"""Two-stage β→γ continuation (reference D7: train_gpe_model_two_stage,
final/refine/test_perturbing_gamma_and_beta.py:200-484).

Stage 1: ramp the potential scale β (γ=0), warm-starting each step.
Stage 2: hold β at β_max, ramp the interaction strength γ.
Both stages share the single-step trainer; the PL-PINN q-scaled perturbation
ansatz and early-stop semantics are identical to the γ-only driver.

TPU design: β enters by scaling the precomputed potential array inside the
loss (a traced scalar multiply), so BOTH stages reuse one compiled step — the
entire two-stage sweep is two Python loops over a single XLA executable.
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


class TwoStageResult(NamedTuple):
    mu_beta: list            # stage 1: [(beta, mu)]
    mu_gamma: list           # stage 2: [(gamma, mu)]
    params: any              # final best params
    history: dict            # {("beta", b) | ("gamma", g): {"loss","mu"}}
    epochs: dict


def _beta_scaled_loss(spec: GPESpec):
    """Wrap the spec loss so the traced scalar is (β, γ): V_eff = β·V."""
    inner = make_loss_fn(spec)

    def loss_fn(params, batch, beta_gamma, scale, axis_name=None):
        beta, gamma = beta_gamma
        b = dict(batch)
        b["V"] = beta * batch["V"]
        return inner(params, b, gamma, scale, axis_name=axis_name)

    return loss_fn


def train_two_stage(spec: GPESpec, beta_values, gamma_values, mode: int = 0,
                    epochs: int = 5001, tol: float = 1e-5, patience: int = 2000,
                    perturb_const: float = 0.01, lr: float = 1e-3, seed: int = 0,
                    pretrain_epochs: int = 2000, check_every: int = 512,
                    verbose: bool = False) -> TwoStageResult:
    beta_values = sorted(float(b) for b in beta_values)
    gamma_values = sorted(float(g) for g in gamma_values)
    loss_fn = _beta_scaled_loss(spec)
    batch = make_batch(spec, mode)

    params = mlp.init_mlp(jax.random.PRNGKey(seed), spec.layers, "xavier_uniform")
    target = np.asarray(base_triple(spec, mode, batch["x"]).value)
    params, _ = pretrain_to_base(params, batch["x"], target, spec.activation,
                                 epochs=pretrain_epochs)
    normal_const = float(jnp.max(mlp.mlp_apply(params, batch["x"], spec.activation)))
    scale = perturb_const / normal_const

    history, eps = {}, {}
    opt = make_optimizer("adam", cosine_warm_restarts(lr, 200, 2, 1e-6),
                         clip_norm=1.0)   # one object → one jit cache entry

    def run_step(beta, gamma, key):
        nonlocal params
        res = fit(loss_fn, opt, params, batch, jnp.array([beta, gamma], jnp.float32),
                  scale, epochs=epochs, tol=tol, patience=patience,
                  check_every=check_every)
        params = res.params
        history[key] = {"loss": res.loss_history, "mu": res.mu_history}
        eps[key] = res.epochs_run
        if verbose:
            print(f"{key}: μ={res.mu:.6f} loss={res.best_loss:.3e} ep={res.epochs_run}")
        return res.mu_best

    mu_beta = [(b, run_step(b, 0.0, ("beta", b))) for b in beta_values]
    beta_max = beta_values[-1] if beta_values else 1.0
    mu_gamma = [(g, run_step(beta_max, g, ("gamma", g))) for g in gamma_values]

    return TwoStageResult(mu_beta, mu_gamma, jax.tree.map(np.asarray, params),
                          history, eps)
