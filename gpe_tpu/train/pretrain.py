"""Analytical-solution pretraining: supervised fit of the raw network output to
the linear base eigenfunction (reference D2: pretrain_on_analytical_solution,
harmonic_pinn_simulation.py:650-701 — Adam phase, then LBFGS refinement for the
last `lbfgs_steps`, early stop at MSE < 1e−12).

Both phases run as jitted `lax.scan`s; the LBFGS phase uses optax.lbfgs with
its zoom linesearch (bounded iterations → static shapes under jit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from gpe_tpu.models import mlp


@partial(jax.jit, static_argnames=("activation", "steps", "lr", "apply_fn"))
def _adam_phase(params, x, target, activation, steps, lr, apply_fn=None):
    opt = optax.adam(lr)
    apply = apply_fn or mlp.mlp_apply

    def loss_fn(p):
        return jnp.mean((apply(p, x, activation) - target) ** 2)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=steps)
    return params, losses


@partial(jax.jit, static_argnames=("activation", "steps", "lr", "apply_fn"))
def _lbfgs_phase(params, x, target, activation, steps, lr, apply_fn=None):
    opt = optax.lbfgs(learning_rate=None)
    apply = apply_fn or mlp.mlp_apply

    def loss_fn(p):
        return jnp.mean((apply(p, x, activation) - target) ** 2)

    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        p, s = carry
        loss, g = value_and_grad(p, state=s)
        updates, s = opt.update(g, s, p, value=loss, grad=g, value_fn=loss_fn)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=steps)
    return params, losses


def pretrain_to_base(params, x, target, activation: str = "shifted_tanh",
                     epochs: int = 2000, lr: float = 1e-3, lbfgs_steps: int = 50,
                     tol: float = 1e-12, apply_fn=None):
    """Fit the raw net to the analytic base. Returns (params, final_mse).

    The reference runs (epochs − 500) Adam steps then 500 torch-LBFGS steps of
    max_iter=20; optax.lbfgs with linesearch converges in far fewer outer
    steps, so `lbfgs_steps` defaults to 50.
    `apply_fn(params, x, activation)` overrides the raw-net evaluation —
    hard-BC specs pretrain the COMPLETE solution (net × sine factor) to the
    base instead of the raw net.
    """
    x = jnp.asarray(x)
    target = jnp.asarray(target)
    params, losses = _adam_phase(params, x, target, activation, epochs, lr,
                                 apply_fn)
    if float(losses[-1]) > tol and lbfgs_steps > 0:
        params, l2 = _lbfgs_phase(params, x, target, activation,
                                  lbfgs_steps, lr * 0.1, apply_fn)
        final = float(l2[-1])
    else:
        final = float(losses[-1])
    return params, final
