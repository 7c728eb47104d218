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


@partial(jax.jit, static_argnames=("activation", "steps", "lr", "jw",
                                   "use_lbfgs"))
def _sobolev_phase(params, x, tval, tjac, activation, steps, lr, jw,
                   use_lbfgs=False):
    opt = optax.lbfgs(learning_rate=None) if use_lbfgs else optax.adam(lr)

    def loss_fn(p):
        n = mlp.mlp_vgl(p, x, activation)
        val = n.value if n.value.ndim == tval.ndim else n.value[:, None]
        jac = n.grad if n.grad.ndim == tjac.ndim else n.grad[..., None]
        return (jnp.mean((val - tval) ** 2)
                + jw * jnp.mean((jac - tjac) ** 2))

    if use_lbfgs:
        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        def step(carry, _):
            p, s = carry
            loss, g = value_and_grad(p, state=s)
            updates, s = opt.update(g, s, p, value=loss, grad=g,
                                    value_fn=loss_fn)
            return (optax.apply_updates(p, updates), s), loss
    else:
        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)),
                                       None, length=steps)
    return params, losses


def pretrain_sobolev(params, x, target_val, target_jac,
                     activation: str = "tanh", epochs: int = 4000,
                     lr: float = 1e-3, lbfgs_steps: int = 200,
                     jac_weight: float = 0.1):
    """Sobolev (H¹) distillation: fit the net's VALUES and analytic FIRST
    DERIVATIVES to a target field (one forward-Laplacian pass per step).

    Value-only distillation underconstrains derivatives exactly where μ is
    read off (the Laplacian at vortex cores): the Ω=0.9 seven-vortex state
    floors at fit MSE 2.3e-6 with lz_net 0.12 LOW and within-configuration
    μ err 1.4e-2 (runs/gpe2d_vortex/config_matched.json, round-4a).
    Supervising ∇ψ too (spectral gradients of the oracle field) pins the
    phase winding around each core. target_val (N, out); target_jac
    (N, d, out) — the mlp_vgl jac layout."""
    x = jnp.asarray(x)
    tval = jnp.asarray(target_val, jnp.float32)
    tjac = jnp.asarray(target_jac, jnp.float32)
    params, losses = _sobolev_phase(params, x, tval, tjac, activation,
                                    epochs, lr, jac_weight)
    final = float(losses[-1])
    if lbfgs_steps > 0:
        params, l2 = _sobolev_phase(params, x, tval, tjac, activation,
                                    lbfgs_steps, lr * 0.1, jac_weight,
                                    use_lbfgs=True)
        final = float(l2[-1])
    return params, final
