"""Shampoo preconditioned optimizer (TPU-native stand-in for the reference's
DistributedShampoo usage, src/gross_pitaevskii_1D_Different_Optimizers.py:544-555).

The reference runs facebookresearch's DistributedShampoo single-process with
Adam grafting and precondition_frequency=100. Here: Kronecker-factored
statistics L += GGᵀ, R += GᵀG per 2-D parameter, preconditioned update
L^(−1/4)·G·R^(−1/4) with the root recomputed every `precondition_frequency`
steps via eigendecomposition (nets are ≤64×64 — eigh on MXU is cheap), and
Adam grafting: the Shampoo direction is rescaled to the Adam update's norm.
1-D params (biases) fall back to the Adam update.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _ShampooState(NamedTuple):
    count: jnp.ndarray
    l_stats: any
    r_stats: any
    l_inv: any
    r_inv: any
    graft: optax.OptState


def _inv_quarter_root(m, eps):
    """M^(−1/4) via symmetric eigendecomposition (f32; small factors)."""
    w, v = jnp.linalg.eigh(m + eps * jnp.eye(m.shape[0], dtype=m.dtype))
    w = jnp.maximum(w, eps)
    return (v * jnp.power(w, -0.25)) @ v.T


def shampoo(learning_rate: float | callable = 1e-3,
            precondition_frequency: int = 100,
            start_preconditioning_step: int = 1,
            eps: float = 1e-6,
            graft_b1: float = 0.9, graft_b2: float = 0.999) -> optax.GradientTransformation:
    graft = optax.scale_by_adam(b1=graft_b1, b2=graft_b2)

    # Non-matrix params (biases) carry 0×0 sentinel stats so the state pytree
    # mirrors the params pytree exactly (tuple layer pairs stay containers).
    def init(params):
        l_stats = jax.tree.map(
            lambda p: jnp.zeros((p.shape[0], p.shape[0]), p.dtype) if p.ndim == 2
            else jnp.zeros((0, 0), p.dtype), params)
        r_stats = jax.tree.map(
            lambda p: jnp.zeros((p.shape[1], p.shape[1]), p.dtype) if p.ndim == 2
            else jnp.zeros((0, 0), p.dtype), params)
        l_inv = jax.tree.map(
            lambda p: jnp.eye(p.shape[0], dtype=p.dtype) if p.ndim == 2
            else jnp.zeros((0, 0), p.dtype), params)
        r_inv = jax.tree.map(
            lambda p: jnp.eye(p.shape[1], dtype=p.dtype) if p.ndim == 2
            else jnp.zeros((0, 0), p.dtype), params)
        return _ShampooState(jnp.zeros((), jnp.int32), l_stats, r_stats, l_inv, r_inv,
                             graft.init(params))

    def update(grads, state, params=None):
        count = state.count + 1

        new_l = jax.tree.map(lambda g, l: l + g @ g.T if g.ndim == 2 else l,
                             grads, state.l_stats)
        new_r = jax.tree.map(lambda g, r: r + g.T @ g if g.ndim == 2 else r,
                             grads, state.r_stats)

        refresh = jnp.logical_and(count >= start_preconditioning_step,
                                  jnp.mod(count, precondition_frequency) == 0)

        def maybe_root(stat, old_inv):
            if stat.size == 0:
                return old_inv
            return jax.lax.cond(refresh, lambda s: _inv_quarter_root(s, eps),
                                lambda s: old_inv, stat)

        new_l_inv = jax.tree.map(maybe_root, new_l, state.l_inv)
        new_r_inv = jax.tree.map(maybe_root, new_r, state.r_inv)

        graft_updates, graft_state = graft.update(grads, state.graft, params)

        def precond(g, li, ri, gu):
            if g.ndim != 2:
                return gu
            direction = li @ g @ ri
            # Adam grafting: Shampoo direction, Adam magnitude.
            d_norm = jnp.linalg.norm(direction) + 1e-16
            g_norm = jnp.linalg.norm(gu)
            scaled = direction * (g_norm / d_norm)
            warm = count >= start_preconditioning_step
            return jnp.where(warm, scaled, gu)

        updates = jax.tree.map(precond, grads, new_l_inv, new_r_inv, graft_updates)
        new_state = _ShampooState(count, new_l, new_r, new_l_inv, new_r_inv, graft_state)
        return updates, new_state

    base = optax.GradientTransformation(init, update)
    if callable(learning_rate):
        return optax.chain(base, optax.scale_by_schedule(lambda c: -learning_rate(c)))
    return optax.chain(base, optax.scale(-learning_rate))
