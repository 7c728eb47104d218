"""Wavefunction ansätze: compositions of network + analytic structure.

Implements the reference's solution transforms with exact derivative
propagation (no re-differentiation of analytic factors):

- plain:          ψ = s·N(x)                      (vanilla PINN)
- hard BC:        ψ = g(x)·s·N(x)                 (box sin(πx) factor,
                  box_pinn_simulation.py:119-130), product rule:
                  Δ(gN) = g·ΔN + 2∇g·∇N + N·Δg
- perturbation:   ψ = φ_base(x) + s·N(x)          (PL-PINN core,
                  harmonic_pinn_simulation.py:127-134), where the scale s is
                  q/normal_const (q=0.01, const captured at epoch 0)
- stacked:        ψ = φ + β·prev(x) + α·N(x)      (curriculum continuation,
                  src/..._Different_Modes.py:184-213) — expressed by passing a
                  base_vgl closure that already includes the frozen prev net.

Every ansatz is a pair of pure functions:
  vgl(params, x, scale)   → ValGradLap of the COMPLETE solution ψ
  value(params, x, scale) → ψ only (cheap path for boundary/symmetry points)
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from gpe_tpu.physics.bases import ValGradLap

# net_vgl(params, x) -> ValGradLap ; net_value(params, x) -> (N,)
NetVGL = Callable
NetValue = Callable
BaseFn = Callable  # x -> ValGradLap (analytic, no params)


class Ansatz(NamedTuple):
    vgl: Callable        # (params, x, scale) -> ValGradLap of ψ
    value: Callable      # (params, x, scale) -> ψ values (N,)


def plain_ansatz(net_vgl: NetVGL, net_value: NetValue) -> Ansatz:
    """ψ = s·N(x)."""
    def vgl(params, x, scale=1.0):
        n = net_vgl(params, x)
        return ValGradLap(scale * n.value, scale * n.grad, scale * n.lap)

    def value(params, x, scale=1.0):
        return scale * net_value(params, x)

    return Ansatz(vgl, value)


def hard_bc_ansatz(net_vgl: NetVGL, net_value: NetValue, factor: BaseFn) -> Ansatz:
    """ψ = g(x)·s·N(x) with g an analytic factor vanishing on the boundary.

    factor(x) must return a ValGradLap of g.  Product rule gives exact ψ
    derivatives from the network's forward-Laplacian triple.
    """
    def vgl(params, x, scale=1.0):
        n = net_vgl(params, x)
        g = factor(x)
        val = g.value * n.value
        grad = g.value[:, None] * n.grad + n.value[:, None] * g.grad
        lap = g.value * n.lap + 2.0 * jnp.sum(g.grad * n.grad, axis=-1) + n.value * g.lap
        return ValGradLap(scale * val, scale * grad, scale * lap)

    def value(params, x, scale=1.0):
        g = factor(x)
        return scale * g.value * net_value(params, x)

    return Ansatz(vgl, value)


def perturbation_ansatz(inner: Ansatz, base: BaseFn) -> Ansatz:
    """ψ = φ_base(x) + inner(x)  — the PL-PINN complete solution.

    `base` is the analytic linear eigenfunction (or any frozen warm-start
    closure, enabling the stacked curriculum variant); the inner ansatz's
    scale carries the q/normal_const perturbation scaling.
    """
    def vgl(params, x, scale=1.0):
        n = inner.vgl(params, x, scale)
        b = base(x)
        return ValGradLap(b.value + n.value, b.grad + n.grad, b.lap + n.lap)

    def value(params, x, scale=1.0):
        return base(x).value + inner.value(params, x, scale)

    return Ansatz(vgl, value)


def box_sine_factor(lb: float = 0.0, ub: float = 1.0) -> BaseFn:
    """g(x) = Π_d sin(π(x_d−lb)/(ub−lb)) — hard Dirichlet BC factor for boxes."""
    L = ub - lb
    k = jnp.pi / L

    def factor(x) -> ValGradLap:
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        s = jnp.sin(k * (x - lb))       # (N, d)
        c = jnp.cos(k * (x - lb))
        val = jnp.prod(s, axis=-1)
        d = x.shape[-1]
        # grad_d = k·c_d·Π_{e≠d} s_e (built per-dim, safe at the sin nodes);
        # lap = −k²·d·val since each sin factor contributes −k².
        cols = []
        for i in range(d):
            prod_others = jnp.prod(jnp.concatenate([s[:, :i], s[:, i + 1:]], axis=-1), axis=-1) if d > 1 else jnp.ones_like(val)
            cols.append(k * c[:, i] * prod_others)
        grad = jnp.stack(cols, axis=-1)
        lap = -(k * k) * d * val
        return ValGradLap(val, grad, lap)

    return factor
