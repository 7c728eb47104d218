"""Laplacian engines — the performance core of the framework.

The reference computes ψ″ with two nested reverse-mode sweeps per loss
evaluation (harmonic_pinn_simulation.py:158-172; 4 sweeps in 2D:
gross_pitaevskii_2D.py:183-188). On TPU we instead propagate the triple
(value, Jacobian, Laplacian) *forward* through the network in one pass
("Forward Laplacian", arXiv:2307.08214; DOF, arXiv:2402.09730):

- Linear layer y = x@W + b is linear in all three channels, so value, the d
  Jacobian rows, and the Laplacian stack into ONE (N·(d+2), in)×(in, out)
  matmul — exactly what the MXU wants: one big batched GEMM instead of three
  autodiff graph walks.
- Elementwise activation σ: value σ(y); Jacobian σ′(y)·J; Laplacian
  σ′(y)·L + σ″(y)·Σ_d J².  Pure VPU work, fused by XLA into the GEMM epilogue.

Cost ≈ (d+2)/2 forward passes vs ≈4-6 forward-equivalents for nested
reverse-mode, with no graph retention — this is where the ≥20× throughput
target (BASELINE.json) is won.

A generic `jax.jvp`-over-`jax.grad` fallback is provided for arbitrary
callables (used in tests as an independent oracle).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from gpe_tpu.physics.bases import ValGradLap


# ---------------------------------------------------------------------------
# Activation derivative triples (value, σ′, σ″ as functions of preactivation)
# ---------------------------------------------------------------------------

def _tanh_triple(y):
    t = jnp.tanh(y)
    d1 = 1.0 - t * t
    return t, d1, -2.0 * t * d1


def _shifted_tanh_triple(y, eps: float = 1e-6):
    """ShiftedTanh: tanh(y) + 1 + ε — strictly positive activation used by all
    reference refine code (harmonic_pinn_simulation.py:41-49). Same derivatives
    as tanh."""
    t = jnp.tanh(y)
    d1 = 1.0 - t * t
    return t + 1.0 + eps, d1, -2.0 * t * d1


def _sin_triple(y):
    s = jnp.sin(y)
    return s, jnp.cos(y), -s


def _gelu_triple(y):
    # tanh-approx GELU with analytic first/second derivatives.
    c = 0.7978845608028654  # √(2/π)
    a = 0.044715
    u = c * (y + a * y**3)
    t = jnp.tanh(u)
    du = c * (1.0 + 3.0 * a * y * y)
    d2u = c * 6.0 * a * y
    sech2 = 1.0 - t * t
    val = 0.5 * y * (1.0 + t)
    d1 = 0.5 * (1.0 + t) + 0.5 * y * sech2 * du
    d2 = sech2 * du + 0.5 * y * (sech2 * d2u - 2.0 * t * sech2 * du * du)
    return val, d1, d2


ACTIVATIONS = {
    "tanh": _tanh_triple,
    "shifted_tanh": _shifted_tanh_triple,
    "sin": _sin_triple,
    "gelu": _gelu_triple,
}


def activation_triple(name: str) -> Callable:
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; have {sorted(ACTIVATIONS)}")


def _tanh_quad(y):
    t = jnp.tanh(y)
    d1 = 1.0 - t * t
    return t, d1, -2.0 * t * d1, (6.0 * t * t - 2.0) * d1


def _shifted_tanh_quad(y, eps: float = 1e-6):
    t, d1, d2, d3 = _tanh_quad(y)
    return t + 1.0 + eps, d1, d2, d3


def _sin_quad(y):
    s, c = jnp.sin(y), jnp.cos(y)
    return s, c, -s, -c


ACTIVATION_QUADS = {
    "tanh": _tanh_quad,
    "shifted_tanh": _shifted_tanh_quad,
    "sin": _sin_quad,
}


def activation_quad(name: str) -> Callable:
    """(σ, σ′, σ″, σ‴) of the preactivation — σ‴ is needed by the reverse
    sweep through the forward-Laplacian recursion (the Laplacian channel
    carries σ″, whose derivative w.r.t. the preactivation is σ‴)."""
    try:
        return ACTIVATION_QUADS[name]
    except KeyError:
        raise ValueError(f"no σ‴ for activation {name!r}; have {sorted(ACTIVATION_QUADS)}")


def _tanh_from_vals(s0, s1):
    s2 = -2.0 * s0 * s1
    return s2, -2.0 * (s1 * s1 + s0 * s2)


def _shifted_tanh_from_vals(s0, s1, eps: float = 1e-6):
    t = s0 - 1.0 - eps
    s2 = -2.0 * t * s1
    return s2, -2.0 * (s1 * s1 + t * s2)


def _sin_from_vals(s0, s1):
    return -s0, -s1


ACTIVATION_FROM_VALUES = {
    "tanh": _tanh_from_vals,
    "shifted_tanh": _shifted_tanh_from_vals,
    "sin": _sin_from_vals,
}


def activation_from_values(name: str) -> Callable:
    """(σ″, σ‴) recovered ALGEBRAICALLY from stored (σ, σ′) — no
    transcendental evaluation. Used by the fused Pallas backward kernel:
    storing the forward's (σ, σ′) per hidden layer and deriving the higher
    derivatives with a few multiplies removes every tanh/sin recompute from
    the (VPU-bound) reverse sweep."""
    try:
        return ACTIVATION_FROM_VALUES[name]
    except KeyError:
        raise ValueError(
            f"no value-derivative rule for activation {name!r}; "
            f"have {sorted(ACTIVATION_FROM_VALUES)}")


# ---------------------------------------------------------------------------
# Forward-Laplacian MLP propagation
# ---------------------------------------------------------------------------

def fwdlap_mlp(params: Sequence[tuple], x: jnp.ndarray, activation: str = "tanh") -> ValGradLap:
    """Value/gradient/Laplacian of an MLP in one fused forward pass.

    params: sequence of (W, b) with W: (in, out), b: (out,). Activation is
    applied between layers (not after the last). x: (N, d). Returns
    ValGradLap with value (N,), grad (N, d), lap (N,) for scalar output nets;
    multi-output nets get trailing output axes.

    Implementation: a state tensor S of shape (N, d+2, features) holding
    [value; J_1..J_d; L]. Linear layers act on S with a single dot_general
    (bias added to the value channel only); activations update the three
    channel groups with the σ/σ′/σ″ triple.
    """
    act = activation_triple(activation)
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    N, d = x.shape

    eye = jnp.eye(d, dtype=x.dtype)                       # initial Jacobian
    s = jnp.concatenate(
        [x[:, None, :], jnp.broadcast_to(eye, (N, d, d)),
         jnp.zeros((N, 1, d), x.dtype)], axis=1)          # (N, d+2, d)

    n_layers = len(params)
    for li, (w, b) in enumerate(params):
        s = jnp.einsum("ncf,fo->nco", s, w)               # one GEMM for all channels
        s = s.at[:, 0, :].add(b)
        if li < n_layers - 1:
            y = s[:, 0, :]
            val, d1, d2 = act(y)
            jac = s[:, 1:1 + d, :]
            lap = s[:, 1 + d, :]
            jac_new = d1[:, None, :] * jac
            lap_new = d1 * lap + d2 * jnp.sum(jac * jac, axis=1)
            s = jnp.concatenate([val[:, None, :], jac_new, lap_new[:, None, :]], axis=1)

    out = s[:, 0, :]
    jac = s[:, 1:1 + d, :]
    lap = s[:, 1 + d, :]
    if out.shape[-1] == 1:
        return ValGradLap(out[:, 0], jac[:, :, 0], lap[:, 0])
    return ValGradLap(out, jac, lap)


# ---------------------------------------------------------------------------
# Generic fallback: forward-over-reverse per point (oracle for tests)
# ---------------------------------------------------------------------------

def value_grad_lap_generic(f: Callable, x: jnp.ndarray) -> ValGradLap:
    """(f, ∇f, Δf) for arbitrary scalar f: (d,) → () via jvp-of-grad, vmapped.

    Exact but slower than :func:`fwdlap_mlp`; used as the independent oracle
    in tests and for ansatz factors without closed-form derivatives.
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    d = x.shape[-1]
    grad_f = jax.grad(f)

    def one(pt):
        val = f(pt)
        g = grad_f(pt)
        lap = 0.0
        for i in range(d):
            e = jnp.zeros((d,), x.dtype).at[i].set(1.0)
            _, hvp = jax.jvp(grad_f, (pt,), (e,))
            lap = lap + hvp[i]
        return val, g, lap

    val, g, lap = jax.vmap(one)(x)
    return ValGradLap(val, g, lap)


def laplacian_generic(f: Callable, x: jnp.ndarray) -> jnp.ndarray:
    return value_grad_lap_generic(f, x).lap
