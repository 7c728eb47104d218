"""MLP trial wavefunction — explicit pytree params, functional apply.

Parity with reference L1 (SURVEY.md §2.B): the [1,64,64,64,1] paper net with
Tanh/ShiftedTanh (harmonic_pinn_simulation.py:84-93, :41-49) and both init
schemes — Xavier-uniform/bias 0.01 (gross_pitaevskii_1D_Different_Optimizers.py:443-454)
and the mode-scaled Xavier-normal gain 1/(1+0.2·mode)
(harmonic_pinn_simulation.py:636-647).

Params are a tuple of (W, b) pairs with W: (in, out) — a plain pytree, so
optax/vmap/shard_map compose without a module framework. The nets are tiny;
what matters on TPU is the batched collocation axis, which `mlp_vgl` feeds to
the MXU via the forward-Laplacian stacked GEMMs.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from gpe_tpu.ops.laplacian import fwdlap_mlp, activation_triple
from gpe_tpu.physics.bases import ValGradLap


def init_mlp(key, layers: Sequence[int], scheme: str = "xavier_uniform",
             mode: int = 0, dtype=jnp.float32, w0: float = 4.0):
    """Initialize MLP params.

    schemes:
      - "xavier_uniform": Xavier-uniform W, bias 0.01 (reference default).
      - "mode_scaled": Xavier-normal with gain 1/(1+0.2·mode), bias 0.001 —
        the reference's `advanced_initialization` for high modes.
      - "siren": for activation="sin" (Sitzmann et al. 2020, folded form —
        sin(Wx+b) with W pre-scaled by ω₀ instead of sin(ω₀·)): first layer
        W ~ U(−w0/fan_in, w0/fan_in), hidden W ~ U(−√(6/fan_in), √(6/fan_in)),
        bias 0. w0 sets the first layer's frequency reach in PHYSICAL input
        units (the paper's ω₀=30 assumes inputs in [−1,1]; our domains are
        ~[−8,8], so w0≈4 spans comparable wavenumbers). Oscillatory targets
        (vortex lattices) distill orders better than with tanh.
    """
    params = []
    keys = jax.random.split(key, len(layers) - 1)
    for li, (k, fan_in, fan_out) in enumerate(
            zip(keys, layers[:-1], layers[1:])):
        if scheme == "xavier_uniform":
            lim = math.sqrt(6.0 / (fan_in + fan_out))
            w = jax.random.uniform(k, (fan_in, fan_out), dtype, -lim, lim)
            b = jnp.full((fan_out,), 0.01, dtype)
        elif scheme == "mode_scaled":
            gain = 1.0 / (1.0 + 0.2 * mode)
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
            w = std * jax.random.normal(k, (fan_in, fan_out), dtype)
            b = jnp.full((fan_out,), 0.001, dtype)
        elif scheme == "siren":
            lim = (w0 / fan_in) if li == 0 else math.sqrt(6.0 / fan_in)
            w = jax.random.uniform(k, (fan_in, fan_out), dtype, -lim, lim)
            b = jnp.zeros((fan_out,), dtype)
        else:
            raise ValueError(f"unknown init scheme {scheme!r}")
        params.append((w, b))
    return tuple(params)


def mlp_apply(params, x, activation: str = "tanh"):
    """Plain forward pass. x: (N, d) → (N,) for scalar-output nets."""
    act = activation_triple(activation)
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    h = x
    n_layers = len(params)
    for li, (w, b) in enumerate(params):
        h = h @ w + b
        if li < n_layers - 1:
            h = act(h)[0]
    return h[:, 0] if h.shape[-1] == 1 else h


def mlp_vgl(params, x, activation: str = "tanh") -> ValGradLap:
    """(value, grad, laplacian) via forward-Laplacian propagation (ops.laplacian)."""
    return fwdlap_mlp(params, x, activation)
