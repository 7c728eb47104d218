"""GPE Hamiltonian application, Rayleigh-quotient μ, residual, Riesz energy.

Reference semantics (SURVEY.md §2.C rows C2-C5):
- μ = ⟨u, Hu⟩/⟨u, u⟩ with Hu = −c·Δu + V·u + γ·𝒩(u)
  (harmonic_pinn_simulation.py:180-188).
- residual r = Hu − μu, loss = mean r² (:190-196).
- Riesz energy E = ∫ c|∇u|² + V u² + (2γ/(p+1))|u|^(p+1)
  (gross_pitaevskii_1D_Different_Optimizers.py:239-282).

Nonlinearity conventions: the refine code uses γ·uᵖ (`power`); older code and
the 2D scripts use γ·|u|^(p−1)·u (`abs_power`). Both are supported.

All reductions go through psum-aware quadrature, so these functions run
unchanged inside `shard_map` with points sharded over the mesh axis.
"""
from __future__ import annotations

import jax.numpy as jnp

from gpe_tpu.ops.quadrature import wmean, integrate


def nonlinear_term(u, gamma, p: float, kind: str = "abs_power"):
    """γ·𝒩(u): `abs_power` → γ|u|^(p−1)u (odd, sign-safe); `power` → γuᵖ."""
    if kind == "power":
        return gamma * u**p
    if kind == "abs_power":
        return gamma * jnp.abs(u) ** (p - 1) * u
    raise ValueError(f"unknown nonlinearity {kind!r}")


def hamiltonian_apply(u, lap, V, gamma, p: float = 3.0, kinetic: float = 1.0,
                      nonlinearity: str = "abs_power"):
    """Hu = −c·Δu + V·u + γ·𝒩(u) pointwise on collocation points."""
    return -kinetic * lap + V * u + nonlinear_term(u, gamma, p, nonlinearity)


def rayleigh_mu(u, lap, V, gamma, p: float = 3.0, kinetic: float = 1.0,
                nonlinearity: str = "abs_power", axis_name: str | None = None,
                eps: float = 1e-12):
    """Rayleigh-quotient chemical potential μ = ⟨u,Hu⟩/⟨u,u⟩ (mean-weighted,
    the reference's paper form; weights cancel in the ratio)."""
    hu = hamiltonian_apply(u, lap, V, gamma, p, kinetic, nonlinearity)
    num = wmean(u * hu, axis_name)
    den = wmean(u * u, axis_name)
    return num / (den + eps)


def gpe_residual(u, lap, V, mu, gamma, p: float = 3.0, kinetic: float = 1.0,
                 nonlinearity: str = "abs_power"):
    """r = −c·Δu + V·u + γ·𝒩(u) − μ·u."""
    return hamiltonian_apply(u, lap, V, gamma, p, kinetic, nonlinearity) - mu * u


def riesz_energy(u, grad, V, w, gamma, p: float = 3.0, kinetic: float = 1.0,
                 normalize: bool = True, axis_name: str | None = None,
                 eps: float = 1e-12):
    """Riesz energy functional (mode-0 objective, reference Algorithm 2):

    E[u] = ∫ c|∇u|² + V·u² + (2γ/(p+1))·|u|^(p+1) dx  [/ ∫u² if normalize]
    """
    grad2 = jnp.sum(grad * grad, axis=-1)
    dens = kinetic * grad2 + V * u * u + (2.0 * gamma / (p + 1.0)) * jnp.abs(u) ** (p + 1.0)
    e = integrate(dens, w, axis_name)
    if normalize:
        e = e / (integrate(u * u, w, axis_name) + eps)
    return e
