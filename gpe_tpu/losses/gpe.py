"""GPE loss terms: PDE residual, boundary, normalization, symmetry, regularizers.

Parity with reference L2 (SURVEY.md §2.C). One shared forward-Laplacian pass
feeds all terms — the reference re-runs `self.forward` 3-4× per step
(src/gross_pitaevskii_1D_Different_Optimizers.py:421-424); here every term is
computed from a single ValGradLap evaluation of the complete solution.

γ (and the potential scale β) enter as traced scalars so one compiled step
serves the whole continuation ramp without recompilation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import jax.numpy as jnp

from gpe_tpu.models.ansatz import Ansatz
from gpe_tpu.ops.quadrature import integrate, wmean
from gpe_tpu.ops.rayleigh import hamiltonian_apply, riesz_energy


@dataclass(frozen=True)
class GPETerms:
    """Static configuration of the GPE loss (compile-time constants)."""
    p: float = 3.0
    kinetic: float = 1.0                 # c in −c·Δψ (1 = refine code, ½ = notebooks)
    nonlinearity: str = "abs_power"      # or "power" (refine code's γ·uᵖ)
    norm_style: str = "riemann"          # "(Σu²·dx−1)²" | "l2": "(‖u‖−1)²"
    symmetry: str | None = None          # None | "even" | "odd" | "interval"
    sym_bounds: tuple = (0.0, 1.0)       # for "interval": u(x) = u((a+b)−x)
    use_riesz: bool = False              # add Riesz energy (mode-0 objective)
    anti_trivial: bool = False           # eigenvalue regularizers (C9)
    anti_trivial_c: float = 2.0


class LossOutput(NamedTuple):
    losses: dict       # name -> scalar loss term
    mu: jnp.ndarray    # Rayleigh-quotient eigenvalue
    u: jnp.ndarray     # complete-solution values on collocation points


def gpe_loss_terms(ansatz: Ansatz, params, x, V, w, bx, gamma, scale,
                   cfg: GPETerms, axis_name: str | None = None) -> LossOutput:
    """All GPE loss terms from ONE forward-Laplacian evaluation.

    x: (N,d) collocation points; V: (N,) potential values (pre-scaled by β if
    continuing in potential strength); w: (N,) quadrature weights; bx: (B,d)
    boundary points; gamma, scale: traced scalars.
    """
    u, grad, lap = ansatz.vgl(params, x, scale)

    hu = hamiltonian_apply(u, lap, V, gamma, cfg.p, cfg.kinetic, cfg.nonlinearity)
    den = wmean(u * u, axis_name)
    mu = wmean(u * hu, axis_name) / (den + 1e-12)

    r = hu - mu * u
    losses = {"pde": wmean(r * r, axis_name)}

    # Dirichlet boundary: full solution → 0 at the box edges (C6).
    ub_vals = ansatz.value(params, bx, scale)
    losses["boundary"] = jnp.mean(ub_vals * ub_vals)

    # Normalization ∫|ψ|² = 1 (C7).
    if cfg.norm_style == "riemann":
        losses["norm"] = (integrate(u * u, w, axis_name) - 1.0) ** 2
    else:
        losses["norm"] = (jnp.sqrt(wmean(u * u, axis_name) * u.size) - 1.0) ** 2

    # Symmetry (C8): parity or interval reflection.
    if cfg.symmetry is not None:
        if cfg.symmetry == "interval":
            xr = (cfg.sym_bounds[0] + cfg.sym_bounds[1]) - x
            sgn = 1.0
        else:
            xr = -x
            sgn = 1.0 if cfg.symmetry == "even" else -1.0
        ur = ansatz.value(params, xr, scale)
        diff = u - sgn * ur
        losses["sym"] = wmean(diff * diff, axis_name)

    if cfg.use_riesz:
        losses["riesz"] = riesz_energy(u, grad, V, w, gamma, cfg.p, cfg.kinetic,
                                       normalize=True, axis_name=axis_name)

    if cfg.anti_trivial:
        # arXiv:2010.05075-style regularizers, active in gross_pitaevskii_2D.py:197-211.
        losses["reg_f"] = 1.0 / (wmean(u * u, axis_name) + 1e-2)
        losses["reg_lambda"] = 1.0 / (mu * mu + 1e-6)
        losses["reg_drive"] = jnp.exp(-mu + cfg.anti_trivial_c)

    return LossOutput(losses, mu, u)


def pretrain_loss(ansatz_value: Callable, params, x, target, scale=1.0):
    """Supervised MSE to the analytical base (D2: pretrain_on_analytical_solution,
    harmonic_pinn_simulation.py:650-701). ansatz_value is the raw-net value fn
    (the reference pretrains NN output to φ, not the complete solution)."""
    pred = ansatz_value(params, x, scale)
    return jnp.mean((pred - target) ** 2)
