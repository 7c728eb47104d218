"""Analytical base eigenfunctions φₙ with closed-form first/second derivatives.

These are the linear (γ=0) eigenfunctions that PL-PINN perturbs around
(SURVEY.md §2.A rows A8-A10). Each basis returns a :class:`ValGradLap`
triple ``(value, grad, lap)`` so the perturbation ansatz can assemble the
complete solution's derivatives without re-differentiating the base.

- Hermite (harmonic trap): device-resident recurrence, matching the
  reference's differentiable torch recurrence
  (final/refine/harmonic_pinn_simulation.py:95-119); φ″ via the ODE
  identity φₙ″ = (x² − (2n+1))φₙ.
- Box (particle in a box): √(2/L)·sin((n+1)πx/L)
  (final/refine/box_pinn_simulation.py:99-116).
- Airy (gravity well): Ai(x+αₙ)/|Ai′(αₙ)| with αₙ the n-th Airy zero
  (final/refine/gravity_well_pinn_simulation.py:97-119). scipy has no jnp
  twin, so Ai/Ai′ are precomputed on a host grid once and evaluated on
  device by cubic-Hermite interpolation; Ai″ = z·Ai by the Airy ODE.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ValGradLap(NamedTuple):
    """A function's value, gradient, and Laplacian on a batch of points.

    value: (N,), grad: (N, d), lap: (N,).
    """
    value: jnp.ndarray
    grad: jnp.ndarray
    lap: jnp.ndarray


def _as_1d(x):
    x = jnp.asarray(x)
    if x.ndim == 2:
        if x.shape[-1] != 1:
            raise ValueError(f"1D basis got x with d={x.shape[-1]}")
        x = x[:, 0]
    return x


# ---------------------------------------------------------------------------
# Hermite (harmonic oscillator) basis
# ---------------------------------------------------------------------------

def _hermite_poly_pair(n: int, x: jnp.ndarray):
    """Physicists' Hermite Hₙ(x) and Hₙ₋₁(x) by the stable recurrence
    H_{k+1} = 2x·H_k − 2k·H_{k−1}.  n is static → the loop unrolls in trace."""
    h_prev = jnp.ones_like(x)          # H₀
    if n == 0:
        return h_prev, jnp.zeros_like(x)
    h = 2.0 * x                        # H₁
    for k in range(1, n):
        h, h_prev = 2.0 * x * h - 2.0 * k * h_prev, h
    return h, h_prev


def hermite_basis(n: int, x, scale: float = 1.0) -> ValGradLap:
    """Normalized harmonic-oscillator eigenfunction (for −Δ + x² conventions
    when ``scale=1``): φₙ(x) = (2ⁿ n! √π)^(−1/2) Hₙ(x) e^(−x²/2).

    φₙ′ = c(2n·Hₙ₋₁ − x·Hₙ)e^(−x²/2);  φₙ″ = (x² − (2n+1))·φₙ (Schrödinger ODE).
    For the −½Δ + ½x² convention the same φₙ applies (ω=1), eigenvalue n+½.
    """
    x = _as_1d(x) * scale
    c = 1.0 / math.sqrt((2.0**n) * math.factorial(n) * math.sqrt(math.pi))
    hn, hnm1 = _hermite_poly_pair(n, x)
    w = jnp.exp(-0.5 * x * x)
    val = c * hn * w
    grad = c * (2.0 * n * hnm1 - x * hn) * w * scale
    lap = (x * x - (2.0 * n + 1.0)) * val * scale * scale
    return ValGradLap(val, grad[:, None], lap)


def hermite_product_2d(nx: int, ny: int, xy) -> ValGradLap:
    """2D harmonic-trap eigenfunction φ_{nx}(x)·φ_{ny}(y) with gradient and
    Laplacian assembled from the 1D triples (for 2D excited-state warm starts)."""
    xy = jnp.asarray(xy)
    fx = hermite_basis(nx, xy[:, 0])
    fy = hermite_basis(ny, xy[:, 1])
    val = fx.value * fy.value
    grad = jnp.stack([fx.grad[:, 0] * fy.value, fx.value * fy.grad[:, 0]], axis=-1)
    lap = fx.lap * fy.value + fx.value * fy.lap
    return ValGradLap(val, grad, lap)


def hermite_product_nd(modes, x) -> ValGradLap:
    """d-D harmonic-trap eigenfunction Π_i φ_{n_i}(x_i) with gradient and
    Laplacian assembled from the 1D triples by the product rule — the d≥3
    generalization of :func:`hermite_product_2d` (beyond the reference's 2D
    ceiling; used by the 3D GPE experiments).

    modes: length-d sequence of per-axis quantum numbers; x: (N, d)."""
    x = jnp.asarray(x)
    d = x.shape[-1]
    assert len(modes) == d, (modes, d)
    fs = [hermite_basis(int(m), x[:, i]) for i, m in enumerate(modes)]
    vals = [f.value for f in fs]

    def prod_except(i):
        out = None
        for j, v in enumerate(vals):
            if j == i:
                continue
            out = v if out is None else out * v
        return out if out is not None else jnp.ones_like(vals[0])

    val = vals[0]
    for v in vals[1:]:
        val = val * v
    grad = jnp.stack([fs[i].grad[:, 0] * prod_except(i) for i in range(d)],
                     axis=-1)
    lap = sum(fs[i].lap * prod_except(i) for i in range(d))
    return ValGradLap(val, grad, lap)


# ---------------------------------------------------------------------------
# Box (infinite well) basis
# ---------------------------------------------------------------------------

def box_basis(n: int, x, L: float = 1.0) -> ValGradLap:
    """φₙ(x) = √(2/L)·sin((n+1)πx/L);  φ″ = −k²φ with k=(n+1)π/L."""
    x = _as_1d(x)
    k = (n + 1) * jnp.pi / L
    a = math.sqrt(2.0 / L)
    s = jnp.sin(k * x)
    val = a * s
    grad = a * k * jnp.cos(k * x)
    lap = -(k * k) * val
    return ValGradLap(val, grad[:, None], lap)


def box_basis_2d(nx: int, ny: int, xy, L: float = 1.0) -> ValGradLap:
    """2D box eigenfunction (2/L)·sin(kₓx)sin(k_y y)."""
    xy = jnp.asarray(xy)
    fx = box_basis(nx, xy[:, 0], L)
    fy = box_basis(ny, xy[:, 1], L)
    val = fx.value * fy.value
    grad = jnp.stack([fx.grad[:, 0] * fy.value, fx.value * fy.grad[:, 0]], axis=-1)
    lap = fx.lap * fy.value + fx.value * fy.lap
    return ValGradLap(val, grad, lap)


# ---------------------------------------------------------------------------
# Airy (gravity well) basis
# ---------------------------------------------------------------------------

class _AiryTable:
    """Host-precomputed (Ai, Ai′) knots for device-side cubic-Hermite eval.

    Built lazily on first use; scipy only runs at table-build time (host),
    after which evaluation is pure jnp (jit/vmap/grad-safe on TPU).
    """

    def __init__(self, zmin: float = -40.0, zmax: float = 60.0, num: int = 16384):
        from scipy.special import airy as _airy  # host-only
        z = np.linspace(zmin, zmax, num)
        ai, aip, _, _ = _airy(z)
        self.zmin, self.zmax = float(zmin), float(zmax)
        self.dz = float(z[1] - z[0])
        self.ai = jnp.asarray(ai, dtype=jnp.float32)
        self.aip = jnp.asarray(aip, dtype=jnp.float32)
        self.z = jnp.asarray(z, dtype=jnp.float32)

    def __call__(self, z):
        """Cubic-Hermite interpolation of (Ai, Ai′); Ai″ from the ODE Ai″=z·Ai."""
        z = jnp.clip(z, self.zmin, self.zmax - 1e-6)
        t = (z - self.zmin) / self.dz
        i = jnp.clip(t.astype(jnp.int32), 0, self.ai.shape[0] - 2)
        s = t - i.astype(z.dtype)               # in [0,1)
        h = self.dz
        y0, y1 = self.ai[i], self.ai[i + 1]
        m0, m1 = self.aip[i] * h, self.aip[i + 1] * h
        s2, s3 = s * s, s * s * s
        h00 = 2 * s3 - 3 * s2 + 1
        h10 = s3 - 2 * s2 + s
        h01 = -2 * s3 + 3 * s2
        h11 = s3 - s2
        ai = h00 * y0 + h10 * m0 + h01 * y1 + h11 * m1
        dh00 = 6 * s2 - 6 * s
        dh10 = 3 * s2 - 4 * s + 1
        dh01 = -dh00
        dh11 = 3 * s2 - 2 * s
        aip = (dh00 * y0 + dh10 * m0 + dh01 * y1 + dh11 * m1) / h
        return ai, aip


_airy_table: _AiryTable | None = None
_airy_zeros_cache: np.ndarray | None = None


def _get_airy_table() -> _AiryTable:
    global _airy_table
    if _airy_table is None:
        _airy_table = _AiryTable()
    return _airy_table


def airy_zero(n: int) -> float:
    """αₙ = the (n+1)-th zero of Ai (negative), scipy-computed on host once."""
    global _airy_zeros_cache
    if _airy_zeros_cache is None or len(_airy_zeros_cache) <= n:
        from scipy.special import ai_zeros
        _airy_zeros_cache = ai_zeros(max(n + 1, 16))[0]  # zeros of Ai (negative)
    return float(_airy_zeros_cache[n])


def airy_basis(n: int, x) -> ValGradLap:
    """Gravity-well eigenfunction ψₙ(x) = Ai(x + αₙ)/|Ai′(αₙ)| on x≥0.

    Normalization is exact: ∫₀^∞ Ai(x+αₙ)² dx = Ai′(αₙ)².  ψ″ via the Airy
    ODE: Ai″(z) = z·Ai(z) ⇒ ψₙ″(x) = (x+αₙ)·ψₙ(x).
    """
    from scipy.special import airy as _airy  # host: normalization constant
    x = _as_1d(x)
    alpha = airy_zero(n)
    norm = abs(float(_airy(alpha)[1]))
    tab = _get_airy_table()
    z = x + alpha
    ai, aip = tab(z)
    val = ai / norm
    grad = aip / norm
    lap = z * val
    return ValGradLap(val, grad[:, None], lap)
