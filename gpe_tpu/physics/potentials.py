"""Trapping potentials V(x) for the GPE, as pure jnp functions.

Capability parity with the reference catalog (SURVEY.md §2.A, rows A1-A7):
harmonic `V=a·|x|²` (refine code uses a=1: harmonic_pinn_simulation.py:136-144;
older code a=½ω²), gaussian, periodic/optical-lattice `V0·cos²(kx)`, box (V=0,
hard BC), gravity well `V=g·x`, double-well `a·x⁴−b·x²`, step, sine, and
β-scaled continuation wrappers (test_perturbing_gamma_and_beta.py:126-135).

Conventions
-----------
Every potential accepts ``x`` of shape ``(N, d)`` (or ``(N,)``, treated as
d=1) and returns shape ``(N,)``. All are pure, jit/vmap/shard_map-safe, and
differentiable. ``get_potential(name, **kw)`` returns a unary callable.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax.numpy as jnp

Potential = Callable[[jnp.ndarray], jnp.ndarray]


def _as_2d(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(x)
    return x[:, None] if x.ndim == 1 else x


def harmonic(x, a: float = 1.0):
    """V = a·|x|².  Reference refine code: a=1 (V=x²); notebooks: a=½ (−½Δ,½x²)."""
    x = _as_2d(x)
    return a * jnp.sum(x * x, axis=-1)


def gaussian(x, V0: float = 1.0, center=0.0, sigma: float = 0.7071067811865476):
    """V = V0·exp(−|x−c|²/(2σ²)).

    Defaults reproduce the reference 1D form exp(−(x−a)²) with σ=1/√2
    (gross_pitaevskii_1D_Different_Optimizers.py:145-147) and the 2D form
    V0·exp(−((x−x0)²+(y−y0)²)/2σ²) (gross_pitaevskii_2D.py:244-274).
    """
    x = _as_2d(x)
    c = jnp.broadcast_to(jnp.asarray(center, dtype=x.dtype), x.shape[-1:])
    r2 = jnp.sum((x - c) ** 2, axis=-1)
    return V0 * jnp.exp(-r2 / (2.0 * sigma**2))


def periodic(x, V0: float = 1.0, k: float = 2.0 * jnp.pi / 5.0):
    """V = V0·Σ_d cos²(k·x_d)  (optical lattice; reference default k=2π/5)."""
    x = _as_2d(x)
    return V0 * jnp.sum(jnp.cos(k * x) ** 2, axis=-1)


def box(x):
    """V = 0 inside the box; the wall is enforced by a hard-BC output factor
    (box_pinn_simulation.py:119-130), not by the potential."""
    x = _as_2d(x)
    return jnp.zeros(x.shape[:-1], dtype=x.dtype)


def linear(x, g: float = 1.0):
    """Gravity well V = g·Σ_d x_d on the half line (gravity_well_pinn_simulation.py:175-184)."""
    x = _as_2d(x)
    return g * jnp.sum(x, axis=-1)


def double_well(x, a: float = 1.0, b: float = 4.0):
    """V = a·|x|⁴ − b·|x|² (reference notebook catalog, 'double_well')."""
    x = _as_2d(x)
    r2 = jnp.sum(x * x, axis=-1)
    return a * r2 * r2 - b * r2


def step(x, V0: float = 1.0, x0: float = 0.0):
    """V = V0·1[x>x0] (per-dim summed for d>1)."""
    x = _as_2d(x)
    return V0 * jnp.sum((x > x0).astype(x.dtype), axis=-1)


def sine(x, V0: float = 1.0, k: float = 1.0):
    """V = V0·Σ_d sin(k·x_d)."""
    x = _as_2d(x)
    return V0 * jnp.sum(jnp.sin(k * x), axis=-1)


def optical_lattice(x, V0: float = 1.0, k: float = jnp.pi):
    """2D optical lattice V = V0·Σ_d sin²(k·x_d) — symmetry-breaking config
    (BASELINE.json config #4)."""
    x = _as_2d(x)
    return V0 * jnp.sum(jnp.sin(k * x) ** 2, axis=-1)


def scaled(potential: Potential, beta: float) -> Potential:
    """β-scaled potential V_eff = β·V(x) for continuation in potential strength
    (reference: test_perturbing_gamma_and_beta.py:126-135)."""
    def _v(x):
        return beta * potential(x)
    return _v


POTENTIALS = {
    "harmonic": harmonic,
    "gaussian": gaussian,
    "periodic": periodic,
    "box": box,
    "linear": linear,
    "gravity_well": linear,
    "double_well": double_well,
    "step": step,
    "sine": sine,
    "optical_lattice": optical_lattice,
}


def get_potential(name: str, beta: float | None = None, **kwargs) -> Potential:
    """Look up a potential by name, bind kwargs, optionally β-scale it."""
    try:
        fn = POTENTIALS[name]
    except KeyError:
        raise ValueError(f"unknown potential {name!r}; have {sorted(POTENTIALS)}")
    v = functools.partial(fn, **kwargs) if kwargs else fn
    return scaled(v, beta) if beta is not None else v
