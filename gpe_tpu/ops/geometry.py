"""Sampling geometries beyond the uniform hypercube grid.

The reference's 2D GPE driver trains on a DISK: interior collocation points
sampled inside a circle with boundary probes on the rim
(gross_pitaevskii_2D.py:277-295, r=π/2 around (π/2,π/2), N_f=10000, N_u=500).

TPU design: deterministic low-discrepancy layouts with STATIC shapes — the
sunflower (Fibonacci/golden-angle) disk layout gives uniform density (so
unweighted means are valid Monte-Carlo quadrature) with far lower variance
than RNG sampling, and the same arrays feed every γ/β step of a continuation
ramp without re-tracing.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_GOLDEN_ANGLE = np.pi * (3.0 - np.sqrt(5.0))


def disk_points(center, radius: float, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """n interior points of a disk, sunflower layout (uniform density).

    r_i = R·√((i+½)/n), θ_i = i·golden-angle — low-discrepancy, deterministic.
    Returns (n, 2)."""
    i = np.arange(n, dtype=np.float64)
    r = radius * np.sqrt((i + 0.5) / n)
    th = i * _GOLDEN_ANGLE
    pts = np.stack([r * np.cos(th), r * np.sin(th)], axis=-1)
    return jnp.asarray(pts + np.asarray(center, np.float64), dtype)


def circle_points(center, radius: float, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """n equispaced points on the circle rim (Dirichlet probes). (n, 2)."""
    th = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    pts = np.stack([radius * np.cos(th), radius * np.sin(th)], axis=-1)
    return jnp.asarray(pts + np.asarray(center, np.float64), dtype)


def disk_weights(radius: float, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Equal-area quadrature weights for `disk_points`: w_i = πR²/n."""
    return jnp.full((n,), np.pi * radius * radius / n, dtype)
