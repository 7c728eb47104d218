"""Quadrature: grids, weights, and psum-aware reductions.

Every `torch.mean`/`Σ·dx` reduction in the reference (μ numerator/denominator
harmonic_pinn_simulation.py:186-188, normalization :216) becomes a weighted
reduction here, with an optional `axis_name` so the same code runs unchanged
under `shard_map` with collocation points sharded over the mesh — the psum IS
the distributed backend (SURVEY.md §5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_grid(lb, ub, n: int, d: int = 1, endpoint: bool = True) -> jnp.ndarray:
    """Uniform collocation grid on [lb, ub]^d, shape (n^d, d).

    Matches the reference's `torch.linspace(lb, ub, N_f)` collocation setup
    (harmonic_pinn_simulation.py:260)."""
    axes = [jnp.linspace(lb, ub, n, endpoint=endpoint) for _ in range(d)]
    if d == 1:
        return axes[0][:, None]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([m.ravel() for m in mesh], axis=-1)


def trapezoid_weights(lb, ub, n: int, d: int = 1) -> jnp.ndarray:
    """Trapezoid-rule weights for `uniform_grid(lb, ub, n, d)`, shape (n^d,)."""
    h = (ub - lb) / (n - 1)
    w1 = jnp.full((n,), h).at[0].mul(0.5).at[-1].mul(0.5)
    w = w1
    for _ in range(d - 1):
        w = (w[:, None] * w1[None, :]).ravel()
    return w


def riemann_weights(lb, ub, n: int, d: int = 1) -> jnp.ndarray:
    """Plain Riemann weights dx^d (the reference's `Σu²·dx` convention,
    harmonic_pinn_simulation.py:212-217)."""
    h = (ub - lb) / (n - 1)
    total = n**d
    return jnp.full((total,), h**d)


def integrate(fx: jnp.ndarray, w: jnp.ndarray, axis_name: str | None = None) -> jnp.ndarray:
    """∫f ≈ Σᵢ wᵢ f(xᵢ); cross-device psum over `axis_name` when sharded.

    Accumulates in float32 regardless of the element dtype — the TPU-native
    mixed-precision contract (bf16 activations, f32 quadrature accumulations;
    SURVEY.md §2.G)."""
    s = jnp.sum((w * fx).astype(jnp.float32))
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def wmean(fx: jnp.ndarray, axis_name: str | None = None) -> jnp.ndarray:
    """Mean over collocation points, psum-aware (the reference's torch.mean).
    f32 accumulation (see `integrate`)."""
    s = jnp.sum(fx, dtype=jnp.float32)
    n = jnp.asarray(fx.size, jnp.float32)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        n = jax.lax.psum(n, axis_name)
    return s / n
