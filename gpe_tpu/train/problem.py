"""Problem assembly for 1D/2D GPE PINN training: spec → batch → loss fn.

This is the TPU-native equivalent of the reference's per-script constant blocks
and loss plumbing (harmonic_pinn_simulation.py:963-1002, :146-217). Everything
analytic and shape-static (grid, quadrature weights, potential values, base
eigenfunction triple) is precomputed ONCE into a `batch` dict of arrays;
the jitted loss takes γ, β, and the perturbation scale as traced scalars so a
single compilation serves the entire continuation ramp.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from gpe_tpu.models import mlp
from gpe_tpu.models.ansatz import box_sine_factor
from gpe_tpu.ops import quadrature
from gpe_tpu.ops.rayleigh import hamiltonian_apply
from gpe_tpu.physics import bases, potentials


@dataclass(frozen=True)
class GPESpec:
    """Static (compile-time) description of a GPE PINN problem.

    Defaults reproduce the reference paper configuration
    (harmonic_pinn_simulation.py:963-986): domain [−10,10], 4000 points,
    [1,64,64,64,1] ShiftedTanh net, −∇²+x², γ·uᵖ nonlinearity, loss
    pde + 10·boundary + 20·norm.
    """
    lb: float = -10.0
    ub: float = 10.0
    n_points: int = 4000
    dim: int = 1
    layers: tuple = (1, 64, 64, 64, 1)
    activation: str = "shifted_tanh"
    potential: str = "harmonic"
    potential_kwargs: tuple = ()            # tuple of (key, value) pairs (hashable)
    basis: str = "hermite"                  # base eigenfunction family
    p: float = 3.0
    kinetic: float = 1.0
    nonlinearity: str = "power"             # refine code: γ·uᵖ
    bc_weight: float = 10.0
    norm_weight: float = 20.0
    sym_weight: float = 0.0
    symmetry: str | None = None             # "even"|"odd"|"interval"
    use_perturbation: bool = True           # PL-PINN vs vanilla PINN
    hard_bc: bool = False                   # box: ψ = sin(πx)·N(x)
    dtype: any = jnp.float32


def base_triple(spec: GPESpec, mode: int, x) -> bases.ValGradLap:
    """Analytic base eigenfunction triple for the spec's basis family.

    In 2D the 1D families promote to tensor products with the mode on the
    first axis (matching the reference's mode-via-base-selection scheme)."""
    if spec.basis == "hermite":
        if spec.dim == 2:
            return bases.hermite_product_2d(mode, 0, x)
        return bases.hermite_basis(mode, x)
    if spec.basis == "box":
        if spec.dim == 2:
            return bases.box_basis_2d(mode, 0, x, L=spec.ub - spec.lb)
        return bases.box_basis(mode, x, L=spec.ub - spec.lb)
    if spec.basis == "airy":
        return bases.airy_basis(mode, x)
    if spec.basis == "hermite2d":
        return bases.hermite_product_2d(mode, 0, x)
    raise ValueError(f"unknown basis {spec.basis!r}")


def make_batch(spec: GPESpec, mode: int) -> dict:
    """Precompute grid, quadrature weights, potential, base triple, boundary data."""
    x = quadrature.uniform_grid(spec.lb, spec.ub, spec.n_points, d=spec.dim).astype(spec.dtype)
    n_total = x.shape[0]
    dx = (spec.ub - spec.lb) / (spec.n_points - 1)
    w = jnp.full((n_total,), dx**spec.dim, spec.dtype)     # reference's Σu²·dx
    vfn = potentials.get_potential(spec.potential, **dict(spec.potential_kwargs))
    V = vfn(x).astype(spec.dtype)

    if spec.dim == 1:
        bx = jnp.array([[spec.lb], [spec.ub]], spec.dtype)
    else:
        # box edges: corners + mid-edges of the hypercube (cheap Dirichlet probe);
        # 2D drivers pass richer boundary sets via batch["bx"] overrides.
        edges = jnp.linspace(spec.lb, spec.ub, 64)
        lo = jnp.full_like(edges, spec.lb)
        hi = jnp.full_like(edges, spec.ub)
        bx = jnp.concatenate([
            jnp.stack([edges, lo], -1), jnp.stack([edges, hi], -1),
            jnp.stack([lo, edges], -1), jnp.stack([hi, edges], -1)], axis=0).astype(spec.dtype)

    batch = {"x": x, "w": w, "V": V, "bx": bx}
    if spec.use_perturbation:
        b = base_triple(spec, mode, x)
        batch["base_val"] = b.value.astype(spec.dtype)
        batch["base_grad"] = b.grad.astype(spec.dtype)
        batch["base_lap"] = b.lap.astype(spec.dtype)
        batch["base_bval"] = base_triple(spec, mode, bx).value.astype(spec.dtype)
    if spec.symmetry is not None:
        if spec.symmetry == "interval":
            batch["x_reflect"] = (spec.lb + spec.ub) - x
        else:
            batch["x_reflect"] = -x
        if spec.use_perturbation:
            batch["base_val_reflect"] = base_triple(spec, mode, batch["x_reflect"]).value.astype(spec.dtype)
    return batch


def make_loss_fn(spec: GPESpec) -> Callable:
    """Build loss_fn(params, batch, gamma, scale) -> (total, aux).

    γ and the q/normal_const scale are traced scalars. β-continuation is
    expressed by passing a pre-scaled batch["V"] or a traced `beta` via
    batch["V"]*beta at the call site of the driver.
    """
    act = spec.activation
    hard = box_sine_factor(spec.lb, spec.ub) if spec.hard_bc else None

    def net_vgl(params, x):
        n = mlp.mlp_vgl(params, x, act)
        if hard is None:
            return n
        g = hard(x)
        val = g.value * n.value
        grad = g.value[:, None] * n.grad + n.value[:, None] * g.grad
        lap = g.value * n.lap + 2.0 * jnp.sum(g.grad * n.grad, axis=-1) + n.value * g.lap
        return bases.ValGradLap(val, grad, lap)

    def net_value(params, x):
        v = mlp.mlp_apply(params, x, act)
        if hard is not None:
            v = hard(x).value * v
        return v

    def loss_fn(params, batch, gamma, scale, axis_name=None):
        n = net_vgl(params, batch["x"])
        if spec.use_perturbation:
            u = batch["base_val"] + scale * n.value
            lap = batch["base_lap"] + scale * n.lap
        else:
            u = scale * n.value
            lap = scale * n.lap

        hu = hamiltonian_apply(u, lap, batch["V"], gamma, spec.p, spec.kinetic,
                               spec.nonlinearity)

        def _red(v):
            s = jnp.sum(v)
            if axis_name is not None:
                s = jax.lax.psum(s, axis_name)
            return s

        n_pts = _red(jnp.ones_like(u))
        den = _red(u * u)
        mu = _red(u * hu) / (den + 1e-12)
        r = hu - mu * u
        pde = _red(r * r) / n_pts

        bv = net_value(params, batch["bx"]) * scale
        if spec.use_perturbation:
            bv = batch["base_bval"] + bv
        boundary = jnp.mean(bv * bv)

        norm = (_red(u * u * batch["w"]) - 1.0) ** 2

        total = pde + spec.bc_weight * boundary + spec.norm_weight * norm
        aux = {"pde": pde, "boundary": boundary, "norm": norm, "mu": mu}

        if spec.symmetry is not None and spec.sym_weight > 0.0:
            vr = net_value(params, batch["x_reflect"]) * scale
            if spec.use_perturbation:
                vr = batch["base_val_reflect"] + vr
            sgn = -1.0 if spec.symmetry == "odd" else 1.0
            sym = _red((u - sgn * vr) ** 2) / n_pts
            total = total + spec.sym_weight * sym
            aux["sym"] = sym

        aux["total"] = total
        return total, aux

    return loss_fn
