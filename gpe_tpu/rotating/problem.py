"""Rotating-frame GPE with complex ψ — vortex states (BASELINE config #5).

The wavefunction is COMPLEX: the network outputs (Re ψ, Im ψ) as a 2-channel
MLP, and the forward-Laplacian propagation delivers value/Jacobian/Laplacian
for both channels in the same stacked GEMMs (ops/laplacian.py handles
multi-output nets natively — the TPU cost of the complex problem is one extra
output column, not a second network).

Hamiltonian (ψ = a + ib, ρ = a² + b², L_z = −i(x∂_y − y∂_x)):

    H ψ|_re = −c·Δa + (V + γρ)·a − Ω·(x·b_y − y·b_x)
    H ψ|_im = −c·Δb + (V + γρ)·b + Ω·(x·a_y − y·a_x)

μ = ⟨ψ, Hψ⟩/⟨ψ, ψ⟩ (real — H is Hermitian), residual r = Hψ − μψ, and
⟨L_z⟩ = ∫ a(x b_y − y b_x) − b(x a_y − y a_x).

Solver: distillation from the float64 ADI imaginary-time oracle
(validate/rotating.py) into the complex net, then an optional
Levenberg-Marquardt polish of the normalized complex residual — the same
architecture that drives the non-rotating flagship to 1e-6 μ error.

This capability goes beyond the reference (real ψ only, no rotation).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.ops import quadrature


@dataclass(frozen=True)
class RotatingSpec:
    lb: float = -8.0
    ub: float = 8.0
    n_points: int = 96                      # grid side (n² collocation points)
    layers: tuple = (2, 100, 100, 100, 2)   # 2 outputs: (Re ψ, Im ψ)
    activation: str = "tanh"
    init_scheme: str = "xavier_uniform"     # "siren" pairs with activation="sin"
    w0: float = 4.0                         # siren first-layer frequency reach
    trap: float = 0.5                       # V = trap·r²  (ω_trap² / 2)
    kinetic: float = 0.5
    gamma: float = 50.0
    omega: float = 0.7                      # rotation rate (< trap frequency)
    bc_weight: float = 10.0
    norm_weight: float = 20.0


def make_rotating_batch(spec: RotatingSpec) -> dict:
    x = quadrature.uniform_grid(spec.lb, spec.ub, spec.n_points, d=2)
    dx = (spec.ub - spec.lb) / (spec.n_points - 1)
    V = spec.trap * jnp.sum(x * x, axis=-1)
    w = jnp.full((x.shape[0],), dx * dx, jnp.float32)
    edges = jnp.linspace(spec.lb, spec.ub, 64)
    lo = jnp.full_like(edges, spec.lb)
    hi = jnp.full_like(edges, spec.ub)
    bx = jnp.concatenate([
        jnp.stack([edges, lo], -1), jnp.stack([edges, hi], -1),
        jnp.stack([lo, edges], -1), jnp.stack([hi, edges], -1)], axis=0)
    return {"x": x, "V": V, "w": w, "bx": bx}


def _complex_fields(net, x):
    """(a, b, a_x, a_y, b_x, b_y, lap_a, lap_b) from one fwdlap pass."""
    val, jac, lap = net
    a, b = val[:, 0], val[:, 1]
    a_x, a_y = jac[:, 0, 0], jac[:, 1, 0]
    b_x, b_y = jac[:, 0, 1], jac[:, 1, 1]
    return a, b, a_x, a_y, b_x, b_y, lap[:, 0], lap[:, 1]


def make_rotating_loss_fn(spec: RotatingSpec):
    """loss_fn(params, batch, gamma, omega) -> (total, aux with mu/lz/pde).

    γ and Ω are traced scalars (one compilation serves Ω sweeps)."""
    act = spec.activation
    c = spec.kinetic

    def loss_fn(params, batch, gamma, omega, axis_name=None):
        n = mlp.mlp_vgl(params, batch["x"], act)
        a, b, a_x, a_y, b_x, b_y, lap_a, lap_b = _complex_fields(
            (n.value, n.grad, n.lap), batch["x"])
        X, Y = batch["x"][:, 0], batch["x"][:, 1]
        rho = a * a + b * b

        def _red(v):
            s = jnp.sum(v, dtype=jnp.float32)
            if axis_name is not None:
                s = jax.lax.psum(s, axis_name)
            return s

        Veff = batch["V"] + gamma * rho
        h_re = -c * lap_a + Veff * a - omega * (X * b_y - Y * b_x)
        h_im = -c * lap_b + Veff * b + omega * (X * a_y - Y * a_x)

        n_pts = _red(jnp.ones_like(a))
        den = _red(rho)
        mu = _red(a * h_re + b * h_im) / (den + 1e-12)
        r_re = h_re - mu * a
        r_im = h_im - mu * b
        pde = _red(r_re * r_re + r_im * r_im) / n_pts

        bv = mlp.mlp_apply(params, batch["bx"], act)
        boundary = jnp.mean(bv * bv, dtype=jnp.float32)
        norm = (_red(rho * batch["w"]) - 1.0) ** 2

        lz = _red((a * (X * b_y - Y * b_x) - b * (X * a_y - Y * a_x))
                  * batch["w"]) / (_red(rho * batch["w"]) + 1e-12)

        total = pde + spec.bc_weight * boundary + spec.norm_weight * norm
        aux = {"pde": pde, "boundary": boundary, "norm": norm, "mu": mu,
               "lz": lz, "total": total}
        return total, aux

    return loss_fn


class RotatingResult(NamedTuple):
    params: any
    mu: float            # mesh-free μ (net's analytic derivatives)
    mu_grid: float       # f64 ADI oracle μ
    lz: float            # mesh-free ⟨L_z⟩
    lz_grid: float
    n_vortices: int
    pde_loss: float
    fit_mse: float
    energy: float = 0.0  # mesh-free GP energy E[ψ_net] (γ/2 interaction) —
    # the ordering statistic for near-degenerate vortex configurations


def train_rotating_vortex(spec: RotatingSpec, fit_epochs: int = 4000,
                          lbfgs_steps: int = 300, polish_steps: int = 60,
                          polish_cg_iters: int = 60, oracle_tau: float = 2e-3,
                          oracle_steps: int = 40000, seed: int = 0,
                          target=None, sobolev: bool = False,
                          jac_weight: float = 0.1, sobolev_n: int = 0,
                          verbose: bool = False) -> RotatingResult:
    """Solve the rotating-frame GPE: f64 ADI oracle → distill (Re, Im) into
    the complex net → LM polish of the normalized complex residual → report
    the mesh-free μ and ⟨L_z⟩.

    target: optional (psi (n,n) complex, mu_grid, lz_grid) triple replacing
    the internally-run oracle — the configuration-matched path
    (experiments/gpe2d_vortex_config.py) distills a SPECIFIC grid-refined
    vortex configuration rather than whatever basin the default seed finds."""
    from gpe_tpu.train.gauss_newton import make_lm_solver
    from gpe_tpu.train.pretrain import pretrain_to_base
    from gpe_tpu.validate.rotating import (rotating_imaginary_time,
                                           vortex_count)

    batch = make_rotating_batch(spec)
    n_side = spec.n_points
    x1 = np.linspace(spec.lb, spec.ub, n_side)
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    V64 = spec.trap * (X**2 + Y**2)

    if target is not None:
        psi, mu_grid, lz_grid = target
        assert psi.shape == (n_side, n_side), (psi.shape, n_side)
    else:
        mu_grid, psi, lz_grid = rotating_imaginary_time(
            V64, x1, spec.gamma, spec.omega, kinetic=spec.kinetic,
            tau=oracle_tau, steps=oracle_steps)
    nv = vortex_count(psi)
    if verbose:
        print(f"oracle: μ={mu_grid:.6f} Lz={lz_grid:.4f} vortices={nv}")

    target = np.stack([np.real(psi).ravel(), np.imag(psi).ravel()], axis=-1)
    params = mlp.init_mlp(jax.random.PRNGKey(seed), spec.layers,
                          scheme=spec.init_scheme, w0=spec.w0)
    if sobolev:
        # H¹ distillation: supervise ∇ψ too (spectral gradients of the
        # oracle field) — value-only distill underconstrains the
        # derivatives that μ is read from at vortex cores (see
        # train/pretrain.py pretrain_sobolev). sobolev_n runs the distill
        # on its own (coarser) grid: the reverse-over-forward-Laplacian
        # scan crashes the tunnel TPU worker above ~16k points × width
        # ≥176 (reproduced twice, runs/gpe2d_vortex logs), while the LM
        # polish and the mesh-free report keep the full spec grid.
        from gpe_tpu.train.pretrain import pretrain_sobolev
        from gpe_tpu.validate.rotating import _spectral_grads, regrid_psi
        if sobolev_n and sobolev_n != n_side:
            xs = np.linspace(spec.lb, spec.ub, sobolev_n)
            psi_s = regrid_psi(psi, x1, xs)
            ns = sobolev_n
        else:
            xs, psi_s, ns = x1, psi, n_side
        Xs, Ys = np.meshgrid(xs, xs, indexing="ij")
        x_s = np.stack([Xs.ravel(), Ys.ravel()], -1).astype(np.float32)
        tval = np.stack([np.real(psi_s).ravel(),
                         np.imag(psi_s).ravel()], -1).astype(np.float32)
        dxs = float(xs[1] - xs[0])
        gx, gy = _spectral_grads(psi_s, dxs)
        tjac = np.empty((ns * ns, 2, 2), np.float32)
        tjac[:, 0, 0] = np.real(gx).ravel()
        tjac[:, 0, 1] = np.imag(gx).ravel()
        tjac[:, 1, 0] = np.real(gy).ravel()
        tjac[:, 1, 1] = np.imag(gy).ravel()
        params, fit_mse = pretrain_sobolev(
            params, x_s, tval, tjac,
            spec.activation, epochs=fit_epochs, lbfgs_steps=lbfgs_steps,
            jac_weight=jac_weight)
    else:
        params, fit_mse = pretrain_to_base(params, batch["x"],
                                           target.astype(np.float32),
                                           spec.activation,
                                           epochs=fit_epochs,
                                           lbfgs_steps=lbfgs_steps)
    if verbose:
        print(f"distill fit MSE {fit_mse:.3e}")

    loss_fn = make_rotating_loss_fn(spec)
    gamma = jnp.float32(spec.gamma)
    omega = jnp.float32(spec.omega)

    if polish_steps > 0:
        act = spec.activation
        c = spec.kinetic

        def residuals(p, b, g, s):
            n = mlp.mlp_vgl(p, b["x"], act)
            a, bb, a_x, a_y, b_x, b_y, lap_a, lap_b = _complex_fields(
                (n.value, n.grad, n.lap), b["x"])
            norm = jnp.sqrt(jnp.sum((a * a + bb * bb) * b["w"]) + 1e-30)
            a, bb = a / norm, bb / norm
            a_x, a_y, b_x, b_y = (v / norm for v in (a_x, a_y, b_x, b_y))
            lap_a, lap_b = lap_a / norm, lap_b / norm
            X_, Y_ = b["x"][:, 0], b["x"][:, 1]
            rho = a * a + bb * bb
            Veff = b["V"] + g * rho
            h_re = -c * lap_a + Veff * a - s * (X_ * b_y - Y_ * b_x)
            h_im = -c * lap_b + Veff * bb + s * (X_ * a_y - Y_ * a_x)
            mu = jnp.sum(a * h_re + bb * h_im) / (jnp.sum(rho) + 1e-12)
            N = jnp.sqrt(float(a.shape[0]))
            return jnp.concatenate([(h_re - mu * a) / N, (h_im - mu * bb) / N])

        lm = make_lm_solver(residuals, params, steps=polish_steps,
                            cg_iters=polish_cg_iters)
        # the `scale` slot of the LM solver carries Ω (traced scalar)
        polished = lm(params, batch, gamma, omega).params

    # normalized mesh-free report
    def _report(params):
        n = mlp.mlp_vgl(params, batch["x"], spec.activation)
        w = batch["w"]
        rho = jnp.sum(n.value * n.value, axis=-1)
        norm = jnp.sqrt(jnp.sum(rho * w) + 1e-30)
        scaled = (n.value / norm, n.grad / norm, n.lap / norm)
        a, b, a_x, a_y, b_x, b_y, lap_a, lap_b = _complex_fields(
            scaled, batch["x"])
        X_, Y_ = batch["x"][:, 0], batch["x"][:, 1]
        rho = a * a + b * b
        Veff = batch["V"] + gamma * rho
        h_re = -spec.kinetic * lap_a + Veff * a - omega * (X_ * b_y - Y_ * b_x)
        h_im = -spec.kinetic * lap_b + Veff * b + omega * (X_ * a_y - Y_ * a_x)
        mu = jnp.sum(a * h_re + b * h_im) / (jnp.sum(rho) + 1e-12)
        pde = jnp.mean((h_re - mu * a) ** 2 + (h_im - mu * b) ** 2)
        lz_dens = a * (X_ * b_y - Y_ * b_x) - b * (X_ * a_y - Y_ * a_x)
        lz = jnp.sum(lz_dens * w)
        grad2 = (a_x * a_x + a_y * a_y + b_x * b_x + b_y * b_y)
        e = jnp.sum(w * (spec.kinetic * grad2 + batch["V"] * rho
                         + 0.5 * gamma * rho * rho - omega * lz_dens))
        return float(mu), float(pde), float(lz), float(e)

    mu, pde, lz, energy = _report(params)
    if polish_steps > 0:
        # accept the polish only if it kept the vortex structure: LM pulls to
        # the NEAREST residual minimum, and from a loosely-fit multi-vortex
        # state that can be a lower-circulation branch
        mu_p, pde_p, lz_p, e_p = _report(polished)
        if pde_p < pde and abs(lz_p - lz) < 0.2:
            params, mu, pde, lz, energy = polished, mu_p, pde_p, lz_p, e_p
    return RotatingResult(params, mu, float(mu_grid), lz, float(lz_grid),
                          nv, pde, float(fit_mse), energy)
