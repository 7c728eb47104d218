"""Spectral-flow distillation: imaginary-time flow targets + network fitting.

The stable successor to the explicit Sobolev flow (sobolev_ngd.py): the
explicit preconditioned step u − η·P(Hu − μu) is unstable wherever the
potential dominates (η·(V−μ) > 2 at the trap edges); the SPLIT-STEP
EXPONENTIAL map is unconditionally stable for any V:

    u ← normalize( e^(−τ(V+γ|u|^{p−1})/2) · F⁻¹ e^(−τc|k|²) F · e^(−τ(V+γ|u|^{p−1})/2) u )

Two phases:

1. INTERLEAVED (on-device, jitted, bf16/f32-fast): each outer step applies a
   few imaginary-time substeps to the NETWORK's values on the uniform
   collocation grid and distills the target back into the network with K
   supervised Adam steps (value-space fit — well-conditioned, unlike residual
   training). This walks the net from the warm start to the neighborhood of
   the ground state at full TPU throughput.

2. ENDGAME (host, float64): the f32 on-device flow carries O(τ) splitting
   bias plus f32 accumulation error; a tolerance-converged float64 split-step
   flow with Richardson extrapolation in τ (validate/imaginary_time.py — the
   same oracle the tests trust) is run FROM the net's values, giving a grid
   ground state accurate to spectral-discretization precision. One long
   distillation fit then transfers it into the network. This costs a few
   seconds of host FFTs per γ — negligible next to the device phase — and
   removes the accuracy ceiling that capped round-1 at ~6e-3.

The network remains the mesh-free carrier of the solution: μ and the PDE
residual are reported from the net's ANALYTIC forward-Laplacian derivatives,
not from the grid.

Boundary handling follows validate/imaginary_time.py: bc="periodic" (FFT)
for confining potentials whose states decay to machine zero inside the box;
bc="dirichlet" (DST-I on the grid's interior points, boundary rows pinned to
ψ=0) for NON-confining potentials — e.g. the optical lattice, BASELINE
config #4 — where the box boundary is a physical part of the Hamiltonian
and the periodic propagator would flow toward a different ground state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpe_tpu.models import mlp
from gpe_tpu.ops.rayleigh import hamiltonian_apply
from gpe_tpu.train.problem import GPESpec
from gpe_tpu.train.pretrain import pretrain_to_base
from gpe_tpu.validate.imaginary_time import imaginary_time_gpe


def dst1(a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Orthonormal DST-I along `axis` via the FFT of the odd extension
    (involutory; matches scipy.fft.dst(type=1, norm="ortho")). Diagonalizes
    the Dirichlet Laplacian on m interior points of a box of length (m+1)·dx
    with modes k_j = πj/L — jnp has no native DST, so this is the on-device
    transform for the bc="dirichlet" flow."""
    a = jnp.moveaxis(a, axis, -1)
    m = a.shape[-1]
    z = jnp.zeros(a.shape[:-1] + (1,), a.dtype)
    ext = jnp.concatenate([z, a, z, -a[..., ::-1]], axis=-1)
    out = -jnp.imag(jnp.fft.fft(ext, axis=-1))[..., 1:m + 1]
    out = out * jnp.sqrt(1.0 / (2.0 * (m + 1))).astype(a.dtype)
    return jnp.moveaxis(out, -1, axis)


class FlowResult(NamedTuple):
    params: any
    mu: float            # μ from the net's analytic derivatives (mesh-free)
    mu_grid: float       # μ of the f64 grid flow (spectral oracle, Richardson)
    pde_loss: float      # mean residual² from analytic derivatives
    mu_history: np.ndarray
    fit_history: np.ndarray
    target: np.ndarray   # converged f64 grid ground state (flat, ∫ψ²=1)


def make_spectral_flow_solver(spec: GPESpec, outer_steps: int = 150,
                              inner_steps: int = 80, tau: float = 2e-2,
                              inner_lr: float = 2e-3, flow_substeps: int = 4,
                              final_inner_steps: int = 2000,
                              final_lbfgs_steps: int = 200,
                              endgame_tau: float = 4e-3,
                              endgame_steps: int = 60000,
                              endgame_tol: float = 1e-13,
                              polish_steps: int = 0,
                              polish_cg_iters: int = 60,
                              bc: str = "periodic"):
    """solver(params, batch, gamma) → FlowResult. Vanilla ansatz (u = net).

    batch must be a full uniform grid from make_batch(spec, mode). With
    bc="dirichlet" the flow runs on the grid's interior points via DST-I
    (boundary rows held at ψ=0 in every distillation target)."""
    n_side = spec.n_points
    dim = spec.dim
    act = spec.activation
    dx = (spec.ub - spec.lb) / (n_side - 1)

    def _bcast(k, axis):            # per-axis symbol → dim-D broadcast shape
        return k.reshape([-1 if j == axis else 1 for j in range(dim)])

    if bc == "periodic":
        k1 = 2.0 * jnp.pi * jnp.fft.fftfreq(n_side, d=dx)
        k2 = sum(_bcast(k1, ax) ** 2 for ax in range(dim))
    elif bc == "dirichlet":
        m = n_side - 2          # interior points; box length L = (m+1)·dx
        kd = jnp.pi * jnp.arange(1, m + 1) / ((m + 1) * dx)
        k2 = sum(_bcast(kd, ax) ** 2 for ax in range(dim))
    else:
        raise ValueError(f"unknown bc {bc!r}")
    kin_prop = jnp.exp(-tau * spec.kinetic * k2)

    inner_opt = optax.adam(inner_lr)
    vol = dx**dim
    _core = (slice(1, -1),) * dim

    def _normalize(u):
        return u / jnp.sqrt(jnp.sum(u * u) * vol + 1e-30)

    def _interior(g):
        return g[_core]

    def _embed(gi):
        full = jnp.zeros((n_side,) * dim, gi.dtype)
        return full.at[_core].set(gi)

    def _to_spec(g):
        if bc == "periodic":
            return jnp.fft.fftn(g)
        for ax in range(dim):
            g = dst1(g, ax)
        return g

    def _from_spec(a):
        if bc == "periodic":
            return jnp.real(jnp.fft.ifftn(a))
        for ax in range(dim):
            a = dst1(a, ax)
        return a

    def _flow_step(u, V, gamma):
        """One block of imaginary-time substeps on the grid values; takes and
        returns the FULL grid (dirichlet: boundary re-pinned to 0)."""
        g = u.reshape((n_side,) * dim)
        Vg = V.reshape((n_side,) * dim)
        if bc == "dirichlet":
            g, Vg = _interior(g), _interior(Vg)
        for _ in range(flow_substeps):
            pot = Vg + gamma * jnp.abs(g) ** (spec.p - 1.0)
            g = g * jnp.exp(-0.5 * tau * pot)
            g = _from_spec(_to_spec(g) * kin_prop)
            pot = Vg + gamma * jnp.abs(g) ** (spec.p - 1.0)
            g = g * jnp.exp(-0.5 * tau * pot)
            g = _normalize(g.ravel()).reshape(g.shape)
        if bc == "dirichlet":
            g = _embed(g)
        return g.ravel()

    def _grid_mu(u, V, gamma):
        g = u.reshape((n_side,) * dim)
        if bc == "dirichlet":
            g = _interior(g)
            V = _interior(V.reshape((n_side,) * dim)).ravel()
        lap = _from_spec(-k2 * _to_spec(g)).ravel()
        hu = hamiltonian_apply(g.ravel(), lap, V, gamma, spec.p, spec.kinetic,
                               spec.nonlinearity)
        return jnp.sum(g.ravel() * hu) * vol

    def _distill_scan(params, opt_state, x, target, length):
        def inner(c, _):
            p, s = c
            def mse(p):
                out = mlp.mlp_apply(p, x, act)
                return jnp.mean((_normalize(out) - target) ** 2)
            l, g = jax.value_and_grad(mse)(p)
            updates, s = inner_opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), l
        return jax.lax.scan(inner, (params, opt_state), None, length=length)

    @jax.jit
    def interleave(params, batch, gamma):
        V = batch["V"]

        def outer(carry, _):
            params, opt_state = carry
            v = mlp.mlp_apply(params, batch["x"], act)
            target = _flow_step(_normalize(v), V, gamma)
            mu_grid = _grid_mu(target, V, gamma)
            (params, opt_state), fits = _distill_scan(
                params, opt_state, batch["x"], target, inner_steps)
            return (params, opt_state), (mu_grid, fits[-1])

        opt_state = inner_opt.init(params)
        (params, opt_state), (mus, fits) = jax.lax.scan(
            outer, (params, opt_state), None, length=outer_steps)
        return params, opt_state, mus, fits

    @jax.jit
    def report(params, batch, gamma):
        # mesh-free report from analytic derivatives
        n = mlp.mlp_vgl(params, batch["x"], act)
        norm = jnp.sqrt(jnp.sum(n.value**2) * vol + 1e-30)
        u = n.value / norm
        lap = n.lap / norm
        hu = hamiltonian_apply(u, lap, batch["V"], gamma, spec.p, spec.kinetic,
                               spec.nonlinearity)
        mu = jnp.sum(u * hu) / (jnp.sum(u * u) + 1e-12)
        r = hu - mu * u
        return mu, jnp.mean(r * r)

    _lm_cache = {}

    def _polish(params, batch, gamma):
        from gpe_tpu.train.gauss_newton import make_lm_solver

        def residuals(p, b, g, s):
            n = mlp.mlp_vgl(p, b["x"], act)
            norm = jnp.sqrt(jnp.sum(n.value**2 * b["w"]) + 1e-30)
            u = n.value / norm
            lap = n.lap / norm
            hu = hamiltonian_apply(u, lap, b["V"], g, spec.p, spec.kinetic,
                                   spec.nonlinearity)
            mu = jnp.sum(u * hu) / (jnp.sum(u * u) + 1e-12)
            return (hu - mu * u) / jnp.sqrt(float(u.shape[0]))

        if "lm" not in _lm_cache:
            _lm_cache["lm"] = make_lm_solver(residuals, params,
                                             steps=polish_steps,
                                             cg_iters=polish_cg_iters)
        return _lm_cache["lm"](params, batch, gamma, 1.0).params

    def solver(params, batch, gamma) -> FlowResult:
        g32 = jnp.asarray(gamma, jnp.float32)
        params, opt_state, mus, fits = interleave(params, batch, g32)

        # Endgame: tolerance-converged float64 flow from the net's values,
        # Richardson-extrapolated in τ (removes the O(τ) renormalization bias).
        v = np.asarray(mlp.mlp_apply(params, batch["x"], act), np.float64)
        u0 = (v / np.sqrt(np.sum(v * v) * vol)).reshape((n_side,) * dim)
        V64 = np.asarray(batch["V"], np.float64).reshape((n_side,) * dim)
        if bc == "dirichlet":
            sl = (slice(1, -1),) * dim
            u0i = u0[sl].copy()
            u0i /= np.sqrt(np.sum(u0i * u0i) * vol)
            mu_grid, psi_i = imaginary_time_gpe(
                V64[sl], dx, float(gamma), kinetic=spec.kinetic, p=spec.p,
                tau=endgame_tau, steps=endgame_steps, tol=endgame_tol,
                psi0=u0i, richardson=True, bc="dirichlet")
            psi = np.zeros((n_side,) * dim)
            psi[sl] = psi_i
        else:
            mu_grid, psi = imaginary_time_gpe(
                V64, dx, float(gamma), kinetic=spec.kinetic, p=spec.p,
                tau=endgame_tau, steps=endgame_steps, tol=endgame_tol, psi0=u0,
                richardson=True)
        target = jnp.asarray(psi.ravel(), batch["x"].dtype)

        # The interleaved phase fits normalize(out), leaving the net's raw
        # scale arbitrary; divide the LINEAR output layer by ‖out‖ exactly so
        # the raw-value fit below starts at the normalized-fit quality instead
        # of spending its budget moving the global scale.
        c = float(np.sqrt(np.sum(v * v) * vol))
        w_last, b_last = params[-1]
        params = tuple(params[:-1]) + ((w_last / c, b_last / c),)

        # Final distillation: fit the RAW net output to the normalized f64
        # target (Adam → LBFGS). Fitting raw values (not normalize(out)) also
        # pins the net's own scale to ∫ψ²=1, so downstream residual polish and
        # reporting see a normalized carrier.
        params, final_mse = pretrain_to_base(
            params, batch["x"], target, act, epochs=final_inner_steps,
            lbfgs_steps=final_lbfgs_steps)

        # Optional Levenberg-Marquardt residual polish: minimizes the
        # MESH-FREE PDE residual of the normalized net (analytic derivatives,
        # no grid target involved), removing the second-order μ bias that the
        # value-space fit leaves behind — measured 5.1e-3 → 4.2e-4 net-vs-grid
        # μ gap on the 2D γ=100 flagship shapes.
        if polish_steps > 0:
            params = _polish(params, batch, g32)

        mu, pde = report(params, batch, g32)

        mu_hist = np.concatenate([np.asarray(mus), [mu_grid]])
        fit_hist = np.concatenate([np.asarray(fits), [final_mse]])
        return FlowResult(params, float(mu), float(mu_grid), float(pde),
                          mu_hist, fit_hist, psi.ravel())

    return solver
