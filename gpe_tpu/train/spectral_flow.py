"""Spectral-flow distillation: imaginary-time flow targets + network fitting.

The stable successor to the explicit Sobolev flow (sobolev_ngd.py): the
explicit preconditioned step u − η·P(Hu − μu) is unstable wherever the
potential dominates (η·(V−μ) > 2 at the trap edges); the SPLIT-STEP
EXPONENTIAL map is unconditionally stable for any V:

    u ← normalize( e^(−τ(V+γ|u|^{p−1})/2) · F⁻¹ e^(−τc|k|²) F · e^(−τ(V+γ|u|^{p−1})/2) u )

Each outer step applies one such imaginary-time step to the NETWORK's values
on the uniform collocation grid and then distills the target back into the
network with K supervised Adam steps (value-space fit — well-conditioned,
unlike residual training; see tests/test_train.py evidence and the diagnosis
history in git). The fixed point is the spectral-collocation ground state,
whose μ matches the continuum to grid precision (the same discretization as
validate/imaginary_time.py, machine-accurate on these grids).

The network remains the mesh-free carrier of the solution: μ and the PDE
residual are reported from the net's ANALYTIC forward-Laplacian derivatives,
not from the grid.
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


class FlowResult(NamedTuple):
    params: any
    mu: float            # μ from the net's analytic derivatives (mesh-free)
    mu_grid: float       # μ of the grid flow (spectral oracle at fixed point)
    pde_loss: float      # mean residual² from analytic derivatives
    mu_history: np.ndarray
    fit_history: np.ndarray


def make_spectral_flow_solver(spec: GPESpec, outer_steps: int = 150,
                              inner_steps: int = 80, tau: float = 2e-2,
                              inner_lr: float = 2e-3, flow_substeps: int = 4,
                              final_flow_steps: int = 800,
                              final_inner_steps: int = 800,
                              final_tau: float | None = None):
    """solver(params, batch, gamma) → FlowResult. Vanilla ansatz (u = net).

    batch must be a full uniform grid from make_batch(spec, mode)."""
    n_side = spec.n_points
    dim = spec.dim
    act = spec.activation
    dx = (spec.ub - spec.lb) / (n_side - 1)
    k1 = 2.0 * jnp.pi * jnp.fft.fftfreq(n_side, d=dx)
    k2 = k1**2 if dim == 1 else k1[:, None] ** 2 + k1[None, :] ** 2
    kin_prop = jnp.exp(-tau * spec.kinetic * k2)
    # The Strang fixed point is biased O(τ²); the endgame flow runs at a
    # much smaller step to remove it before the final distillation.
    f_tau = final_tau if final_tau is not None else tau / 8.0
    kin_prop_f = jnp.exp(-f_tau * spec.kinetic * k2)

    inner_opt = optax.adam(inner_lr)
    vol = dx**dim

    def _normalize(u):
        return u / jnp.sqrt(jnp.sum(u * u) * vol + 1e-30)

    def _flow_step(u, V, gamma, step_tau=tau, kprop=None, substeps=flow_substeps):
        kprop = kin_prop if kprop is None else kprop
        g = u.reshape((n_side,) * dim)
        Vg = V.reshape((n_side,) * dim)
        for _ in range(substeps):
            pot = Vg + gamma * jnp.abs(g) ** (spec.p - 1.0)
            g = g * jnp.exp(-0.5 * step_tau * pot)
            if dim == 1:
                g = jnp.real(jnp.fft.ifft(jnp.fft.fft(g) * kprop))
            else:
                g = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(g) * kprop))
            pot = Vg + gamma * jnp.abs(g) ** (spec.p - 1.0)
            g = g * jnp.exp(-0.5 * step_tau * pot)
            g = _normalize(g.ravel()).reshape(g.shape)
        return g.ravel()

    @jax.jit
    def run(params, batch, gamma):
        V = batch["V"]

        def outer(carry, _):
            params, opt_state = carry
            v = mlp.mlp_apply(params, batch["x"], act)
            u = _normalize(v)
            target = _flow_step(u, V, gamma)
            mu_grid = _grid_mu(target, V, gamma)

            def inner(c, _):
                p, s = c
                def mse(p):
                    out = mlp.mlp_apply(p, batch["x"], act)
                    return jnp.mean((_normalize(out) - target) ** 2)
                l, g = jax.value_and_grad(mse)(p)
                updates, s = inner_opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), l

            (params, opt_state), fits = jax.lax.scan(inner, (params, opt_state),
                                                     None, length=inner_steps)
            return (params, opt_state), (mu_grid, fits[-1])

        def _grid_mu(u, V, gamma):
            g = u.reshape((n_side,) * dim)
            if dim == 1:
                lap = jnp.real(jnp.fft.ifft(-k2 * jnp.fft.fft(g))).ravel()
            else:
                lap = jnp.real(jnp.fft.ifft2(-k2 * jnp.fft.fft2(g))).ravel()
            hu = hamiltonian_apply(u, lap, V, gamma, spec.p, spec.kinetic,
                                   spec.nonlinearity)
            return jnp.sum(u * hu) * vol

        opt_state = inner_opt.init(params)
        (params, opt_state), (mus, fits) = jax.lax.scan(outer, (params, opt_state),
                                                        None, length=outer_steps)

        # Endgame: the interleaved fixed point carries an O(fit error / flow
        # contraction) bias. Run the PURE grid flow to convergence from the
        # net's values (this is exactly validate/imaginary_time.py on-device),
        # then one long distillation fit onto the converged target.
        v = mlp.mlp_apply(params, batch["x"], act)
        target = _normalize(v)

        def pure_flow(u, _):
            return _flow_step(u, V, gamma), None

        target, _ = jax.lax.scan(pure_flow, target, None,
                                 length=max(final_flow_steps // (2 * flow_substeps), 1))

        def fine_flow(u, _):
            return _flow_step(u, V, gamma, f_tau, kin_prop_f, flow_substeps), None

        target, _ = jax.lax.scan(fine_flow, target, None,
                                 length=max(final_flow_steps // flow_substeps, 1))
        mu_tau = _grid_mu(target, V, gamma)

        # Richardson over τ: the renormalized splitting biases μ at O(τ)
        # (first order — μ is not stationary w.r.t. the nonlinear term).
        kin_prop_h = jnp.exp(-(f_tau / 2.0) * spec.kinetic * k2)

        def finer_flow(u, _):
            return _flow_step(u, V, gamma, f_tau / 2.0, kin_prop_h, flow_substeps), None

        target, _ = jax.lax.scan(finer_flow, target, None,
                                 length=max(final_flow_steps // flow_substeps, 1))
        mu_tau_half = _grid_mu(target, V, gamma)
        mu_grid_final = 2.0 * mu_tau_half - mu_tau

        def final_inner(c, _):
            p, s = c
            def mse(p):
                out = mlp.mlp_apply(p, batch["x"], act)
                return jnp.mean((_normalize(out) - target) ** 2)
            l, g = jax.value_and_grad(mse)(p)
            updates, s = inner_opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), l

        (params, _), final_fits = jax.lax.scan(final_inner, (params, opt_state),
                                               None, length=final_inner_steps)
        mus = jnp.concatenate([mus, mu_grid_final[None]])
        fits = jnp.concatenate([fits, final_fits[-1:]])

        # mesh-free report from analytic derivatives
        n = mlp.mlp_vgl(params, batch["x"], act)
        norm = jnp.sqrt(jnp.sum(n.value**2) * vol + 1e-30)
        u = n.value / norm
        lap = n.lap / norm
        hu = hamiltonian_apply(u, lap, V, gamma, spec.p, spec.kinetic,
                               spec.nonlinearity)
        den = jnp.sum(u * u)
        mu = jnp.sum(u * hu) / (den + 1e-12)
        r = hu - mu * u
        return params, mu, jnp.mean(r * r), mus, fits

    def solver(params, batch, gamma) -> FlowResult:
        params, mu, pde, mus, fits = run(params, batch, jnp.asarray(gamma, jnp.float32))
        return FlowResult(params, float(mu), float(mus[-1]), float(pde),
                          np.asarray(mus), np.asarray(fits))

    return solver
