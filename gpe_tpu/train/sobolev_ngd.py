"""Sobolev-preconditioned natural-gradient flow for GPE ground states.

The accuracy engine for strongly-interacting (large γ) states, following the
projected-Sobolev-NGD idea (arXiv:2512.11339): first-order optimizers on the
raw PINN residual stall because the parameter-space metric wildly distorts
function space; instead we descend in FUNCTION space and project back:

1. Evaluate u_θ and its analytic Laplacian (forward-Laplacian pass), normalize.
2. Function-space gradient of the Rayleigh functional at fixed norm:
   r = H[u]u − μu (projected: r ⊥ u).
3. Sobolev/H¹ preconditioning on the uniform collocation grid:
   d = F⁻¹[ F[r] / (1 + α|k|²) ]  — one FFT pair, the TPU-cheap exact inverse
   of (I − αΔ). The preconditioner only shapes the flow; the FIXED POINT is
   the exact PINN solution (r ∥ u pointwise), so grid artifacts do not bias μ.
4. Flow step: target = normalize(u − η·d) on the grid.
5. Project to parameters: K supervised Adam steps on ‖u_θ − target‖² — a
   well-conditioned value-space fit (no Laplacian in the inner objective).

Each outer step = 1 forward-Laplacian pass + 1 FFT pair + K cheap forward
passes, all fused in one jitted lax.scan. Converges where Adam/L-BFGS/LM on
the residual plateau 20-100× higher (see tests).
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


class SNGDResult(NamedTuple):
    params: any
    mu: float
    pde_loss: float
    mu_history: np.ndarray
    loss_history: np.ndarray


def make_sngd_solver(spec: GPESpec, outer_steps: int = 300, inner_steps: int = 60,
                     eta: float = 0.4, alpha: float = 1.0, inner_lr: float = 2e-3):
    """Build solver(params, batch, gamma) -> SNGDResult for a VANILLA ansatz
    (u = net; spec.use_perturbation is ignored — the flow carries the full
    solution). The collocation batch must be a full uniform grid
    (make_batch(spec, mode)), since the preconditioner uses the FFT.
    """
    n_side = spec.n_points
    dim = spec.dim
    act = spec.activation
    dx = (spec.ub - spec.lb) / (n_side - 1)
    k1 = 2.0 * jnp.pi * jnp.fft.fftfreq(n_side, d=dx)
    if dim == 1:
        k2 = k1**2
    else:
        k2 = k1[:, None] ** 2 + k1[None, :] ** 2
    sob = 1.0 / (1.0 + alpha * k2)

    inner_opt = optax.adam(inner_lr)

    @jax.jit
    def run(params, batch, gamma):
        w = batch["w"]

        def outer(carry, _):
            params, opt_state = carry
            n = mlp.mlp_vgl(params, batch["x"], act)
            norm = jnp.sqrt(jnp.sum(n.value**2 * w) + 1e-30)
            u = n.value / norm
            lap = n.lap / norm
            hu = hamiltonian_apply(u, lap, batch["V"], gamma, spec.p,
                                   spec.kinetic, spec.nonlinearity)
            mu = jnp.sum(u * hu * w)
            r = hu - mu * u
            pde = jnp.mean(r * r)

            grid = r.reshape((n_side,) * dim)
            if dim == 1:
                d = jnp.real(jnp.fft.ifft(jnp.fft.fft(grid) * sob)).ravel()
            else:
                d = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(grid) * sob)).ravel()
            target = u - eta * d
            target = target / jnp.sqrt(jnp.sum(target**2 * w) + 1e-30)
            target = target * norm      # back to the net's own scale

            def inner(c, _):
                p, s = c
                def mse(p):
                    v = mlp.mlp_apply(p, batch["x"], act)
                    return jnp.mean((v - target) ** 2)
                l, g = jax.value_and_grad(mse)(p)
                updates, s = inner_opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), l

            (params, opt_state), _ = jax.lax.scan(inner, (params, opt_state),
                                                  None, length=inner_steps)
            return (params, opt_state), (mu, pde)

        opt_state = inner_opt.init(params)
        (params, _), (mus, pdes) = jax.lax.scan(outer, (params, opt_state),
                                                None, length=outer_steps)
        return params, mus, pdes

    def solver(params, batch, gamma) -> SNGDResult:
        params, mus, pdes = run(params, batch, jnp.asarray(gamma, jnp.float32))
        return SNGDResult(params, float(mus[-1]), float(pdes[-1]),
                          np.asarray(mus), np.asarray(pdes))

    return solver
