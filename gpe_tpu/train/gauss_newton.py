"""Matrix-free Levenberg-Marquardt / Gauss-Newton trainer for PINN residuals.

Adam stalls at loss floors of ~1e-4..1e-5 on stiff PDE residuals (the
reference's accuracy ceiling); second-order least-squares optimization is the
standard fix (cf. natural-gradient PINN literature, e.g. projected Sobolev
NGD for the GPE, arXiv:2512.11339). This implements damped Gauss-Newton:

    (JᵀJ + λI) δ = Jᵀr,   θ ← θ − δ

with J the Jacobian of the FULL residual vector (PDE residual over all
collocation points + weighted boundary/normalization residuals, μ treated as
a function of θ through the Rayleigh quotient). Everything is matrix-free:
JᵀJ·v = vjp(jvp(v)) — two forward-Laplacian passes per CG iteration, MXU
work only, no J materialization — so it scales to 50k-point 2D problems.
λ adapts by accept/reject trust-region logic inside the compiled scan.

Sum-of-squares convention matches the fit() loss exactly:
  ‖r‖² = pde_mse + bc_weight·bc_mse + norm_weight·(∫u²−1)².
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from gpe_tpu.models import mlp
from gpe_tpu.ops.rayleigh import hamiltonian_apply
from gpe_tpu.train.problem import GPESpec


def make_gpe_residual_fn(spec: GPESpec) -> Callable:
    """residuals(params, batch, gamma, scale) -> 1-D residual vector whose
    sum of squares equals the fit() total loss.

    Uses the SAME ansatz composition as make_terms_fn (hard-BC factor,
    perturbation base arrays) — polishing a different ansatz than the one
    that trained silently optimizes the wrong function."""
    from gpe_tpu.models.ansatz import (box_sine_factor, hard_bc_ansatz,
                                       plain_ansatz)

    act = spec.activation
    raw_vgl = lambda p, x: mlp.mlp_vgl(p, x, act)
    raw_val = lambda p, x: mlp.mlp_apply(p, x, act)
    if spec.hard_bc:
        a = hard_bc_ansatz(raw_vgl, raw_val, box_sine_factor(spec.lb, spec.ub))
    else:
        a = plain_ansatz(raw_vgl, raw_val)

    def residuals(params, batch, gamma, scale):
        n = a.vgl(params, batch["x"], 1.0)
        if spec.use_perturbation:
            u = batch["base_val"] + scale * n.value
            lap = batch["base_lap"] + scale * n.lap
        else:
            u = scale * n.value
            lap = scale * n.lap
        hu = hamiltonian_apply(u, lap, batch["V"], gamma, spec.p, spec.kinetic,
                               spec.nonlinearity)
        den = jnp.sum(u * u)
        mu = jnp.sum(u * hu) / (den + 1e-12)
        r_pde = (hu - mu * u) / jnp.sqrt(float(u.shape[0]))

        bv = a.value(params, batch["bx"], 1.0) * scale
        if spec.use_perturbation:
            bv = batch["base_bval"] + bv
        r_bc = jnp.sqrt(spec.bc_weight / float(bv.shape[0])) * bv

        r_norm = jnp.sqrt(spec.norm_weight) * (jnp.sum(u * u * batch["w"]) - 1.0)
        return jnp.concatenate([r_pde, r_bc, r_norm[None]])

    return residuals


class LMResult(NamedTuple):
    params: any
    loss: float
    loss_history: np.ndarray
    lam_history: np.ndarray


def make_lm_solver(residual_fn: Callable, params_template,
                   steps: int = 100, cg_iters: int = 50, lam0: float = 1e-2,
                   lam_min: float = 1e-9, lam_max: float = 1e6,
                   chunk: int = 20) -> Callable:
    """Build a reusable jitted LM solver: solver(params, batch, γ, s) → LMResult.

    Built ONCE per (problem, net shape): repeated calls across a continuation
    ramp hit the same compiled executable (γ, s are traced scalars).
    The scan is split into `chunk`-step device programs with the (θ, λ) state
    carried across host round-trips: a 120-step LM at 50k-pt 2D is an
    ~11-second single device program, long enough to crash this image's
    tunnel-attached TPU worker — chunking bounds each program to ~2 s with
    negligible fetch overhead.
    """
    _, unravel = ravel_pytree(params_template)
    chunk = max(1, min(chunk, steps))

    @jax.jit
    def run(theta0, lam_in, batch, gamma, scale, n_active):
        # n_active (traced) masks the tail of the last chunk when
        # steps % chunk != 0, so the returned θ has had EXACTLY `steps` LM
        # iterations and LMResult.final_loss corresponds to LMResult.params
        def rflat(theta):
            return residual_fn(unravel(theta), batch, gamma, scale)

        def lm_step(carry, i):
            theta, lam = carry
            active = i < n_active
            r, vjp = jax.vjp(rflat, theta)
            loss = jnp.sum(r * r)
            g = vjp(r)[0]

            # Marquardt scaling: damp relative to JᵀJ's magnitude along the
            # gradient direction (matrix-free curvature probe). A fixed λI
            # would swamp JᵀJ whenever the ansatz scale shrinks J globally
            # (q-scaling multiplies every Jacobian entry by ~0.01).
            ghat = g / (jnp.linalg.norm(g) + 1e-30)
            _, jg = jax.jvp(rflat, (theta,), (ghat,))
            curv = jnp.sum(jg * jg) + 1e-30

            def matvec(v):
                _, jv = jax.jvp(rflat, (theta,), (v,))
                return vjp(jv)[0] + lam * curv * v

            delta, _ = jax.scipy.sparse.linalg.cg(matvec, g, maxiter=cg_iters)
            theta_new = theta - delta
            r_new = rflat(theta_new)
            loss_new = jnp.sum(r_new * r_new)
            accept = (loss_new < loss) & jnp.isfinite(loss_new) & active
            theta = jnp.where(accept, theta_new, theta)
            lam = jnp.where(active,
                            jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                                     lam_min, lam_max), lam)
            return (theta, lam), (jnp.minimum(loss, loss_new), lam)

        (theta, lam_out), (losses, lams) = jax.lax.scan(
            lm_step, (theta0, lam_in), jnp.arange(chunk))
        return theta, lam_out, losses, lams

    def solver(params, batch, gamma, scale) -> LMResult:
        theta, _ = ravel_pytree(params)
        # scalars follow θ's dtype so the same solver runs f32 (device) and
        # f64 (host x64 endgame, lm_polish_x64)
        lam = jnp.asarray(lam0, theta.dtype)
        gamma = jnp.asarray(gamma, theta.dtype)
        scale = jnp.asarray(scale, theta.dtype)
        all_losses, all_lams = [], []
        done = 0
        while done < steps:
            n = min(chunk, steps - done)
            theta, lam, losses, lams = run(theta, lam, batch, gamma, scale,
                                           jnp.asarray(n, jnp.int32))
            all_losses.append(np.asarray(losses[:n]))
            all_lams.append(np.asarray(lams[:n]))
            done += n
        losses = np.concatenate(all_losses)
        lams = np.concatenate(all_lams)
        return LMResult(unravel(theta), float(losses[-1]), losses, lams)

    return solver


def lm_polish_x64(residual_fn: Callable, params, batch, gamma, scale,
                  steps: int = 20, cg_iters: int = 60,
                  chunk: int = 10) -> "LMResult":
    """float64 Levenberg–Marquardt ENDGAME on the host CPU.

    Starts from an (f32, device-polished) state and squeezes out the f32
    arithmetic floor: everything — forward-Laplacian, residual, CG — runs in
    f64 under jax.enable_x64(True) on the CPU backend, so the returned
    μ/loss are limited by the ansatz, not the precision. Intended as a short
    tail (the f32 LM has already converged to its floor); a handful of f64
    steps on a 1D problem costs seconds-to-minutes of host time.

    Returns LMResult with f64 params (cast as the caller requires)."""
    import numpy as _np


    cpu = jax.devices("cpu")[0]

    def _to64(a):
        a = _np.asarray(a)
        return jnp.asarray(a.astype(_np.float64) if a.dtype.kind == "f" else a)

    with jax.default_device(cpu), jax.enable_x64(True):
        p64 = jax.tree.map(_to64, params)
        b64 = {k: _to64(v) for k, v in batch.items()}
        lm = make_lm_solver(residual_fn, p64, steps=steps, cg_iters=cg_iters,
                            chunk=chunk)
        return lm(p64, b64, float(gamma), float(scale))
