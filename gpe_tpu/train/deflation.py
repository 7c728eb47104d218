"""Excited states via deflation / orthogonality losses (BASELINE.json
config #5, first half).

The reference obtains excited modes ONLY by seeding the perturbation ansatz
with the n-th linear eigenfunction (base-function selection,
harmonic_pinn_simulation.py:127-134). That breaks down when the linear mode is
a poor guide (strong nonlinearity, symmetry-broken potentials). Deflation
trains modes SEQUENTIALLY: mode n minimizes the usual GPE loss plus an
orthogonality penalty against every previously converged state,

    L_orth = Σ_{k<n} ( ∫ ψ ψ_k dx )²,

which excludes the lower eigenspace without assuming any analytic base.

TPU design: converged lower states are frozen VALUE ARRAYS on the fixed
collocation grid (no frozen-network evaluations in the hot loop); the overlap
integrals are the same psum-aware quadrature as every other reduction, so the
trainer runs unchanged under shard_map.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.train.loop import fit
from gpe_tpu.train.optimizers import make_optimizer
from gpe_tpu.train.problem import GPESpec, make_batch, make_terms_fn
from gpe_tpu.train.schedules import cosine_warm_restarts


class DeflationResult(NamedTuple):
    params_by_mode: dict       # mode index -> best params
    mu_table: list             # [(mode, mu)] ascending
    states: np.ndarray         # (n_modes, N) converged normalized states
    history_by_mode: dict


def make_deflated_loss_fn(spec: GPESpec, orth_weight: float = 100.0):
    """loss_fn(params, batch, gamma, scale) with an orthogonality penalty
    against batch["orth_states"] ((K, N) frozen lower states; K may be 0)."""
    terms_fn = make_terms_fn(spec)
    weights = spec.loss_weights()

    def loss_fn(params, batch, gamma, scale, axis_name=None):
        out = terms_fn(params, batch, gamma, scale, axis_name)
        total = 0.0
        for k, wgt in weights.items():
            if k in out.losses:
                total = total + wgt * out.losses[k]
        aux = dict(out.losses)
        if "orth_states" in batch and batch["orth_states"].shape[0] > 0:
            # normalized overlaps ⟨ψ̂, ψ_k⟩ — scale-invariant, so shrinking
            # ‖ψ‖ cannot cheat the penalty before the norm constraint bites
            nrm2 = jnp.sum(out.u * out.u * batch["w"])
            overlaps = batch["orth_states"] @ (out.u * batch["w"])   # (K,)
            if axis_name is not None:
                overlaps = jax.lax.psum(overlaps, axis_name)
                nrm2 = jax.lax.psum(nrm2, axis_name)
            overlaps = overlaps / jnp.sqrt(nrm2 + 1e-30)
            orth = jnp.sum(overlaps * overlaps)
            total = total + orth_weight * orth
            aux["orth"] = orth
        aux["mu"] = out.mu
        aux["total"] = total
        return total, aux

    return loss_fn


def _make_polish(spec: GPESpec, params_template, steps: int, cg_iters: int):
    """LM solver on the NORMALIZED mesh-free GPE residual (scale-invariant) —
    sharpens each deflated state to the nearby exact eigenpair."""
    from gpe_tpu.ops.rayleigh import hamiltonian_apply
    from gpe_tpu.train.gauss_newton import make_lm_solver

    act = spec.activation

    def residuals(p, b, g, s):
        n = mlp.mlp_vgl(p, b["x"], act)
        norm = jnp.sqrt(jnp.sum(n.value**2 * b["w"]) + 1e-30)
        u = n.value / norm
        lap = n.lap / norm
        hu = hamiltonian_apply(u, lap, b["V"], g, spec.p, spec.kinetic,
                               spec.nonlinearity)
        mu = jnp.sum(u * hu) / (jnp.sum(u * u) + 1e-12)
        return (hu - mu * u) / jnp.sqrt(float(u.shape[0]))

    return make_lm_solver(residuals, params_template, steps=steps,
                          cg_iters=cg_iters)


def _normalized_mu(spec: GPESpec, params, batch, gamma):
    from gpe_tpu.ops.rayleigh import hamiltonian_apply

    n = mlp.mlp_vgl(params, batch["x"], spec.activation)
    norm = jnp.sqrt(jnp.sum(n.value**2 * batch["w"]) + 1e-30)
    u = n.value / norm
    lap = n.lap / norm
    hu = hamiltonian_apply(u, lap, batch["V"], gamma, spec.p, spec.kinetic,
                           spec.nonlinearity)
    return jnp.sum(u * hu) / (jnp.sum(u * u) + 1e-12)


def train_deflation(spec: GPESpec, gamma: float, n_modes: int = 3,
                    epochs: int = 4000, tol: float = 1e-7,
                    patience: int = 10**9, lr: float = 2e-3, seed: int = 0,
                    orth_weight: float = 100.0, check_every: int = 512,
                    polish_steps: int = 0, polish_cg_iters: int = 60,
                    verbose: bool = False) -> DeflationResult:
    """Sequentially train the lowest n_modes eigenstates of the GPE at fixed γ
    with deflation. Uses the vanilla ansatz (no analytic base required).

    Each mode trains from a mode-scaled random init; after convergence the
    normalized state joins the frozen orthogonality set for the next mode."""
    import dataclasses
    spec = dataclasses.replace(spec, use_perturbation=False)
    batch = dict(make_batch(spec, 0))
    loss_fn = make_deflated_loss_fn(spec, orth_weight)
    w = batch["w"]

    states = jnp.zeros((0, batch["x"].shape[0]), spec.dtype)
    params_by_mode, mus, hist = {}, [], {}
    polish = None
    for n in range(n_modes):
        batch["orth_states"] = states
        key = jax.random.PRNGKey(seed + 7 * n)
        params = mlp.init_mlp(key, spec.layers, "mode_scaled", mode=n)
        opt = make_optimizer(
            "adam", cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6),
            clip_norm=1.0)
        res = fit(loss_fn, opt, params, batch, gamma, 1.0, epochs=epochs,
                  tol=tol, patience=patience, check_every=check_every)
        best = res.params
        mu_n = res.mu_best
        if polish_steps > 0:
            if polish is None:
                polish = _make_polish(spec, best, polish_steps, polish_cg_iters)
            best = polish(best, batch, gamma, 1.0).params
            # the polish residual is scale-invariant, so the raw net norm is
            # arbitrary afterwards — μ must be read from the NORMALIZED state
            # (the nonlinear term strength depends on ∫u²=1)
            mu_n = float(_normalized_mu(spec, best, batch, gamma))
        u = mlp.mlp_apply(best, batch["x"], spec.activation)
        u = u / jnp.sqrt(jnp.sum(u * u * w) + 1e-30)
        states = jnp.concatenate([states, u[None, :]], axis=0)
        params_by_mode[n] = best
        mus.append((n, mu_n))
        hist[n] = {"loss": res.loss_history, "mu": res.mu_history}
        if verbose:
            print(f"deflation mode {n}: μ={res.mu_best:.6f} "
                  f"loss={res.best_loss:.3e}")

    return DeflationResult(params_by_mode, mus, np.asarray(states), hist)
