"""Hybrid Adam → L-BFGS trainer (reference D6: train_pinn_hybrid,
src/gross_pitaevskii_2D.py:325-431 — Adam phase with AMP + grad clip 10, then
an LBFGS closure phase).

TPU-native: the Adam phase is the chunked-scan `fit` loop; the L-BFGS phase is
optax.lbfgs (zoom linesearch, bounded iterations → static shapes) in a jitted
scan. TPUs run bf16/f32 natively without loss scaling, so the AMP GradScaler
machinery has no equivalent here by design (SURVEY.md §2.G mixed-precision row).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpe_tpu.train.loop import FitResult, fit


class HybridResult(NamedTuple):
    params: any
    adam: FitResult
    lbfgs_losses: np.ndarray
    mu: float


@partial(jax.jit, static_argnames=("loss_fn", "steps"))
def _lbfgs_fit(loss_fn, params, batch, gamma, scale, steps):
    opt = optax.lbfgs()

    def scalar_loss(p):
        return loss_fn(p, batch, gamma, scale)[0]

    value_and_grad = optax.value_and_grad_from_state(scalar_loss)

    def step(carry, _):
        p, s, best_p, best_l = carry
        loss, g = value_and_grad(p, state=s)
        updates, s = opt.update(g, s, p, value=loss, grad=g, value_fn=scalar_loss)
        new_p = optax.apply_updates(p, updates)
        improved = loss < best_l
        best_p = jax.tree.map(lambda b, c: jnp.where(improved, c, b), best_p, p)
        best_l = jnp.where(improved, loss, best_l)
        return (new_p, s, best_p, best_l), loss

    init = (params, opt.init(params), params, jnp.asarray(jnp.inf, jnp.float32))
    (p, _, best_p, best_l), losses = jax.lax.scan(step, init, None, length=steps)
    # keep the best-seen iterate (L-BFGS linesearch can end on an uphill step)
    final_loss = loss_fn(p, batch, gamma, scale)[0]
    take_last = final_loss <= best_l
    out = jax.tree.map(lambda b, c: jnp.where(take_last, c, b), best_p, p)
    return out, losses


def fit_hybrid(loss_fn: Callable, params, batch, gamma, scale,
               adam_epochs: int = 1000, adam_lr: float = 1e-3,
               lbfgs_steps: int = 500, clip_norm: float = 10.0,
               tol: float = 0.0, patience: int = 10**9,
               check_every: int = 512) -> HybridResult:
    """Adam warm phase, then L-BFGS refinement. Returns best params and both
    phases' loss histories; μ is evaluated at the final params."""
    from gpe_tpu.train.optimizers import make_optimizer

    gamma = jnp.asarray(gamma, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    opt = make_optimizer("adam", adam_lr, clip_norm=clip_norm)
    adam_res = fit(loss_fn, opt, params, batch, gamma, scale, epochs=adam_epochs,
                   tol=tol, patience=patience, check_every=check_every)
    params = adam_res.final_params
    if lbfgs_steps > 0:
        params, lbfgs_losses = _lbfgs_fit(loss_fn, params, batch, gamma, scale,
                                          lbfgs_steps)
        lbfgs_losses = np.asarray(lbfgs_losses)
    else:
        lbfgs_losses = np.zeros((0,))
    mu = float(loss_fn(params, batch, gamma, scale)[1]["mu"])
    return HybridResult(params, adam_res, lbfgs_losses, mu)
