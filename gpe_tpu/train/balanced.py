"""ReLoBRaLo-balanced training (reference C12: Relative Loss Balancing with
Random Lookback, src/gross_pitaevskii_2D_ReLoBRaLo.py:18-61,259-344).

The balancing state (λ vector, last/init losses, step counter) and the RNG key
for the Bernoulli lookback live in the compiled scan carry — the TPU-native
version of the reference's Python-side `self.lambdas` bookkeeping. λ updates
see stop-gradient losses (the reference detaches them too: the weights are
treated as constants in the backward pass), and the weighted total multiplies
λ by the manual weights, as the reference does with [500,1,2,100,500].
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpe_tpu.losses.balancing import ReloBRaLoState, relobralo_init, relobralo_step
from gpe_tpu.train.problem import GPESpec, make_terms_fn


class BalancedFitResult(NamedTuple):
    params: any
    mu: float
    best_loss: float
    loss_history: np.ndarray       # (T,) weighted total
    mu_history: np.ndarray         # (T,)
    lambda_history: np.ndarray     # (T, n_terms) balancing weights
    term_names: tuple


@partial(jax.jit, static_argnames=("terms_fn", "optimizer", "names", "length",
                                   "alpha", "temperature", "rho"))
def _run_relobralo(terms_fn, optimizer, params, opt_state, state, key, batch,
                   gamma, scale, manual_w, names, length, alpha, temperature,
                   rho):
    def step(carry, _):
        params, opt_state, state, key = carry
        key, sub = jax.random.split(key)

        def lossf(p):
            out = terms_fn(p, batch, gamma, scale)
            lvec = jnp.stack([out.losses[k] for k in names])
            lam, new_state = relobralo_step(
                state, jax.lax.stop_gradient(lvec), sub, alpha=alpha,
                temperature=temperature, rho=rho)
            lam = jax.lax.stop_gradient(lam)
            total = jnp.sum(lam * manual_w * lvec)
            return total, (out.mu, lam, new_state)

        (total, (mu, lam, new_state)), grads = jax.value_and_grad(
            lossf, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, new_state, key), (total, mu, lam)

    return jax.lax.scan(step, (params, opt_state, state, key), None,
                        length=length)


def fit_relobralo(spec: GPESpec, params, batch, gamma, scale=1.0,
                  epochs: int = 3000, lr: float = 1e-3, seed: int = 0,
                  manual_weights: dict | None = None, alpha: float = 0.999,
                  temperature: float = 0.1, rho: float = 0.999,
                  optimizer=None) -> BalancedFitResult:
    """Train a GPE PINN with ReLoBRaLo loss balancing.

    manual_weights: name -> multiplier applied on top of the balancing λ
    (defaults to spec.loss_weights(), mirroring the reference's manual × λ
    product)."""
    terms_fn = make_terms_fn(spec)
    weights = dict(spec.loss_weights())
    if manual_weights:
        weights.update(manual_weights)
    names = tuple(sorted(weights))
    manual_w = jnp.asarray([weights[k] for k in names], jnp.float32)

    optimizer = optimizer or optax.chain(optax.clip_by_global_norm(1.0),
                                         optax.adam(lr))
    opt_state = optimizer.init(params)
    state = relobralo_init(len(names))
    key = jax.random.PRNGKey(seed)

    (params, _, state, _), (totals, mus, lams) = _run_relobralo(
        terms_fn, optimizer, params, opt_state, state, key, batch,
        jnp.asarray(gamma, jnp.float32), jnp.asarray(scale, jnp.float32),
        manual_w, names, epochs, alpha, temperature, rho)

    totals = np.asarray(totals)
    mus = np.asarray(mus)
    return BalancedFitResult(
        params=params, mu=float(mus[-1]), best_loss=float(totals.min()),
        loss_history=totals, mu_history=mus,
        lambda_history=np.asarray(lams), term_names=names)
