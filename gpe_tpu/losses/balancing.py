"""Loss-weighting strategies: fixed, self-adaptive, ReLoBRaLo.

Parity with reference C10-C12 (SURVEY.md). All are pure functions so they can
live inside a jitted `lax.scan` training loop:

- fixed: weighted sum with static weights (paper: pde + 10·bc + 20·norm,
  harmonic_pinn_simulation.py:342-355).
- self-adaptive: learnable log_alpha ∈ params, weights = exp(log_alpha),
  trained jointly (src/..._Self_Adaptive.py:58-59,395-427).
- ReLoBRaLo (Relative Loss Balancing with Random Lookback,
  src/gross_pitaevskii_2D_ReLoBRaLo.py:18-61,259-344): softmax of loss ratios
  vs last/initial losses, Bernoulli(ρ) lookback, EMA α — state carried through
  the scan as a pytree with the RNG key folded in.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def fixed_weights_total(losses: dict, weights: dict) -> jnp.ndarray:
    """Σ wᵢ·Lᵢ over the keys present in `weights` (missing keys → weight 0)."""
    total = 0.0
    for k, w in weights.items():
        if k in losses:
            total = total + w * losses[k]
    return total


def init_log_alpha(names: Sequence[str]):
    """Learnable log-weights, one per loss term, initialized to 0 (weight 1)."""
    return {k: jnp.zeros(()) for k in names}


def self_adaptive_total(losses: dict, log_alpha: dict,
                        base_weights: dict | None = None) -> jnp.ndarray:
    """Self-adaptive weighted total: Σ wᵢ·exp(log_alphaᵢ)·Lᵢ with log_alpha in
    the trainable params pytree (reference C11, ..._Self_Adaptive.py:58-59).

    The reference minimizes this jointly, which drives log_alpha → −∞ (weights
    collapse; the loss is unbounded below in log_alpha). Here the value is
    identical but log_alpha receives an ASCENT gradient via the
    2·stop_grad(w) − w trick — the SA-PINN min-max semantics: θ descends the
    weighted loss, the weights climb toward the hardest terms."""
    total = 0.0
    for k, la in log_alpha.items():
        if k in losses:
            w = jnp.exp(la) * (1.0 if base_weights is None
                               else base_weights.get(k, 1.0))
            w_eff = 2.0 * jax.lax.stop_gradient(w) - w
            total = total + w_eff * losses[k]
    return total


class ReloBRaLoState(NamedTuple):
    lambdas: jnp.ndarray       # (n_terms,) balancing weights
    last_losses: jnp.ndarray   # (n_terms,)
    init_losses: jnp.ndarray   # (n_terms,)
    step: jnp.ndarray          # ()


def relobralo_init(n_terms: int) -> ReloBRaLoState:
    return ReloBRaLoState(
        lambdas=jnp.ones((n_terms,)),
        last_losses=jnp.ones((n_terms,)),
        init_losses=jnp.ones((n_terms,)),
        step=jnp.zeros((), jnp.int32),
    )


def relobralo_step(state: ReloBRaLoState, losses: jnp.ndarray, key,
                   alpha: float = 0.999, temperature: float = 0.1,
                   rho: float = 0.999, eps: float = 1e-12):
    """One ReLoBRaLo update. losses: (n_terms,) current raw loss values.

    Returns (weights, new_state); weights multiply the raw losses (callers may
    further multiply by manual weights, as the reference does with
    [500,1,2,100,500])."""
    n = losses.shape[0]
    first = state.step == 0
    init_losses = jnp.where(first, losses, state.init_losses)
    last_losses = jnp.where(first, losses, state.last_losses)

    def bal(ref):
        z = losses / (temperature * (ref + eps))
        return n * jax.nn.softmax(z - jnp.max(z))

    lam_hat = bal(last_losses)       # vs previous step
    lam_init = bal(init_losses)      # random lookback target
    use_last = jax.random.bernoulli(key, rho)
    lam_lookback = jnp.where(use_last, lam_hat, lam_init)
    lambdas = alpha * (rho * state.lambdas + (1.0 - rho) * lam_lookback) \
        + (1.0 - alpha) * lam_hat
    lambdas = jnp.where(first, jnp.ones_like(lambdas), lambdas)

    new_state = ReloBRaLoState(lambdas, losses, init_losses, state.step + 1)
    return lambdas, new_state
