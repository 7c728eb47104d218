"""Learning-rate schedules (reference D5, SURVEY.md §2.D).

`cosine_warm_restarts` reimplements torch's CosineAnnealingWarmRestarts
(T₀, T_mult) as a pure step→lr function usable inside jit. (The reference
calls `scheduler.step(total_loss)` — a bug that passes the loss as the epoch
number, effectively freezing lr near the max; we implement the correct
schedule and note the difference here for parity audits.)
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_warm_restarts(base_lr: float, T_0: int = 200, T_mult: int = 2,
                         eta_min: float = 1e-6):
    """CosineAnnealingWarmRestarts as an optax schedule (closed form).

    With T_mult>1, cycle k spans T₀·T_mult^k steps starting at T₀·(T_mult^k−1)
    /(T_mult−1); the cycle index is recovered in closed form from the step.
    """
    if T_mult == 1:
        def schedule(step):
            t = jnp.mod(step, T_0) / T_0
            return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))
        return schedule

    log_mult = jnp.log(float(T_mult))

    def schedule(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
        n = s / T_0 * (T_mult - 1) + 1.0
        k = jnp.floor(jnp.log(n) / log_mult)
        start = T_0 * (jnp.power(float(T_mult), k) - 1.0) / (T_mult - 1)
        T_cur = T_0 * jnp.power(float(T_mult), k)
        t = jnp.clip((s - start) / T_cur, 0.0, 1.0)
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def cosine_annealing(base_lr: float, T_max: int, eta_min: float = 1e-5):
    """torch CosineAnnealingLR twin (reference: T_max=epochs/10, η_min=1e−5)."""
    return optax.cosine_decay_schedule(base_lr, T_max, alpha=eta_min / base_lr)


def scale_by_loss_as_step(schedule):
    """Bug-faithful twin of the reference's `scheduler.step(total_loss)`
    (harmonic_pinn_simulation.py:361): torch's CosineAnnealingWarmRestarts
    treats the float argument as the EPOCH, so the effective learning rate is
    the warm-restart schedule evaluated at the current LOSS VALUE — once the
    loss drops below ~1 (≪ T₀=200) that is ≈ max LR forever, warm restarts
    effectively never firing. Reproduced exactly as an optax transform that
    reads the per-step loss from the `value` extra arg (fit() supplies it)
    and applies -schedule(loss) as the step size.

    Compose AFTER the preconditioner: chain(scale_by_adam, this).
    """
    import jax

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None, *, value=None, **extra):
        del params, extra
        if value is None:
            raise ValueError("scale_by_loss_as_step needs the `value` extra "
                             "arg (the per-step loss); fit() provides it")
        lr = schedule(jnp.asarray(value, jnp.float32))
        return jax.tree.map(lambda g: -lr * g, updates), state

    return optax.GradientTransformationExtraArgs(init, update)
