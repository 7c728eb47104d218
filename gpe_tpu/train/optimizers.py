"""Optimizer zoo — optax equivalents of the reference's dict-dispatch selection
(src/gross_pitaevskii_1D_Different_Optimizers.py:540-558; SURVEY.md §2.D row D4).

The reference imports {Adam, AdamW, QHAdam, AdaHessian, Ranger21, SophiaH,
Shampoo, AdaBelief, DistributedShampoo}; the TPU-native zoo maps each to the
closest optax transform. Gradient clipping (clip_grad_norm 1.0 in the paper
trainer) composes via `clip_norm`.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class _QHAdamState(NamedTuple):
    count: jnp.ndarray
    m: any
    v: any


def qhadam(learning_rate: float | Callable = 1e-3, b1: float = 0.995,
           b2: float = 0.999, nu1: float = 0.7, nu2: float = 1.0,
           eps: float = 1e-8) -> optax.GradientTransformation:
    """Quasi-hyperbolic Adam (Ma & Yarats 2019) — the reference's QHAdam entry.

    update = [(1−ν₁)g + ν₁·m̂] / (√[(1−ν₂)g² + ν₂·v̂] + ε); ν₁=ν₂=1 recovers
    Adam, ν small interpolates toward plain (R)MSprop/SGD.
    """
    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return _QHAdamState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update(grads, state, params=None):
        count = state.count + 1
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, state.v, grads)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def direction(g, mm, vv):
            m_hat, v_hat = mm / c1, vv / c2
            num = (1 - nu1) * g + nu1 * m_hat
            den = jnp.sqrt((1 - nu2) * g * g + nu2 * v_hat) + eps
            return -lr * num / den

        return (jax.tree.map(direction, grads, m, v),
                _QHAdamState(count, m, v))

    return optax.GradientTransformation(init, update)


class _AdaHessianState(NamedTuple):
    count: jnp.ndarray
    m: any
    v: any


def adahessian(learning_rate: float | Callable = 0.1, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               hessian_power: float = 1.0) -> optax.GradientTransformationExtraArgs:
    """AdaHessian (Yao et al. 2021) — Adam with the second moment tracking a
    Hutchinson estimate of the Hessian diagonal instead of g².

    TPU-native estimator: one forward-over-reverse Hessian-vector product per
    step, D ≈ z ⊙ (H z) with Rademacher z (exact for diagonal Hessians since
    z²=1) — no nested reverse sweeps. Requires `obj_fn` and `key` optax extra
    args (the training loop provides them; see train/loop.py).
    """
    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return _AdaHessianState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update(grads, state, params=None, *, obj_fn=None, key=None, **extra):
        del extra
        if obj_fn is None or key is None:
            raise ValueError("adahessian requires obj_fn= and key= extra args "
                             "(use gpe_tpu.train.fit, which passes them)")
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, len(leaves))
        z = treedef.unflatten([
            jax.random.rademacher(k, l.shape, l.dtype)
            for k, l in zip(keys, leaves)])
        hz = jax.jvp(jax.grad(obj_fn), (params,), (z,))[1]
        diag = jax.tree.map(lambda a, b: a * b, z, hz)

        count = state.count + 1
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda vv, d: b2 * vv + (1 - b2) * d * d, state.v, diag)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        k_pow = hessian_power / 2.0

        def direction(mm, vv):
            return -lr * (mm / c1) / (jnp.power(vv / c2, k_pow) + eps)

        return (jax.tree.map(direction, m, v), _AdaHessianState(count, m, v))

    return optax.GradientTransformationExtraArgs(init, update)


class _PNMState(NamedTuple):
    count: jnp.ndarray
    m_odd: any      # first-moment buffer updated on odd steps (1-based)
    m_even: any     # ... on even steps
    nu: any


def scale_by_pnm(b1: float = 0.9, b2: float = 0.999, pnm_factor: float = 1.0,
                 eps: float = 1e-8) -> optax.GradientTransformation:
    """Positive–negative momentum (AdaPNM form, Xie et al. 2021) — the first
    moment Ranger21 uses in place of Adam's. Two momentum buffers are updated
    on alternating steps (each with β₁² over its two-step cadence) and
    combined as ((1+k)·m_t − k·m_{t−1})/√((1+k)²+k²): the negative weight on
    the stale buffer adds stochastic-gradient-noise-aligned perturbation
    without changing the expected direction. jit-safe (parity via where)."""
    norm = float(jnp.sqrt((1 + pnm_factor) ** 2 + pnm_factor**2))
    b1sq = b1 * b1

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return _PNMState(jnp.zeros((), jnp.int32), zeros(), zeros(), zeros())

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        is_odd = (count % 2).astype(jnp.float32)   # 1.0 on steps 1,3,5,...

        def upd_buf(active, buf, g):
            new = b1sq * buf + (1 - b1sq) * g
            return active * new + (1 - active) * buf

        m_odd = jax.tree.map(lambda mm, g: upd_buf(is_odd, mm, g),
                             state.m_odd, grads)
        m_even = jax.tree.map(lambda mm, g: upd_buf(1 - is_odd, mm, g),
                              state.m_even, grads)
        nu = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g,
                          state.nu, grads)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def direction(mo, me, vv):
            m_t = is_odd * mo + (1 - is_odd) * me
            m_p = is_odd * me + (1 - is_odd) * mo
            m_pn = ((1 + pnm_factor) * m_t - pnm_factor * m_p) / norm
            return (m_pn / c1) / (jnp.sqrt(vv / c2) + eps)

        return (jax.tree.map(direction, m_odd, m_even, nu),
                _PNMState(count, m_odd, m_even, nu))

    return optax.GradientTransformation(init, update)


class _LookaheadState(NamedTuple):
    count: jnp.ndarray
    slow: any


def lookahead(k: int = 5, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a FINAL chain link over plain-pytree
    params (unlike optax.lookahead, no fast/slow param split — the slow
    weights live in the optimizer STATE, so it composes with fit()'s scan
    carry, checkpointing, and shard_map unchanged). Every k-th step the
    incoming update is replaced by one that lands the params on
    slow + α·(fast − slow), and the slow copy moves there too."""
    def init(params):
        return _LookaheadState(jnp.zeros((), jnp.int32),
                               jax.tree.map(jnp.asarray, params))

    def update(updates, state, params):
        assert params is not None, "lookahead needs params in update()"
        count = state.count + 1
        sync = (count % k == 0).astype(jnp.float32)

        slows = jax.tree.map(
            lambda u, p, s: sync * (s + alpha * (p + u - s)) + (1 - sync) * s,
            updates, params, state.slow)
        outs = jax.tree.map(
            lambda u, p, s_new: sync * (s_new - p) + (1 - sync) * u,
            updates, params, slows)
        return outs, _LookaheadState(count, slows)

    return optax.GradientTransformation(init, update)


def ranger21(learning_rate: float | Callable = 1e-3, b1: float = 0.9,
             b2: float = 0.999, weight_decay: float = 1e-4,
             agc_clip: float = 1e-2, warmup_steps: int = 300,
             warmdown_frac: float = 0.28,
             total_steps: int | None = None,
             use_pnm: bool = True, pnm_factor: float = 1.0,
             lookahead_k: int = 5,
             lookahead_alpha: float = 0.5) -> optax.GradientTransformation:
    """Ranger21 (Wright & Demeure 2021) — the reference imports it
    (gross_pitaevskii_1D_Different_Optimizers.py:10) but never dispatches it
    (the optimizers dict :540-556 holds Adam/AdamW/DistributedShampoo only).

    TPU-native composition of its ingredients from optax primitives:
    gradient centralization → adaptive gradient clipping (AGC) →
    positive–negative momentum core (scale_by_pnm; use_pnm=False falls back
    to plain Adam moments) → decoupled weight decay → linear warmup
    (+ linear warmdown when total_steps is given) → lookahead
    (lookahead_k=0 disables). Omitted relative to the original: the
    norm-loss regularizer and stable weight decay (loss-shaping terms, not
    optimizer spine); documented for the parity audit."""
    if callable(learning_rate):
        sched = learning_rate
    elif total_steps is not None:
        down = max(int(warmdown_frac * total_steps), 1)
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate),
             optax.linear_schedule(learning_rate, 1e-8, down)],
            [warmup_steps, max(total_steps - down, warmup_steps)])
    else:
        sched = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    core = (scale_by_pnm(b1, b2, pnm_factor) if use_pnm
            else optax.scale_by_adam(b1=b1, b2=b2))
    links = [
        optax.centralize(),
        optax.adaptive_grad_clip(agc_clip),
        core,
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(sched),
    ]
    if lookahead_k and lookahead_k > 1:
        links.append(lookahead(lookahead_k, lookahead_alpha))
    return optax.chain(*links)


def make_optimizer(name: str, learning_rate: float | Callable = 1e-3,
                   clip_norm: float | None = None,
                   plateau: dict | None = None, **kwargs) -> optax.GradientTransformation:
    """Build an optimizer by name with optional global-norm gradient clipping.

    learning_rate may be a float or an optax schedule (step -> lr).
    `plateau` enables ReduceLROnPlateau semantics (reference D5:
    torch ReduceLROnPlateau(factor=.5, patience=100-500, min_lr=1e-7) stepped
    on the total loss each epoch, gross_pitaevskii_1D_Different_Optimizers.py
    :559-561): the update is scaled by optax.contrib.reduce_on_plateau, which
    consumes the per-step loss via the `value` extra arg that fit()'s step
    already supplies. Keys: factor, patience, min_scale, rtol, cooldown
    (defaults = the reference's settings; min_scale 1e-4 ≈ min_lr/base_lr).
    """
    name = name.lower()
    if name == "adam":
        opt = optax.adam(learning_rate, **kwargs)
    elif name == "adamw":
        # reference betas (0.9, 0.99)
        kwargs.setdefault("b2", 0.99)
        opt = optax.adamw(learning_rate, **kwargs)
    elif name == "qhadam":
        opt = qhadam(learning_rate, **kwargs)
    elif name == "adahessian":
        opt = adahessian(learning_rate, **kwargs)
    elif name == "adabelief":
        opt = optax.adabelief(learning_rate, **kwargs)
    elif name == "sophia":
        opt = optax.contrib.sophia(learning_rate, **kwargs)
    elif name == "rmsprop":
        opt = optax.rmsprop(learning_rate, **kwargs)
    elif name == "sgd":
        opt = optax.sgd(learning_rate, **kwargs)
    elif name == "muon":
        opt = optax.contrib.muon(learning_rate, **kwargs)
    elif name == "prodigy":
        opt = optax.contrib.prodigy(learning_rate, **kwargs)
    elif name == "ranger21":
        opt = ranger21(learning_rate, **kwargs)
    elif name in ("shampoo", "distributed_shampoo"):
        from gpe_tpu.train.shampoo import shampoo
        opt = shampoo(learning_rate, **kwargs)
    elif name == "lbfgs":
        opt = optax.lbfgs(learning_rate, **kwargs)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    if plateau is not None:
        cfg = dict(factor=0.5, patience=500, min_scale=1e-4, rtol=1e-4)
        cfg.update(plateau)
        opt = optax.chain(opt, optax.contrib.reduce_on_plateau(**cfg))

    if clip_norm is not None:
        if name == "adahessian":
            # Adam-family ratios m̂/√v̂ are invariant to a common grad rescale,
            # so pre-clipping is safe. AdaHessian's denominator comes from the
            # UNCLIPPED Hessian diagonal: clipping only the numerator shrinks
            # the update by the clip factor (observed 4e4× on the curriculum
            # loss — the net froze). Clip the preconditioned update instead.
            opt = optax.chain(opt, optax.clip_by_global_norm(clip_norm))
        else:
            opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt
