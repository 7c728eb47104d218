"""Compiled training loop: `lax.scan` epochs inside one jit, chunked for
early stopping — the TPU replacement for the reference's Python epoch loop
(harmonic_pinn_simulation.py:328-400).

Semantics preserved from the reference trainer:
- gradient step + scheduler each epoch;
- best-loss state tracked and RESTORED at the end (best_model_state);
- early stop when total loss ≤ tol OR no improvement for `patience` epochs.

The loop runs in chunks of `check_every` compiled epochs; between chunks the
host reads two scalars (done flag, best loss) and decides whether to continue.
Convergence bookkeeping (best params, patience counter, epoch-of-stop) lives
in the scan carry, so a converged run does not waste device work: once `done`
is set the parameter update is masked out.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FitCarry(NamedTuple):
    params: Any
    opt_state: Any
    best_params: Any
    best_loss: jnp.ndarray
    since_improve: jnp.ndarray
    done: jnp.ndarray          # bool: stopped (tol or patience)
    stop_epoch: jnp.ndarray    # epoch index at stop (or total epochs)
    epoch: jnp.ndarray
    vag_state: Any = ()        # state of a STATEFUL value_and_grad_fn (e.g.
    # the relaxed fused kernel's previous-step sums); () when stateless


class FitResult(NamedTuple):
    params: Any                # best params (reference: restore best state)
    final_params: Any          # last-iterate params (for warm starts)
    best_loss: float
    mu: float                  # μ at the final recorded epoch
    epochs_run: int
    loss_history: np.ndarray
    mu_history: np.ndarray
    mu_best: float = 0.0       # μ evaluated at the RESTORED best params — the
    # μ that corresponds to the params actually returned/warm-started (the
    # last-epoch μ can sit a few e-3 away from it at the early-stop point)


@partial(jax.jit, static_argnames=("loss_fn", "optimizer", "check_every", "tol",
                                   "patience", "scale_schedule", "epochs",
                                   "value_and_grad_fn"))
def _run_chunk(loss_fn, optimizer, carry: FitCarry, batch, gamma, scale,
               check_every: int, tol: float, patience: int,
               scale_schedule=None, epochs: int = None,
               value_and_grad_fn=None):
    # Second-order / line-search optimizers (sophia, adahessian, lbfgs) need
    # the objective closure and a PRNG key as optax extra args; plain
    # first-order transforms ignore them (and XLA DCEs the unused closure).
    opt_x = optax.with_extra_args_support(optimizer)

    vag = (jax.value_and_grad(loss_fn, has_aux=True)
           if value_and_grad_fn is None else value_and_grad_fn)
    # stateful vag contract (see pallas/fused_grad.py relaxed mode):
    # vag(params, batch, gamma, scale, state) -> ((loss, aux), grads, state)
    stateful = bool(getattr(vag, "stateful", False))

    def step(c: FitCarry, _):
        s = scale if scale_schedule is None else scale_schedule(c.epoch)
        if stateful:
            (loss, aux), grads, vstate = vag(c.params, batch, gamma, s,
                                             c.vag_state)
        else:
            (loss, aux), grads = vag(c.params, batch, gamma, s)
            vstate = c.vag_state
        obj_fn = lambda p: loss_fn(p, batch, gamma, s)[0]
        key = jax.random.fold_in(jax.random.PRNGKey(0), c.epoch)
        updates, new_opt = opt_x.update(
            grads, c.opt_state, c.params, obj_fn=obj_fn, key=key,
            value=loss, grad=grads, value_fn=obj_fn)
        new_params = optax.apply_updates(c.params, updates)

        # freeze once done (early-stopped) OR past the epoch budget — chunks
        # have a fixed compiled length, so the tail chunk masks the phantom
        # steps to keep the gradient-step count exactly equal to `epochs`
        keep = c.done if epochs is None else (c.done | (c.epoch >= epochs))
        tree_where = lambda old, new: jax.tree.map(lambda a, b: jnp.where(keep, a, b), old, new)
        params = tree_where(c.params, new_params)
        opt_state = tree_where(c.opt_state, new_opt)

        improved = (loss < c.best_loss) & ~keep
        best_loss = jnp.where(improved, loss, c.best_loss)
        best_params = jax.tree.map(lambda bp, p: jnp.where(improved, p, bp),
                                   c.best_params, c.params)
        since = jnp.where(improved, 0, c.since_improve + 1)

        now_done = (loss <= tol) | (since >= patience)
        done = keep | now_done
        stop_epoch = jnp.where(keep, c.stop_epoch,
                               jnp.where(now_done, c.epoch, c.stop_epoch))
        new_c = FitCarry(params, opt_state, best_params, best_loss, since,
                         done, stop_epoch, c.epoch + 1, vstate)
        return new_c, (loss, aux["mu"])

    return jax.lax.scan(step, carry, None, length=check_every)


_EVAL_CACHE: dict = {}


def _jit_eval(loss_fn):
    """Per-loss_fn jitted evaluator (cached so repeated fit() calls across a
    continuation ramp reuse one compilation)."""
    f = _EVAL_CACHE.get(loss_fn)
    if f is None:
        f = jax.jit(loss_fn)
        _EVAL_CACHE[loss_fn] = f
    return f


def _init_carry(optimizer, params, epochs, vag_state=()):
    return FitCarry(
        params=params, opt_state=optimizer.init(params), best_params=params,
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        since_improve=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        stop_epoch=jnp.asarray(epochs, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        vag_state=vag_state,
    )


def fit(loss_fn: Callable, optimizer: optax.GradientTransformation, params,
        batch, gamma, scale, epochs: int = 5001, tol: float = 1e-5,
        patience: int = 2000, check_every: int = 512,
        scale_schedule=None, value_and_grad_fn: Callable = None,
        mesh=None) -> FitResult:
    """Train until convergence or `epochs`, reference early-stop semantics.

    loss_fn(params, batch, gamma, scale) -> (total, aux with 'mu').
    Returns best-loss params (restored) plus last-iterate params for
    continuation warm starts, and per-epoch loss/μ histories.
    `scale_schedule` (epoch -> scale, jnp-traceable) overrides `scale` for
    curriculum-style α-decay mixing.
    `value_and_grad_fn` (same contract as jax.value_and_grad(loss_fn,
    has_aux=True)) swaps in a custom gradient — e.g. the fused Pallas
    training kernel (pallas/fused_grad.py, ~5× the XLA step on TPU).
    `mesh` (jax.sharding.Mesh) turns on collocation-sharded data parallelism:
    the loss (and the second-order optimizers' obj_fn closure) runs under
    shard_map with psum quadrature reductions over ICI, collocation arrays
    sharded on their leading axis, params replicated. Everything else —
    chunked scan, early-stop carry, best-restore, optimizer extra-args —
    is unchanged. Composes with `value_and_grad_fn` when the custom gradient
    is psum-aware (fn.psum_aware — the fused Pallas kernels are): the kernel
    then runs per-device on the local collocation shard with two psums per
    step (global sums before the cotangents, weight-grad tiles after),
    keeping the ~6× fused step on multi-chip. Build the fused vag with
    n_shards=mesh.size so its row tiles divide the LOCAL shard.
    """
    if mesh is not None:
        from gpe_tpu.parallel.mesh import (parallel_loss_cached,
                                           parallel_vag_cached, shard_batch)
        if value_and_grad_fn is not None:
            if not getattr(value_and_grad_fn, "psum_aware", False):
                raise ValueError(
                    "mesh requires a psum-aware value_and_grad_fn (the fused "
                    "Pallas vags are; build via make_fused_value_and_grad "
                    "with n_shards=mesh.size)")
            value_and_grad_fn = parallel_vag_cached(value_and_grad_fn, mesh,
                                                    batch)
        loss_fn = parallel_loss_cached(loss_fn, mesh, batch)
        batch = shard_batch(batch, mesh)
    gamma = jnp.asarray(gamma, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    # a chunk longer than the whole budget just burns masked device steps
    check_every = min(check_every, epochs)
    vag_state = ()
    if value_and_grad_fn is not None and getattr(value_and_grad_fn,
                                                 "stateful", False):
        s0 = scale if scale_schedule is None \
            else scale_schedule(jnp.zeros((), jnp.int32))
        vag_state = value_and_grad_fn.init_state(params, batch, gamma, s0)
    carry = _init_carry(optimizer, params, epochs, vag_state)

    losses, mus = [], []
    steps_done = 0
    while steps_done < epochs:
        n = min(check_every, epochs - steps_done)
        # fixed chunk length keeps one compilation; the tail chunk reuses it
        # (updates past the `epochs` budget are masked inside the chunk)
        carry, (l_hist, mu_hist) = _run_chunk(
            loss_fn, optimizer, carry, batch, gamma, scale, check_every, tol,
            patience, scale_schedule, epochs, value_and_grad_fn)
        losses.append(np.asarray(l_hist[:n]))
        mus.append(np.asarray(mu_hist[:n]))
        steps_done += n
        if bool(carry.done):
            break

    loss_history = np.concatenate(losses) if losses else np.zeros((0,))
    mu_history = np.concatenate(mus) if mus else np.zeros((0,))
    stop_epoch = int(carry.stop_epoch)
    epochs_run = min(stop_epoch, epochs) if bool(carry.done) else steps_done
    # truncate histories at the stop epoch (post-stop entries are frozen repeats)
    loss_history = loss_history[: max(epochs_run, 1)]
    mu_history = mu_history[: max(epochs_run, 1)]

    s_final = scale if scale_schedule is None \
        else scale_schedule(jnp.asarray(epochs_run))
    _, aux_best = _jit_eval(loss_fn)(carry.best_params, batch, gamma, s_final)

    return FitResult(
        params=carry.best_params,
        final_params=carry.params,
        best_loss=float(carry.best_loss),
        mu=float(mu_history[-1]) if mu_history.size else 0.0,
        epochs_run=epochs_run,
        loss_history=loss_history,
        mu_history=mu_history,
        mu_best=float(aux_best["mu"]),
    )


class EnsembleFitResult(NamedTuple):
    params: Any                # best params, leading axis = run
    final_params: Any
    best_loss: np.ndarray      # (R,)
    mu: np.ndarray             # (R,) μ at last epoch
    epochs_run: np.ndarray     # (R,)
    loss_history: np.ndarray   # (R, T)
    mu_history: np.ndarray     # (R, T)
    mu_best: np.ndarray = None  # (R,) μ at the RESTORED best params (the μ
    # matching `params`; last-epoch μ can sit away from it at the stop point)


def fit_ensemble(loss_fn: Callable, optimizer: optax.GradientTransformation,
                 params_batch, batch, gamma, scale, epochs: int = 5001,
                 tol: float = 1e-5, patience: int = 2000,
                 check_every: int = 512,
                 value_and_grad_fn: Callable = None,
                 mesh=None, per_run_batch: dict = None) -> EnsembleFitResult:
    """vmapped multi-run training — R seeds (or modes) advance in ONE compiled
    program, turning the reference's sequential 5-seed loop
    (plot_box_potential_at_ground_state_multiple_runs.py:987-1053) into a
    single batched device computation. Per-run early stopping is carried as a
    done-mask; the host loop exits when every run has stopped.

    params_batch: pytree with leading run axis R on every leaf.
    scale: scalar, or a per-run (R,) vector — the reference protocol gives each
    seed its own q/normal_const perturbation scale.
    gamma: scalar, or a per-run (R,) vector — R independent fits at DIFFERENT
    interaction strengths (e.g. the vanilla baseline's per-checkpoint runs)
    advance as one batched program.
    `mesh` turns on ensemble (run-axis) device parallelism: params, optimizer
    state, and per-run scalars shard across chips on the leading run axis
    (the batch replicates), and XLA partitions the vmapped scan with no
    cross-run communication — embarrassingly linear scaling over ICI.
    R should be a multiple of the mesh size.
    per_run_batch: optional {key: (R, …) array} batch entries that VARY per
    run (vmapped alongside params; overrides same-named shared `batch`
    entries) — e.g. each seed's own rebased perturbation base in the
    PL-PINN-R seed ensemble (experiments/seed_stats.py).
    """
    gamma = jnp.asarray(gamma, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    # same clamp as fit(): a chunk longer than the budget burns masked steps
    check_every = min(check_every, epochs)
    R = jax.tree.leaves(params_batch)[0].shape[0]
    if scale.ndim == 0:
        scale = jnp.full((R,), scale)
    if gamma.ndim == 0:
        gamma = jnp.full((R,), gamma)
    if mesh is not None:
        from gpe_tpu.parallel.mesh import shard_ensemble
        axis = mesh.axis_names[0]
        params_batch = shard_ensemble(params_batch, mesh, axis)
        scale = shard_ensemble(scale, mesh, axis)
        gamma = shard_ensemble(gamma, mesh, axis)
    prb = {k: jnp.asarray(v) for k, v in (per_run_batch or {}).items()}
    if mesh is not None and prb:
        from gpe_tpu.parallel.mesh import shard_ensemble
        prb = shard_ensemble(prb, mesh, mesh.axis_names[0])

    def _merged(be):
        return {**batch, **be} if be else batch

    if value_and_grad_fn is not None and getattr(value_and_grad_fn,
                                                 "stateful", False):
        vs = jax.vmap(lambda p, g, s, be: value_and_grad_fn.init_state(
            p, _merged(be), g, s))(params_batch, gamma, scale, prb)
        carry = jax.vmap(lambda p, v: _init_carry(optimizer, p, epochs, v))(
            params_batch, vs)
    else:
        carry = jax.vmap(lambda p: _init_carry(optimizer, p, epochs))(params_batch)

    run_chunk = jax.vmap(
        lambda c, g, s, be: _run_chunk(loss_fn, optimizer, c, _merged(be),
                                       g, s, check_every, tol, patience,
                                       None, epochs, value_and_grad_fn))

    losses, mus = [], []
    steps_done = 0
    while steps_done < epochs:
        n = min(check_every, epochs - steps_done)
        carry, (l_hist, mu_hist) = run_chunk(carry, gamma, scale, prb)
        losses.append(np.asarray(l_hist[:, :n]))
        mus.append(np.asarray(mu_hist[:, :n]))
        steps_done += n
        if bool(jnp.all(carry.done)):
            break

    loss_history = np.concatenate(losses, axis=1)
    mu_history = np.concatenate(mus, axis=1)
    stop = np.asarray(carry.stop_epoch)
    done = np.asarray(carry.done)
    epochs_run = np.where(done, np.minimum(stop, epochs), steps_done)
    _, aux_best = jax.vmap(
        lambda p, g, s, be: _jit_eval(loss_fn)(p, _merged(be), g, s))(
        carry.best_params, gamma, scale, prb)
    return EnsembleFitResult(
        params=carry.best_params,
        final_params=carry.params,
        best_loss=np.asarray(carry.best_loss),
        mu=mu_history[:, -1] if mu_history.size else np.zeros((R,)),
        epochs_run=epochs_run,
        loss_history=loss_history,
        mu_history=mu_history,
        mu_best=np.asarray(aux_best["mu"]),
    )
