"""A/B: small-N ensemble training at the 1D paper spec (4000 pts, width-64)
— the workload below make_fused_value_and_grad's ≥16k single-run gate.

Paths timed (full training step: gradient + per-run clip + Adam + cosine-WR
LR, inside a compiled scan with forced-fetch K2−K1 regression timing, the
only honest device timing on this image's tunnel backend — see bench.py):

  xla_vmap     jax.value_and_grad vmapped over the R-run ensemble
               (the pre-packing production path at this size)
  fused_vmap   fused Pallas vag vmapped — R kernels, half-empty lanes
  packed       lane-packed fused vag — R//M kernels, full lanes
               (train/packed.py; M = 128//width)
  packed_rlx   packed + one-step-relaxed single-kernel mode

Run on TPU:  python benchmarks/ab_packed_ensemble.py [R]
CPU smoke:   GPE_TPU_AB_INTERPRET=1 JAX_PLATFORMS=cpu python ... (tiny K,
             interpret-mode kernels — correctness only, timings meaningless)
Emits one JSON line; the gate decision this justifies lives in
train/problem.py (single-run ≥16k gate unchanged; ensembles dispatch to the
packed path via compare.train_multiple_runs). VERDICT r1 weak #6.
"""
from __future__ import annotations

import json
import os
import sys
import time

# script lives in benchmarks/ — make the repo root importable without
# PYTHONPATH (which breaks this image's axon plugin registration, CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 30, 120
REPS = 7


def true_time(make_scan):
    f1, f2 = make_scan(K1), make_scan(K2)
    float(f1())
    float(f2())

    def best(f):
        b = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f())
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(f2) - best(f1)) / (K2 - K1), 1e-9)


def main(R: int = 8):
    import os

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    interpret = bool(os.environ.get("GPE_TPU_AB_INTERPRET"))
    if interpret:
        jax.config.update("jax_platforms", "cpu")
        global K1, K2, REPS
        K1, K2, REPS = 1, 2, 1

    from gpe_tpu.models import mlp
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn
    from gpe_tpu.train.packed import (_pick_m, fit_ensemble_packed,
                                      packed_ramp_optimizer)
    from gpe_tpu.train.problem import make_packed_value_and_grad
    from gpe_tpu.train.schedules import cosine_warm_restarts
    from gpe_tpu.pallas.fused_grad import make_pallas_value_and_grad
    from gpe_tpu.pallas.packing import block_masks, pack_params

    spec = GPESpec(lb=-10.0, ub=10.0, potential="harmonic", basis="hermite",
                   p=3.0, n_points=4000, layers=(1, 64, 64, 64, 1),
                   activation="shifted_tanh", kinetic=1.0,
                   nonlinearity="power", bc_weight=10.0, norm_weight=20.0)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    n_pts = batch["x"].shape[0]
    pb = jax.vmap(lambda k: mlp.init_mlp(k, spec.layers, "xavier_uniform"))(
        jax.random.split(jax.random.PRNGKey(0), R))
    gammas = jnp.full((R,), 10.0)
    scales = jnp.full((R,), 0.01)
    sched = cosine_warm_restarts(1e-3, 200, 2, 1e-6)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))

    def ens_scan(vag):
        """Scan of vmapped per-run training steps (fit_ensemble execution)."""
        def one(p, st, g, s):
            (total, aux), grads = vag(p, batch, g, s)
            updates, st = opt.update(grads, st, p)
            return optax.apply_updates(p, updates), st, total

        def make(K):
            st0 = jax.vmap(opt.init)(pb)

            @jax.jit
            def run():
                def body(c, _):
                    p, st = c
                    p, st, tot = jax.vmap(one, in_axes=(0, 0, 0, 0))(
                        p, st, gammas, scales)
                    return (p, st), tot
                (_, _), tots = lax.scan(body, (pb, st0), None, length=K)
                return jnp.sum(tots[-1])
            return run
        return make

    results = {}

    xla_vag = jax.value_and_grad(loss_fn, has_aux=True)
    results["xla_vmap_us"] = true_time(ens_scan(xla_vag)) * 1e6

    fused1 = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=800, sum_tile=800, interpret=interpret)
    results["fused_vmap_us"] = true_time(ens_scan(fused1)) * 1e6

    M = _pick_m(spec.layers, R)
    packed = jax.tree.map(jnp.asarray, pack_params(pb, M))
    gpk, spk = gammas.reshape(R // M, M), scales.reshape(R // M, M)

    def packed_scan(vagM):
        popt = packed_ramp_optimizer(1e-3, "cosine", M)
        stateful = bool(getattr(vagM, "stateful", False))

        def one(p, st, vs, g, s):
            if stateful:
                (total, aux), grads, vs = vagM(p, batch, g, s, vs)
            else:
                (total, aux), grads = vagM(p, batch, g, s)
            updates, st = popt.update(grads, st, p, value=total)
            return optax.apply_updates(p, updates), st, vs, jnp.sum(total)

        def make(K):
            st0 = jax.vmap(popt.init)(packed)
            vs0 = (jax.vmap(lambda p, g, s: vagM.init_state(p, batch, g, s))(
                packed, gpk, spk) if stateful else
                jnp.zeros((R // M, 0), jnp.float32))

            @jax.jit
            def run():
                def body(c, _):
                    p, st, vs = c
                    p, st, vs, tot = jax.vmap(one)(p, st, vs, gpk, spk)
                    return (p, st, vs), jnp.sum(tot)
                (_, _, _), tots = lax.scan(body, (packed, st0, vs0), None,
                                           length=K)
                return tots[-1]
            return run
        return make

    vagM = make_packed_value_and_grad(spec, M, relaxed=False,
                                      interpret=interpret)
    results["packed_us"] = true_time(packed_scan(vagM)) * 1e6
    vagMr = make_packed_value_and_grad(spec, M, relaxed=True,
                                       interpret=interpret)
    results["packed_rlx_us"] = true_time(packed_scan(vagMr)) * 1e6

    out = {"R": R, "M": M, "n_pts": n_pts,
           **{k: round(v, 1) for k, v in results.items()},
           "pts_per_sec_packed": round(R * n_pts / (results["packed_us"] * 1e-6)),
           "speedup_vs_xla": round(results["xla_vmap_us"]
                                   / results["packed_us"], 2),
           "speedup_vs_fused_vmap": round(results["fused_vmap_us"]
                                          / results["packed_us"], 2)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
