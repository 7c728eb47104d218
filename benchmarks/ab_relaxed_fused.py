"""A/B: exact two-pass fused gradient vs one-step-relaxed single-kernel mode,
END TO END on a real family (BASELINE #3 spec: 2D harmonic, 224² = 50k pts,
width-128 net), not just per-step microbenchmarks.

Both arms run the SAME PL-PINN continuation protocol (pretrain → γ ramp with
warm starts, fixed epoch budget, rebase) — the only difference is the fused
kernel mode (pallas/fused_grad.py: the relaxed mode weights the backward with
the PREVIOUS step's scalar cotangents, one kernel/step instead of two; the
reported loss/μ stay exact). Emits per-γ μ for both arms, |Δμ| between arms,
final-γ error vs the float64 imaginary-time oracle, per-step K2−K1 kernel
times, and the end-to-end wall ratio.

Decides (VERDICT r2 #7) whether GPE_TPU_RELAXED_FUSED=1 can default on.

Run on TPU:  python benchmarks/ab_relaxed_fused.py
Writes runs/ab_relaxed_fused/summary.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Budget: the full BASELINE#3 paper protocol (224², 5001 epochs × 8 γ) would
# cost ~8 h per arm on-device — the A/B's decision (relaxed ≡ exact end to
# end?) doesn't need it. 160² (still 1.6× the fused path's 16k gate) at 1200
# epochs over 6 rungs exercises the same continuation dynamics in ~40 min/arm.
GAMMAS = (0.0, 5.0, 10.0, 20.0, 50.0, 100.0)
EPOCHS = 1200
K1, K2 = 30, 120


def _spec():
    from gpe_tpu.train import GPESpec
    return GPESpec(dim=2, lb=-8.0, ub=8.0, n_points=160,
                   layers=(2, 128, 128, 128, 1), activation="shifted_tanh",
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   basis="hermite", kinetic=0.5, nonlinearity="abs_power")


def step_time(spec, relaxed: bool) -> float:
    """Per-step device time of the fused training step via the K2−K1 scan
    regression with a forced fetch (the only honest timing on this image's
    non-synchronizing tunnel backend — see bench.py)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax
    from gpe_tpu.models import mlp
    from gpe_tpu.train import make_batch
    from gpe_tpu.train.problem import make_fused_value_and_grad

    vag = make_fused_value_and_grad(spec, relaxed=relaxed)
    assert vag is not None, "spec must be fused-eligible"
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    g, s = jnp.float32(100.0), jnp.float32(0.01)
    stateful = getattr(vag, "stateful", False)
    vs0 = vag.init_state(params, batch, g, s) if stateful else ()

    def make(K):
        opt_state = opt.init(params)

        @jax.jit
        def run():
            def body(c, _):
                p, st, vs = c
                if stateful:
                    (total, aux), grads, vs = vag(p, batch, g, s, vs)
                else:
                    (total, aux), grads = vag(p, batch, g, s)
                updates, st = opt.update(grads, st, p)
                return (optax.apply_updates(p, updates), st, vs), total
            (_, _, _), tots = lax.scan(body, (params, opt_state, vs0),
                                       None, length=K)
            return tots[-1]
        return run

    f1, f2 = make(K1), make(K2)
    float(f1())
    float(f2())

    def best(f):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(f2) - best(f1)) / (K2 - K1), 1e-9)


def run_arm(spec, relaxed: bool):
    from gpe_tpu.train import train_plpinn
    if relaxed:
        os.environ["GPE_TPU_RELAXED_FUSED"] = "1"
    else:
        os.environ.pop("GPE_TPU_RELAXED_FUSED", None)
    t0 = time.time()
    res = train_plpinn(spec, GAMMAS, modes=(0,), epochs=EPOCHS, tol=0.0,
                       patience=10**9, rebase=True, keep_params=False,
                       verbose=True)
    wall = time.time() - t0
    return dict(res.mu_table[0]), wall


def main():
    import numpy as np
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    spec = _spec()

    dt_exact = step_time(spec, relaxed=False)
    dt_relaxed = step_time(spec, relaxed=True)
    print(json.dumps({"step_exact_s": dt_exact, "step_relaxed_s": dt_relaxed,
                      "step_speedup": dt_exact / dt_relaxed}), flush=True)

    mu_e, wall_e = run_arm(spec, relaxed=False)
    mu_r, wall_r = run_arm(spec, relaxed=True)

    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe
    x1 = np.linspace(-8, 8, 384)
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    mu_ref, _ = imaginary_time_gpe(0.5 * (X**2 + Y**2), x1[1] - x1[0],
                                   GAMMAS[-1], kinetic=0.5, tau=2e-3,
                                   richardson=True)

    rows = [{"gamma": g, "mu_exact": mu_e[g], "mu_relaxed": mu_r[g],
             "delta_mu": abs(mu_e[g] - mu_r[g])} for g in GAMMAS]
    summary = {
        "spec": "BASELINE#3 2D harmonic 224^2 width-128, PL-PINN rebase ramp",
        "epochs_per_gamma": EPOCHS,
        "rows": rows,
        "max_delta_mu": max(r["delta_mu"] for r in rows),
        "mu_ref_final": mu_ref,
        "final_err_exact": abs(mu_e[GAMMAS[-1]] - mu_ref),
        "final_err_relaxed": abs(mu_r[GAMMAS[-1]] - mu_ref),
        "step_exact_s": dt_exact, "step_relaxed_s": dt_relaxed,
        "step_speedup": round(dt_exact / dt_relaxed, 4),
        "wall_exact_s": round(wall_e, 1), "wall_relaxed_s": round(wall_r, 1),
        "wall_speedup": round(wall_e / wall_r, 4),
    }
    os.makedirs("runs/ab_relaxed_fused", exist_ok=True)
    with open("runs/ab_relaxed_fused/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
