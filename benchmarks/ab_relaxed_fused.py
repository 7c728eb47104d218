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


def step_time(spec, relaxed: bool, refresh_every: int = 0,
              extrapolate: bool = False, exact_until: int = 0,
              fresh_values: bool = False) -> float:
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

    vag = make_fused_value_and_grad(spec, relaxed=relaxed,
                                    refresh_every=refresh_every,
                                    extrapolate=extrapolate,
                                    exact_until=exact_until,
                                    fresh_values=fresh_values)
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


# arm name -> env settings (None value = unset).
# Round-4a arms (committed in runs/ab_relaxed_fused/summary_r4a.json) showed
# periodic refresh K∈{8,32,128} barely moves the γ≥10 bias (2.5-3.0 vs plain
# 3.1) while extrapolation halves it — the bias is a delay-induced feedback
# instability, not accumulated drift. Round-4b arms target the feedback
# channel: fresh_values recomputes the value-only sums S₂/S₃ exactly every
# step (the norm cotangent's sign is the unstable loop), exact_until front-
# loads exact steps into each rung's fast phase.
ARMS = {
    "exact": {"GPE_TPU_RELAXED_FUSED": None},
    "relaxed": {"GPE_TPU_RELAXED_FUSED": "1"},
    "relaxed_extrap": {"GPE_TPU_RELAXED_FUSED": "1",
                       "GPE_TPU_RELAXED_EXTRAP": "1"},
    "relaxed_fresh": {"GPE_TPU_RELAXED_FUSED": "1",
                      "GPE_TPU_RELAXED_FRESH": "1"},
    "relaxed_fresh_extrap": {"GPE_TPU_RELAXED_FUSED": "1",
                             "GPE_TPU_RELAXED_FRESH": "1",
                             "GPE_TPU_RELAXED_EXTRAP": "1"},
    "relaxed_exact300": {"GPE_TPU_RELAXED_FUSED": "1",
                         "GPE_TPU_RELAXED_EXACT_UNTIL": "300"},
    "relaxed_fresh_exact300": {"GPE_TPU_RELAXED_FUSED": "1",
                               "GPE_TPU_RELAXED_FRESH": "1",
                               "GPE_TPU_RELAXED_EXACT_UNTIL": "300"},
}

ENV_KEYS = ("GPE_TPU_RELAXED_FUSED", "GPE_TPU_RELAXED_REFRESH",
            "GPE_TPU_RELAXED_EXTRAP", "GPE_TPU_RELAXED_FRESH",
            "GPE_TPU_RELAXED_EXACT_UNTIL")


def _set_env(env):
    for k in ENV_KEYS:
        os.environ.pop(k, None)
    for k, v in env.items():
        if v is not None:
            os.environ[k] = v


def run_arm(spec, env):
    from gpe_tpu.train import train_plpinn
    _set_env(env)
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

    arm_kw = {
        "exact": dict(relaxed=False),
        "relaxed": dict(relaxed=True),
        "relaxed_extrap": dict(relaxed=True, extrapolate=True),
        "relaxed_fresh": dict(relaxed=True, fresh_values=True),
        "relaxed_fresh_extrap": dict(relaxed=True, fresh_values=True,
                                     extrapolate=True),
        "relaxed_exact300": dict(relaxed=True, exact_until=300),
        "relaxed_fresh_exact300": dict(relaxed=True, fresh_values=True,
                                       exact_until=300),
    }
    steps = {name: step_time(spec, **kw) for name, kw in arm_kw.items()}
    print(json.dumps({f"step_{k}_s": v for k, v in steps.items()}),
          flush=True)

    mus, walls = {}, {}
    for name, env in ARMS.items():
        mus[name], walls[name] = run_arm(spec, env)
        print(json.dumps({"arm": name, "wall_s": round(walls[name], 1),
                          "mu_final": mus[name][GAMMAS[-1]]}), flush=True)

    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe
    x1 = np.linspace(-8, 8, 384)
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    mu_ref, _ = imaginary_time_gpe(0.5 * (X**2 + Y**2), x1[1] - x1[0],
                                   GAMMAS[-1], kinetic=0.5, tau=2e-3,
                                   richardson=True)

    mu_e = mus["exact"]
    rows = []
    for g in GAMMAS:
        row = {"gamma": g, "mu_exact": mu_e[g]}
        for name in ARMS:
            if name == "exact":
                continue
            row[f"mu_{name}"] = mus[name][g]
            row[f"delta_{name}"] = abs(mus[name][g] - mu_e[g])
        rows.append(row)

    summary = {
        "spec": "BASELINE#3-style 2D harmonic 160^2 width-128, PL-PINN "
                "rebase ramp (VERDICT r4 #1 arms)",
        "epochs_per_gamma": EPOCHS,
        "rows": rows,
        "mu_ref_final": mu_ref,
        "final_err": {name: abs(mus[name][GAMMAS[-1]] - mu_ref)
                      for name in ARMS},
        "max_delta_mu": {name: max(abs(mus[name][g] - mu_e[g])
                                   for g in GAMMAS)
                         for name in ARMS if name != "exact"},
        "step_s": steps,
        "step_speedup_vs_exact": {name: round(steps["exact"] / steps[name], 4)
                                  for name in ARMS},
        "wall_s": {name: round(walls[name], 1) for name in ARMS},
        "wall_speedup_vs_exact": {
            name: round(walls["exact"] / walls[name], 4) for name in ARMS},
    }
    os.makedirs("runs/ab_relaxed_fused", exist_ok=True)
    with open("runs/ab_relaxed_fused/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
