"""On-chip A/B: production fused eval kernel vs the channel-blocked
("rowcat") variant — the one MXU restructuring VERDICT r4 weak #7 left
unmeasured.

Production (`fused_residual.py`): C = d+2 separate (T,128)x(128,128) GEMMs
per layer, channel state in registers (Mosaic-spilled). Rowcat
(`rowcat_eval.py`): one (C*T,128)x(128,128) GEMM per layer with the channel
state blocked into the sublane dimension of a VMEM scratch. Identical MXU
FLOPs — the A/B isolates GEMM-count/pipelining against the explicit VMEM
round-trip.

Timing: the K2-K1 forced-fetch scan regression (bench.py — plain
block_until_ready does not synchronize on this tunnel backend). Both f32
and bf16 compute, tile sweep {1792, 3136}, bench headline shape
(224^2 pts, [2,128,128,128,1]).

Run on TPU: python benchmarks/probe_rowcat_eval.py
Writes runs/bench_r5/rowcat.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 30, 120
REPS = 5
OUT = "runs/bench_r5/rowcat.json"


def _true_time(make_scan):
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


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gpe_tpu.models import mlp
    from gpe_tpu.pallas import make_pallas_loss_eval, make_rowcat_loss_eval
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn

    spec = GPESpec(dim=2, n_points=224, layers=(2, 128, 128, 128, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, basis="hermite", lb=-6.0, ub=6.0,
                   nonlinearity="abs_power", use_perturbation=False)
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    n_pts = batch["x"].shape[0]
    gamma, scale = jnp.float32(100.0), jnp.float32(0.01)
    xla_f = lambda p, b, g_, s_: make_loss_fn(spec)(p, b, g_, s_)[0]
    xtot = float(jax.jit(xla_f)(params, batch, gamma, scale))

    def eval_scan(f):
        def make(K):
            @jax.jit
            def run():
                def body(carry, _):
                    b2 = dict(batch)
                    b2["x"] = batch["x"] + (1e-12 * carry).astype(
                        batch["x"].dtype)
                    tot, _ = f(params, b2, gamma, scale)
                    return tot.astype(jnp.float32), None
                last, _ = lax.scan(body, jnp.float32(0), None, length=K)
                return last
            return run
        return make

    results = {"n_pts": n_pts, "layers": list(spec.layers),
               "device": str(jax.devices()[0].platform), "arms": {}}
    kw = dict(activation=spec.activation, p=spec.p, kinetic=spec.kinetic,
              nonlinearity=spec.nonlinearity, bc_weight=spec.bc_weight,
              norm_weight=spec.norm_weight)
    for name, maker in (("prod", make_pallas_loss_eval),
                        ("rowcat", make_rowcat_loss_eval)):
        for dt_name, cdt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            best = None
            for tile in (1792, 3136):
                arm = f"{name}_{dt_name}_t{tile}"
                try:
                    ev = maker(spec.layers, tile=tile, compute_dtype=cdt,
                               **kw)
                    ptot = float(jax.jit(
                        lambda p, b, g_, s_: ev(p, b, g_, s_)[0])(
                            params, batch, gamma, scale))
                    rel = abs(ptot - xtot) / max(abs(xtot), 1e-12)
                    assert rel < (0.1 if dt_name == "bf16" else 1e-3), (
                        arm, ptot, xtot)
                    dt = _true_time(eval_scan(ev))
                    pts = n_pts / dt
                    results["arms"][arm] = {"dt_s": dt, "pts_per_s": pts,
                                            "rel_err": rel}
                    print(f"{arm}: {pts:.4g} pts/s (rel {rel:.2g})",
                          flush=True)
                    if best is None or pts > best:
                        best = pts
                except AssertionError:
                    raise
                except Exception as e:
                    results["arms"][arm] = {"error": str(e)[:300]}
                    print(f"{arm}: SKIP {e}", file=sys.stderr, flush=True)
            results[f"best_{name}_{dt_name}"] = best

    for dt_name in ("f32", "bf16"):
        p_, r_ = results.get(f"best_prod_{dt_name}"), results.get(
            f"best_rowcat_{dt_name}")
        if p_ and r_:
            results[f"rowcat_speedup_{dt_name}"] = r_ / p_
            print(f"rowcat speedup ({dt_name}): {r_ / p_:.4f}", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
