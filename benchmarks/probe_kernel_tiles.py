"""Probe: with the fused kernels requesting a 64 MiB Mosaic VMEM limit via
`CompilerParams(vmem_limit_bytes=...)` (fused_residual.kernel_vmem_limit_bytes
— no deployment XLA flag), which row tiles are fastest on the real chip?

Times, at the flagship shape (224² pts, [2,128,128,128,1] shifted_tanh —
the width-128 production spec; tile 784+ OOMed Mosaic's default 16 MiB scope
before the raise):
  - pass-2 gradient kernel tiles 784/896/1024/1568 (full train step,
    K2−K1 scan regression with forced fetch — see bench.py methodology);
  - pass-1/eval kernel tiles 1792/3136/3584/7168 (loss eval scan).

Compiling at tile 784+ at all proves the per-kernel limit reaches Mosaic
through this image's tunnel compile helper. Informs the production tile caps
(train/problem.py) and the bench tile ladder.

Run on TPU:  python benchmarks/probe_kernel_tiles.py
Writes runs/probe_scoped_vmem/tile_sweep.json. Per-tile failures are
recorded, not fatal.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 30, 120
N_SIDE = 224
LAYERS = (2, 128, 128, 128, 1)
GRAD_TILES = (784, 896, 1024, 1568)
EVAL_TILES = (1792, 3136, 3584, 7168)


def _true_time(make_scan):
    f1, f2 = make_scan(K1), make_scan(K2)
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


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax
    from gpe_tpu.models import mlp
    from gpe_tpu.train import GPESpec, make_batch
    from gpe_tpu.pallas import make_pallas_loss_eval
    from gpe_tpu.pallas.fused_grad import make_pallas_value_and_grad

    spec = GPESpec(dim=2, n_points=N_SIDE, layers=LAYERS,
                   activation="shifted_tanh", potential="harmonic",
                   potential_kwargs=(("a", 0.5),), kinetic=0.5,
                   basis="hermite", lb=-6.0, ub=6.0,
                   nonlinearity="abs_power", use_perturbation=False)
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), LAYERS)
    n = batch["x"].shape[0]
    g, s = jnp.float32(100.0), jnp.float32(0.01)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    out = {"n_pts": n, "vmem_limit_kib":
           int(os.environ.get("GPE_TPU_SCOPED_VMEM_KIB", 65536)),
           "grad": {}, "eval": {}}

    for tile in GRAD_TILES:
        try:
            vag = make_pallas_value_and_grad(
                LAYERS, spec.activation, spec.p, spec.kinetic,
                spec.nonlinearity, bc_weight=spec.bc_weight,
                norm_weight=spec.norm_weight, tile=tile, sum_tile=1792)

            def make(K):
                @jax.jit
                def run():
                    def body(c, _):
                        p, st = c
                        (total, aux), grads = vag(p, batch, g, s)
                        updates, st = opt.update(grads, st, p)
                        return (optax.apply_updates(p, updates), st), total
                    (_, _), tots = lax.scan(body, (params, opt.init(params)),
                                            None, length=K)
                    return tots[-1]
                return run

            dt = _true_time(make)
            out["grad"][tile] = {"step_s": dt, "pts_per_sec": n / dt}
        except Exception as e:
            out["grad"][tile] = {"error": str(e)[:300]}
        print(json.dumps({"grad_tile": tile, **out["grad"][tile]}), flush=True)

    for tile in EVAL_TILES:
        try:
            ev = make_pallas_loss_eval(
                LAYERS, spec.activation, spec.p, spec.kinetic,
                spec.nonlinearity, bc_weight=spec.bc_weight,
                norm_weight=spec.norm_weight, tile=tile)

            def make(K):
                @jax.jit
                def run():
                    def body(carry, _):
                        b2 = dict(batch)
                        b2["x"] = batch["x"] + (1e-12 * carry).astype(
                            batch["x"].dtype)
                        total, _ = ev(params, b2, g, s)
                        return total.astype(jnp.float32), None
                    last, _ = lax.scan(body, jnp.float32(0), None, length=K)
                    return last
                return run

            dt = _true_time(make)
            out["eval"][tile] = {"eval_s": dt, "pts_per_sec": n / dt}
        except Exception as e:
            out["eval"][tile] = {"error": str(e)[:300]}
        print(json.dumps({"eval_tile": tile, **out["eval"][tile]}), flush=True)

    os.makedirs("runs/probe_scoped_vmem", exist_ok=True)
    with open("runs/probe_scoped_vmem/tile_sweep.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
