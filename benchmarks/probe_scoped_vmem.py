"""Probe: does raising `xla_tpu_scoped_vmem_limit_kib` reach the TPU through
this image's tunnel compile helper, and does it unlock larger fused-gradient
tiles?

Route: per-compile `compiler_options` on jit(...).lower().compile() — the
tunnel's compile helper forwards proto-backed xla_* debug options per-compile
(its startup log says so), while env routes are dead: the terminal's
LIBTPU_INIT_ARGS/XLA_FLAGS override the client's, and the LOCAL jax client
aborts parsing TPU-only flags in XLA_FLAGS (parse_flags_from_env fatal).

Builds the pass-2 gradient kernel at the exact shape that OOMed the 16 MiB
scope (width-128 shifted_tanh, tile=784 → Mosaic measured 16.18 MiB,
/tmp/queue_ab_relaxed_fused.log round 3) with the scope raised to 32 MiB, runs
one real step, and times tiles 512/784/1024 so the option's perf value is a
number, not a guess.

Run on TPU:  python benchmarks/probe_scoped_vmem.py
Exit 0 + JSON line; a tile OOM is recorded per-tile instead of aborting.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K1, K2 = 30, 120
COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def step_timer(vag, params, batch, opt):
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    g, s = jnp.float32(100.0), jnp.float32(0.01)

    def make(K):
        opt_state = opt.init(params)

        def run():
            def body(c, _):
                p, st = c
                (total, aux), grads = vag(p, batch, g, s)
                updates, st = opt.update(grads, st, p)
                return (optax.apply_updates(p, updates), st), total
            (_, _), tots = lax.scan(body, (params, opt_state), None, length=K)
            return tots[-1]
        return jax.jit(run).lower().compile(compiler_options=COMPILER_OPTS)

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


def main():
    import jax
    import optax
    from gpe_tpu.models import mlp
    from gpe_tpu.pallas.fused_grad import make_pallas_value_and_grad
    from gpe_tpu.train import GPESpec, make_batch

    spec = GPESpec(dim=2, lb=-8.0, ub=8.0, n_points=224,
                   layers=(2, 128, 128, 128, 1), activation="shifted_tanh",
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   basis="hermite", kinetic=0.5, nonlinearity="abs_power")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    out = {"n_pts": int(batch["x"].shape[0])}
    # 512 fits the 16 MiB scope; 784 OOMed it (16.18 MiB); 1024 needs ~21 MiB
    for tile in (512, 784, 1024):
        try:
            vag = make_pallas_value_and_grad(
                spec.layers, spec.activation, spec.p, spec.kinetic,
                spec.nonlinearity, bc_weight=spec.bc_weight,
                norm_weight=spec.norm_weight, tile=tile, sum_tile=1792)
            dt = step_timer(vag, params, batch, opt)
            out[f"step_s_tile{tile}"] = dt
            out[f"pts_per_sec_tile{tile}"] = out["n_pts"] / dt
        except Exception as e:
            out[f"tile{tile}_error"] = str(e)[:300]
    if "step_s_tile784" in out and "step_s_tile512" in out:
        out["speedup_784_over_512"] = (out["step_s_tile512"]
                                       / out["step_s_tile784"])
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
