"""Benchmark: GPE residual-eval + training-step throughput (pts/sec/chip).

Measures, on the flagship 2D GPE config (BASELINE.json #3: harmonic trap,
~50k collocation points, [2,100,100,100,1] net) on one chip:

1. eval: the FULL loss evaluation — wavefunction, Laplacian (forward-Laplacian
   propagation), Rayleigh-quotient μ, PDE residual MSE, boundary and
   normalization terms. The jitted function returns the TOTAL loss (plus μ),
   so no term is dead-code-eliminated.
2. train: a full training step — value_and_grad of the total loss + Adam
   update (the number that bounds end-to-end epochs/sec).
3. bf16: the eval path with bf16 activations/GEMMs and f32 quadrature
   accumulations (the TPU mixed-precision contract, SURVEY.md §2.G).

Baseline: reference-style residual eval (nested reverse-mode autograd
Laplacian, gross_pitaevskii_2D.py:183-188) in torch on CPU — the reference's
hardware envelope (it publishes no throughput numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

N_SIDE = 224          # 224² = 50176 collocation points (~50k target)
LAYERS = (2, 100, 100, 100, 1)
WARMUP = 3
ITERS = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_torch_baseline.json")
# v5e peak: ~394 TFLOP/s bf16 (the default matmul precision on TPU — what
# this bench's GEMMs actually run at). For the MFU diagnostic only.
PEAK_FLOPS = float(os.environ.get("GPE_TPU_PEAK_FLOPS", 394e12))


def _spec(dtype):
    import jax.numpy as jnp
    from gpe_tpu.train import GPESpec
    return GPESpec(dim=2, n_points=N_SIDE, layers=LAYERS, potential="harmonic",
                   potential_kwargs=(("a", 0.5),), kinetic=0.5, basis="hermite",
                   lb=-6.0, ub=6.0, nonlinearity="abs_power",
                   dtype={"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype])


def _time(fn, *args, batches: int = 5):
    """Median-of-batches timing: robust to the tunnel TPU's transient
    contention without the optimistic bias of a min (a min can catch an
    interval where queued warmup work overlaps the timed batch and report
    MFU > 1)."""
    for _ in range(WARMUP):
        out = fn(*args)
    _block(out)
    times = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _block(out)
        times.append((time.perf_counter() - t0) / ITERS)
    times.sort()
    return times[len(times) // 2]


def _block(out):
    import jax
    jax.block_until_ready(out)


def _gemm_flops_per_eval(n_pts: int, dim: int) -> float:
    """Forward-Laplacian GEMM FLOPs: the (value, d gradient channels, lap)
    stack multiplies every layer GEMM by (dim + 2)."""
    per_pt = sum(2 * a * b for a, b in zip(LAYERS[:-1], LAYERS[1:]))
    return n_pts * per_pt * (dim + 2)


def bench_jax():
    import jax
    import jax.numpy as jnp
    import optax
    from gpe_tpu.models import mlp
    from gpe_tpu.train import make_batch, make_loss_fn

    spec = _spec("f32")
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    n_pts = batch["x"].shape[0]
    gamma, scale = jnp.float32(100.0), jnp.float32(0.01)

    # 1. full loss eval — returns (total, mu): nothing dead-code-eliminated
    eval_fn = jax.jit(lambda p, b, g, s: loss_fn(p, b, g, s)[0])
    dt_eval = _time(eval_fn, params, batch, gamma, scale)

    # 2. full training step (value_and_grad + Adam update)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = opt.init(params)

    # donate params/opt_state: steady-state training reuses their buffers
    # in place (measured ~1.4× on the tunnel TPU vs non-donated)
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, st, b, g, s):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b, g, s)
        updates, st = opt.update(grads, st, p)
        return optax.apply_updates(p, updates), st, total

    def _train_loop_step(p_st):
        p, st, _ = train_step(p_st[0], p_st[1], batch, gamma, scale)
        return (p, st, _)

    p_st = (jax.tree.map(jnp.array, params), opt_state)
    state = (p_st[0], p_st[1], jnp.float32(0))
    for _ in range(WARMUP):
        state = _train_loop_step(state)
    _block(state)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state = _train_loop_step(state)
        _block(state)
        times.append((time.perf_counter() - t0) / ITERS)
    times.sort()
    dt_train = times[len(times) // 2]

    # 3. bf16 eval path (f32 quadrature accumulation)
    spec16 = _spec("bf16")
    batch16 = make_batch(spec16, 0)
    loss16 = make_loss_fn(spec16)
    params16 = mlp.init_mlp(jax.random.PRNGKey(0), spec16.layers,
                            dtype=jnp.bfloat16)
    eval16 = jax.jit(lambda p, b, g, s: loss16(p, b, g, s)[0])
    dt_eval16 = _time(eval16, params16, batch16, gamma, scale)

    # 4. fused Pallas kernel (whole forward-Laplacian MLP + Hamiltonian +
    #    loss reductions VMEM-resident in one kernel)
    pallas_pts_per_sec = float("nan")
    try:
        from gpe_tpu.pallas import make_pallas_loss_eval
        pev = jax.jit(make_pallas_loss_eval(
            spec.layers, spec.activation, spec.p, spec.kinetic,
            spec.nonlinearity, bc_weight=spec.bc_weight,
            norm_weight=spec.norm_weight, tile=1792))
        pfn = lambda p, b, g, s: pev(p, b, g, s)[0]
        dt_pallas = _time(pfn, params, batch, gamma, scale)
        pallas_pts_per_sec = n_pts / dt_pallas
    except Exception as e:
        print(f"pallas bench skipped: {e}", file=sys.stderr)

    total = float(eval_fn(params, batch, gamma, scale))
    mfu = _gemm_flops_per_eval(n_pts, 2) / dt_eval / PEAK_FLOPS
    return {
        "n_pts": n_pts, "total_loss": total,
        "eval_pts_per_sec": n_pts / dt_eval,
        "train_step_pts_per_sec": n_pts / dt_train,
        "bf16_eval_pts_per_sec": n_pts / dt_eval16,
        "pallas_eval_pts_per_sec": pallas_pts_per_sec,
        "eval_mfu": mfu,
    }


def bench_torch_reference():
    """Reference-style residual eval: nested reverse-mode Laplacian in torch on
    CPU (the reference's hardware envelope; it published no throughput numbers)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["pts_per_sec"]

    import torch

    torch.manual_seed(0)
    n = N_SIDE * N_SIDE
    net = torch.nn.Sequential(
        torch.nn.Linear(2, 100), torch.nn.Tanh(),
        torch.nn.Linear(100, 100), torch.nn.Tanh(),
        torch.nn.Linear(100, 100), torch.nn.Tanh(),
        torch.nn.Linear(100, 1),
    )
    x = torch.rand(n, 2, requires_grad=True) * 12.0 - 6.0

    def residual_eval():
        u = net(x)
        grads = torch.autograd.grad(u, x, torch.ones_like(u), create_graph=True)[0]
        u_x, u_y = grads[:, 0:1], grads[:, 1:2]
        u_xx = torch.autograd.grad(u_x, x, torch.ones_like(u_x), create_graph=True)[0][:, 0:1]
        u_yy = torch.autograd.grad(u_y, x, torch.ones_like(u_y), create_graph=True)[0][:, 1:2]
        V = 0.5 * (x[:, 0:1] ** 2 + x[:, 1:2] ** 2)
        hu = -0.5 * (u_xx + u_yy) + V * u + 100.0 * u.abs() ** 2 * u
        mu = (u * hu).mean() / (u * u).mean()
        r = hu - mu * u
        return (r * r).mean()

    residual_eval()  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        residual_eval()
    dt = (time.perf_counter() - t0) / iters
    pts_per_sec = n / dt
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"pts_per_sec": pts_per_sec, "n": n, "sec_per_iter": dt}, f)
    except OSError:
        pass
    return pts_per_sec


def main():
    r = bench_jax()
    try:
        ref_pts_per_sec = bench_torch_reference()
        vs = r["eval_pts_per_sec"] / ref_pts_per_sec
    except Exception as e:  # torch missing/broken — report absolute number
        print(f"torch baseline failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(json.dumps({
        "metric": "gpe2d_loss_eval_pts_per_sec_per_chip",
        "value": round(r["eval_pts_per_sec"]),
        "unit": "collocation_pts/s",
        "vs_baseline": round(vs, 2),
        "train_step_pts_per_sec": round(r["train_step_pts_per_sec"]),
        "bf16_eval_pts_per_sec": round(r["bf16_eval_pts_per_sec"]),
        "pallas_eval_pts_per_sec": (round(r["pallas_eval_pts_per_sec"])
                                    if r["pallas_eval_pts_per_sec"] == r["pallas_eval_pts_per_sec"]
                                    else None),
        "eval_mfu": round(r["eval_mfu"], 4),
        "total_loss": r["total_loss"],
    }))


if __name__ == "__main__":
    main()
