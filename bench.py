"""Benchmark: GPE residual-eval throughput (collocation pts/sec/chip).

Measures the full PINN residual evaluation — wavefunction, Laplacian (via
forward-Laplacian propagation), Rayleigh-quotient μ, PDE residual MSE — on the
flagship 2D GPE config (BASELINE.json #3: harmonic trap, ~50k collocation
points, [2,100,100,100,1] net) on one chip, and compares against the
CPU/PyTorch reference implementation style (nested `autograd.grad` Laplacian,
gross_pitaevskii_2D.py:183-188) measured in-process.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

N_SIDE = 224          # 224² = 50176 collocation points (~50k target)
LAYERS = (2, 100, 100, 100, 1)
WARMUP = 3
ITERS = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_torch_baseline.json")


def bench_jax():
    import jax
    import jax.numpy as jnp
    from gpe_tpu.models import mlp
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn

    spec = GPESpec(dim=2, n_points=N_SIDE, layers=LAYERS, potential="harmonic",
                   potential_kwargs=(("a", 0.5),), kinetic=0.5, basis="hermite",
                   lb=-6.0, ub=6.0, nonlinearity="abs_power")
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    n_pts = batch["x"].shape[0]

    fn = jax.jit(lambda p, b, g, s: loss_fn(p, b, g, s)[1]["mu"])
    gamma, scale = jnp.float32(100.0), jnp.float32(0.01)
    for _ in range(WARMUP):
        fn(params, batch, gamma, scale).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        mu = fn(params, batch, gamma, scale)
    mu.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return n_pts / dt, n_pts, float(mu)


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
    jax_pts_per_sec, n_pts, mu = bench_jax()
    try:
        ref_pts_per_sec = bench_torch_reference()
        vs = jax_pts_per_sec / ref_pts_per_sec
    except Exception as e:  # torch missing/broken — report absolute number
        print(f"torch baseline failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(json.dumps({
        "metric": "gpe2d_residual_eval_pts_per_sec_per_chip",
        "value": round(jax_pts_per_sec),
        "unit": "collocation_pts/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
