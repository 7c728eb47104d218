"""Disk geometry (reference 2D circular domain) and the bf16 mixed-precision
path (bf16 activations/GEMMs with f32 quadrature accumulations)."""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.ops import geometry
from gpe_tpu.train import (GPESpec, fit, make_batch, make_loss_fn,
                           make_optimizer)


DISK = GPESpec(dim=2, lb=-6.0, ub=6.0, n_points=48, geometry="disk",
               n_boundary=128, layers=(2, 24, 24, 1), potential="harmonic",
               potential_kwargs=(("a", 0.5),), kinetic=0.5, basis="hermite",
               nonlinearity="abs_power", use_perturbation=True)


def test_disk_batch_geometry():
    batch = make_batch(DISK, 0)
    n = DISK.n_points ** 2
    assert batch["x"].shape == (n, 2)
    # equal-area weights integrate the disk area exactly
    np.testing.assert_allclose(float(jnp.sum(batch["w"])), np.pi * 36.0,
                               rtol=1e-5)
    # interior points strictly inside, boundary probes exactly on the rim
    r_in = np.linalg.norm(np.asarray(batch["x"]), axis=-1)
    assert r_in.max() < 6.0
    r_b = np.linalg.norm(np.asarray(batch["bx"]), axis=-1)
    np.testing.assert_allclose(r_b, 6.0, rtol=1e-5)


def test_disk_quadrature_recovers_linear_mu():
    # scale=0 → u is the exact 2D Hermite ground state; Rayleigh μ over the
    # sunflower point set must recover μ=1 (−½Δ+½r²) and ∫ψ²≈1
    batch = make_batch(DISK, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), DISK.layers)
    _, aux = make_loss_fn(DISK)(params, batch, 0.0, 0.0)
    assert abs(float(aux["mu"]) - 1.0) < 5e-3
    assert float(aux["norm"]) < 1e-3


def test_disk_training_converges():
    batch = make_batch(DISK, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(1), DISK.layers)
    loss_fn = make_loss_fn(DISK)
    t0, _ = loss_fn(params, batch, 5.0, 0.01)
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    res = fit(loss_fn, opt, params, batch, 5.0, 0.01, epochs=400, tol=-1.0,
              patience=10**9, check_every=200)
    assert res.best_loss < float(t0)
    assert res.mu > 1.0    # repulsive shift


def test_sunflower_uniform_density():
    pts = np.asarray(geometry.disk_points((0.0, 0.0), 1.0, 4000))
    # fraction of points inside r<1/2 ≈ area fraction 1/4 (uniform density)
    frac = float((np.linalg.norm(pts, axis=-1) < 0.5).mean())
    assert abs(frac - 0.25) < 0.01


def test_bf16_path_bounded_mu_drift():
    spec32 = replace(DISK, geometry="square", n_points=64)
    spec16 = replace(spec32, dtype=jnp.bfloat16)
    b32 = make_batch(spec32, 0)
    b16 = make_batch(spec16, 0)
    p32 = mlp.init_mlp(jax.random.PRNGKey(0), spec32.layers)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
    _, aux32 = make_loss_fn(spec32)(p32, b32, 10.0, 0.01)
    _, aux16 = make_loss_fn(spec16)(p16, b16, 10.0, 0.01)
    mu32, mu16 = float(aux32["mu"]), float(aux16["mu"])
    # f32 quadrature accumulation keeps μ within bf16 element precision
    assert abs(mu16 - mu32) / abs(mu32) < 0.02
    assert jnp.asarray(aux16["mu"]).dtype == jnp.float32   # f32 accumulations


def test_bf16_training_step_runs():
    spec16 = replace(DISK, geometry="square", n_points=48,
                     dtype=jnp.bfloat16)
    batch = make_batch(spec16, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec16.layers,
                          dtype=jnp.bfloat16)
    loss_fn = make_loss_fn(spec16)
    res = fit(loss_fn, make_optimizer("adam", 1e-3), params, batch, 1.0, 0.01,
              epochs=50, tol=-1.0, patience=10**9, check_every=25)
    assert np.isfinite(res.best_loss)
