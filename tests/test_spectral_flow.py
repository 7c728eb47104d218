"""Spectral-flow distillation trainer (1D on CPU — cheap shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.models import mlp
from gpe_tpu.train import GPESpec, make_batch, pretrain_to_base
from gpe_tpu.train.problem import base_triple
from gpe_tpu.train.spectral_flow import dst1, make_spectral_flow_solver
from gpe_tpu.validate.imaginary_time import imaginary_time_gpe


def test_dst1_matches_scipy_and_is_involutory():
    from scipy.fft import dstn

    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 13)).astype(np.float32)
    for axis in (0, 1):
        ours = np.asarray(dst1(jnp.asarray(a), axis=axis))
        ref = dstn(a.astype(np.float64), type=1, norm="ortho", axes=[axis])
        np.testing.assert_allclose(ours, ref, atol=1e-5)
    twice = np.asarray(dst1(dst1(jnp.asarray(a), 0), 0))
    np.testing.assert_allclose(twice, a, atol=1e-5)


@pytest.mark.slow
def test_spectral_flow_dirichlet_free_box():
    """bc='dirichlet' on V=0: the flow must land on the box ground state
    sin(πx/L) with μ = kinetic·(π/L)² — a state the periodic propagator
    cannot produce (its V=0 ground state is the constant)."""
    n = 130                                       # 128 interior points
    spec = GPESpec(dim=1, n_points=n, layers=(1, 32, 32, 1), lb=0.0, ub=1.0,
                   potential="box", basis="box", kinetic=1.0,
                   use_perturbation=False, nonlinearity="abs_power")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    x = np.asarray(batch["x"]).ravel()
    target = np.sqrt(2.0) * np.sin(np.pi * x)     # exact, ∫ψ²=1 on [0,1]
    params, _ = pretrain_to_base(params, batch["x"], target[:, None],
                                 spec.activation, epochs=1200, lbfgs_steps=40)
    solver = make_spectral_flow_solver(spec, outer_steps=30, inner_steps=40,
                                       tau=2e-2, bc="dirichlet")
    res = solver(params, batch, 0.0)
    assert abs(res.mu_grid - np.pi**2) < 1e-6     # DST-I is exact here
    assert abs(res.mu - np.pi**2) < 5e-2
    # interacting rung agrees with the f64 Dirichlet oracle
    res10 = solver(res.params, batch, 10.0)
    Vint = np.zeros(n - 2)
    dx = 1.0 / (n - 1)
    mu_ref, _ = imaginary_time_gpe(Vint, dx, 10.0, tau=2e-3,
                                   richardson=True, bc="dirichlet")
    assert abs(res10.mu_grid - mu_ref) < 5e-4


@pytest.mark.slow
def test_spectral_flow_1d_linear_and_interacting():
    spec = GPESpec(dim=1, n_points=256, layers=(1, 32, 32, 1), lb=-10.0, ub=10.0,
                   potential="harmonic", basis="hermite", kinetic=1.0,
                   use_perturbation=False, nonlinearity="abs_power")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    base = base_triple(spec, 0, batch["x"])
    params, _ = pretrain_to_base(params, batch["x"], np.asarray(base.value),
                                 spec.activation, epochs=1500, lbfgs_steps=50)
    solver = make_spectral_flow_solver(spec, outer_steps=80, inner_steps=60,
                                       tau=2e-2)
    res0 = solver(params, batch, 0.0)
    assert abs(res0.mu_grid - 1.0) < 1e-3          # −Δ+x² ground state
    assert abs(res0.mu - 1.0) < 5e-3               # mesh-free estimate

    res10 = solver(res0.params, batch, 10.0)
    x = np.linspace(-10, 10, 256)
    # Richardson-extrapolated oracle: the plain τ=5e-3 flow carries an O(τ)
    # renormalization bias of ~3.7e-3 here, larger than the solver's own error
    mu_ref, _ = imaginary_time_gpe(x * x, x[1] - x[0], 10.0, tau=2e-3,
                                   richardson=True)
    assert abs(res10.mu_grid - mu_ref) < 3e-4
    assert abs(res10.mu - mu_ref) < 1e-2
    assert res10.mu_grid > res0.mu_grid            # repulsive shift
