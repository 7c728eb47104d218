"""Spectral-flow distillation trainer (1D on CPU — cheap shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.models import mlp
from gpe_tpu.train import GPESpec, make_batch, pretrain_to_base
from gpe_tpu.train.problem import base_triple
from gpe_tpu.train.spectral_flow import make_spectral_flow_solver
from gpe_tpu.validate.imaginary_time import imaginary_time_gpe


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
