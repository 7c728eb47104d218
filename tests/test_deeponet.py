"""Physics-informed DeepONet: operator learning over a potential family."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.deeponet import (DeepONetSpec, deeponet_apply, deeponet_vgl,
                              init_deeponet, make_deeponet_loss,
                              make_potential_family_batch, train_deeponet)


def test_deeponet_shapes_and_laplacian():
    spec = DeepONetSpec(branch_layers=(16, 16, 8), trunk_layers=(1, 16, 8),
                        n_sensors=16, n_points=64)
    params = init_deeponet(jax.random.PRNGKey(0), spec)
    batch = make_potential_family_batch(spec, n_functions=4)
    u = deeponet_apply(params, batch["v_sensors"], batch["x"])
    assert u.shape == (4, 64)
    u2, lap = deeponet_vgl(params, batch["v_sensors"], batch["x"])
    np.testing.assert_allclose(np.asarray(u), np.asarray(u2), rtol=1e-6)
    # laplacian vs FD along x for one sample
    x = np.asarray(batch["x"]).ravel()
    h = x[1] - x[0]
    fd = (np.asarray(u[0, 2:]) - 2 * np.asarray(u[0, 1:-1]) + np.asarray(u[0, :-2])) / h**2
    np.testing.assert_allclose(np.asarray(lap)[0, 1:-1], fd, rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_deeponet_learns_scaled_harmonic_family():
    """γ=0 operator: for V=βx², exact μ(β)=√β (kinetic=1, a=β: μ₀=2√(1·β)·½).

    After physics-informed training the per-function Rayleigh μ must track
    the √β law across the family."""
    spec = DeepONetSpec(branch_layers=(32, 32, 24), trunk_layers=(1, 32, 32, 24),
                        n_sensors=32, n_points=256, lb=-8.0, ub=8.0)
    res = train_deeponet(spec, gamma=0.0, epochs=4000, n_functions=16,
                         beta_range=(0.8, 1.6), check_every=2000)
    batch = make_potential_family_batch(spec, 16, beta_range=(0.8, 1.6))
    betas = np.asarray(batch["meta"])
    mu_exact = np.sqrt(betas)
    err = np.abs(res.mu_per_fn - mu_exact)
    assert np.median(err) < 0.1


def test_evaluate_deeponet_heldout_shapes_and_oracle():
    """Held-out evaluation runs a pure forward pass on unseen β and compares
    against the FDM oracle (finite numbers, correctly keyed rows)."""
    import jax
    from gpe_tpu.deeponet.model import (DeepONetSpec, evaluate_deeponet,
                                        init_deeponet)
    spec = DeepONetSpec(n_points=128, n_sensors=32,
                        branch_layers=(16, 16, 8), trunk_layers=(1, 16, 8))
    params = init_deeponet(jax.random.PRNGKey(0), spec)
    rows, u, x = evaluate_deeponet(spec, params, [0.8, 1.5], gamma=0.0)
    assert [r["beta"] for r in rows] == [0.8, 1.5]
    assert u.shape == (2, 128) and x.shape == (128,)
    for r in rows:
        assert np.isfinite(r["mu_pred"]) and np.isfinite(r["psi_l2_err"])
        # oracle itself is exact: linear ground state of βx² has μ=√β·1
        assert abs(r["mu_ref"] - np.sqrt(r["beta"])) < 5e-3
