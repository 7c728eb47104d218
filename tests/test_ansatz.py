"""Ansatz derivative propagation vs the generic autodiff oracle."""
import numpy as np

import jax
import jax.numpy as jnp

from gpe_tpu.models import ansatz as anz
from gpe_tpu.models import mlp
from gpe_tpu.ops import laplacian
from gpe_tpu.physics import bases


def _net(key, d):
    params = mlp.init_mlp(key, [d, 12, 12, 1])
    net_vgl = lambda p, x: mlp.mlp_vgl(p, x, "tanh")
    net_val = lambda p, x: mlp.mlp_apply(p, x, "tanh")
    return params, net_vgl, net_val


def _oracle(value_fn, params, x, scale):
    def f(pt):
        return value_fn(params, pt[None, :], scale)[0]
    return laplacian.value_grad_lap_generic(f, x)


def test_hard_bc_ansatz_product_rule_1d():
    params, net_vgl, net_val = _net(jax.random.PRNGKey(0), 1)
    a = anz.hard_bc_ansatz(net_vgl, net_val, anz.box_sine_factor(0.0, 1.0))
    x = jnp.linspace(0.05, 0.95, 19)[:, None]
    got = a.vgl(params, x, 0.7)
    want = _oracle(a.value, params, x, 0.7)
    np.testing.assert_allclose(got.value, want.value, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.grad, want.grad, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.lap, want.lap, rtol=1e-3, atol=1e-4)
    # boundary is exactly zero
    bx = jnp.array([[0.0], [1.0]])
    np.testing.assert_allclose(a.value(params, bx, 1.0), np.zeros(2), atol=1e-6)


def test_hard_bc_ansatz_2d():
    params, net_vgl, net_val = _net(jax.random.PRNGKey(1), 2)
    a = anz.hard_bc_ansatz(net_vgl, net_val, anz.box_sine_factor(0.0, 1.0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (25, 2), minval=0.02, maxval=0.98)
    got = a.vgl(params, x, 1.0)
    want = _oracle(a.value, params, x, 1.0)
    np.testing.assert_allclose(got.lap, want.lap, rtol=1e-3, atol=1e-4)


def test_perturbation_ansatz_adds_base():
    params, net_vgl, net_val = _net(jax.random.PRNGKey(3), 1)
    inner = anz.plain_ansatz(net_vgl, net_val)
    base = lambda x: bases.hermite_basis(2, x)
    a = anz.perturbation_ansatz(inner, base)
    x = jnp.linspace(-3, 3, 41)[:, None]
    got = a.vgl(params, x, 0.01)
    want = _oracle(a.value, params, x, 0.01)
    np.testing.assert_allclose(got.value, want.value, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.lap, want.lap, rtol=1e-3, atol=2e-4)
    # scale → 0 recovers the analytic base exactly
    got0 = a.vgl(params, x, 0.0)
    np.testing.assert_allclose(got0.value, bases.hermite_basis(2, x).value, atol=1e-6)


def test_init_schemes():
    p1 = mlp.init_mlp(jax.random.PRNGKey(0), [1, 64, 64, 1], "xavier_uniform")
    assert np.allclose(p1[0][1], 0.01)
    p2 = mlp.init_mlp(jax.random.PRNGKey(0), [1, 64, 64, 1], "mode_scaled", mode=4)
    assert np.allclose(p2[0][1], 0.001)
    assert np.std(np.asarray(p2[0][0])) < np.std(np.asarray(p1[0][0]))


def test_siren_init_scheme():
    w0 = 5.0
    p = mlp.init_mlp(jax.random.PRNGKey(0), [2, 64, 64, 2], "siren", w0=w0)
    # first layer bounded by w0/fan_in, hidden by sqrt(6/fan_in), biases zero
    assert float(np.abs(p[0][0]).max()) <= w0 / 2 + 1e-6
    assert float(np.abs(p[1][0]).max()) <= np.sqrt(6.0 / 64) + 1e-6
    for w, b in p:
        assert np.allclose(b, 0.0)
    # pairs with the sin activation through the full vgl path
    x = jnp.linspace(-8, 8, 32).reshape(-1, 2)
    n = mlp.mlp_vgl(p, x, "sin")
    assert n.value.shape == (16, 2) and n.lap.shape == (16, 2)
    assert np.all(np.isfinite(np.asarray(n.lap)))
