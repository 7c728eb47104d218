"""Forward-Laplacian engine vs autodiff oracle; quadrature; Rayleigh μ."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu import physics
from gpe_tpu.models import mlp
from gpe_tpu.ops import laplacian, quadrature, rayleigh
from gpe_tpu.physics import bases


@pytest.mark.parametrize("d", [1, 2, 3])
@pytest.mark.parametrize("activation", ["tanh", "shifted_tanh", "sin", "gelu"])
def test_fwdlap_matches_autodiff(d, activation):
    key = jax.random.PRNGKey(0)
    params = mlp.init_mlp(key, [d, 16, 16, 1])
    x = jax.random.normal(jax.random.PRNGKey(1), (32, d))

    got = laplacian.fwdlap_mlp(params, x, activation)

    def f(pt):
        return mlp.mlp_apply(params, pt[None, :], activation)[0]

    want = laplacian.value_grad_lap_generic(f, x)
    np.testing.assert_allclose(got.value, want.value, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.grad, want.grad, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.lap, want.lap, rtol=1e-3, atol=1e-4)


def test_fwdlap_jit_and_grad():
    params = mlp.init_mlp(jax.random.PRNGKey(0), [1, 8, 8, 1])
    x = jnp.linspace(-1, 1, 64)[:, None]

    @jax.jit
    def loss(p):
        vgl = laplacian.fwdlap_mlp(p, x)
        return jnp.mean(vgl.lap**2) + jnp.mean(vgl.value**2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(w)) and np.all(np.isfinite(b)) for (w, b) in g)


def test_quadrature_integrate():
    x = quadrature.uniform_grid(0.0, jnp.pi, 1001)
    w = quadrature.trapezoid_weights(0.0, jnp.pi, 1001)
    val = quadrature.integrate(jnp.sin(x[:, 0]), w)
    assert abs(float(val) - 2.0) < 1e-5
    # 2D: ∫∫ x·y over [0,1]² = 1/4
    g2 = quadrature.uniform_grid(0.0, 1.0, 101, d=2)
    w2 = quadrature.trapezoid_weights(0.0, 1.0, 101, d=2)
    val2 = quadrature.integrate(g2[:, 0] * g2[:, 1], w2)
    assert abs(float(val2) - 0.25) < 1e-5


def test_rayleigh_mu_exact_eigenfunction():
    """μ from the Rayleigh quotient of the analytic Hermite eigenfunction must
    equal 2n+1 for −Δ+x² at γ=0 — the SURVEY §4 oracle."""
    x = quadrature.uniform_grid(-8.0, 8.0, 2001)
    V = physics.harmonic(x)
    for n in [0, 1, 3]:
        phi = bases.hermite_basis(n, x)
        mu = rayleigh.rayleigh_mu(phi.value, phi.lap, V, gamma=0.0)
        assert abs(float(mu) - (2 * n + 1)) < 5e-3
        r = rayleigh.gpe_residual(phi.value, phi.lap, V, mu, gamma=0.0)
        assert float(jnp.mean(r * r)) < 1e-5


def test_riesz_energy_matches_rayleigh_at_gamma0():
    x = quadrature.uniform_grid(-8.0, 8.0, 2001)
    w = quadrature.trapezoid_weights(-8.0, 8.0, 2001)
    V = physics.harmonic(x)
    phi = bases.hermite_basis(0, x)
    e = rayleigh.riesz_energy(phi.value, phi.grad, V, w, gamma=0.0)
    assert abs(float(e) - 1.0) < 5e-3  # ⟨H⟩ = μ₀ = 1 for −Δ+x²


def test_nonlinearity_kinds():
    u = jnp.array([-2.0, 0.5, 1.0])
    np.testing.assert_allclose(rayleigh.nonlinear_term(u, 2.0, 3.0, "power"),
                               2.0 * np.asarray(u) ** 3, rtol=1e-6)
    np.testing.assert_allclose(rayleigh.nonlinear_term(u, 2.0, 3.0, "abs_power"),
                               2.0 * np.abs(np.asarray(u)) ** 2 * np.asarray(u), rtol=1e-6)
