"""Unit tests for physics primitives vs scipy/closed forms (SURVEY.md §4)."""
import math

import numpy as np
import pytest

import jax.numpy as jnp
from scipy.special import airy as scipy_airy, ai_zeros
from scipy.special import hermite as scipy_hermite

from gpe_tpu import physics
from gpe_tpu.physics import bases, exact
from gpe_tpu.physics.thomas_fermi import thomas_fermi, thomas_fermi_mu_1d_harmonic


def test_harmonic_potential():
    x = jnp.linspace(-3, 3, 7)
    np.testing.assert_allclose(physics.harmonic(x), np.asarray(x) ** 2, rtol=1e-6)
    xy = jnp.stack([x, 2 * x], axis=-1)
    np.testing.assert_allclose(
        physics.harmonic(xy, a=0.5), 0.5 * (np.asarray(x) ** 2 + 4 * np.asarray(x) ** 2),
        rtol=1e-6)


def test_potential_registry_and_beta_scaling():
    x = jnp.linspace(0.0, 1.0, 5)
    v = physics.get_potential("harmonic", beta=3.0)
    np.testing.assert_allclose(v(x), 3.0 * np.asarray(x) ** 2, rtol=1e-6)
    for name in physics.POTENTIALS:
        out = physics.get_potential(name)(x)
        assert out.shape == (5,)
        assert np.all(np.isfinite(out))


def test_gaussian_periodic_values():
    x = jnp.array([0.0, 1.0])
    np.testing.assert_allclose(physics.gaussian(x), np.exp(-np.array([0.0, 1.0])), rtol=1e-6)
    np.testing.assert_allclose(
        physics.periodic(x, V0=2.0, k=np.pi), 2.0 * np.cos(np.pi * np.array([0.0, 1.0])) ** 2,
        rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 5])
def test_hermite_basis_vs_scipy(n):
    x = np.linspace(-4, 4, 201)
    got = bases.hermite_basis(n, jnp.asarray(x))
    h = scipy_hermite(n)
    c = 1.0 / np.sqrt(2.0**n * math.factorial(n) * np.sqrt(np.pi))
    want = c * h(x) * np.exp(-x * x / 2)
    np.testing.assert_allclose(got.value, want, rtol=2e-4, atol=1e-5)
    # ODE check: φ″ = (x² − (2n+1))φ and grad vs numerical derivative
    np.testing.assert_allclose(got.lap, (x * x - (2 * n + 1)) * want, rtol=2e-4, atol=1e-4)
    num_grad = np.gradient(want, x)
    np.testing.assert_allclose(got.grad[:, 0], num_grad, atol=2e-2)


def test_hermite_normalization():
    x = np.linspace(-10, 10, 4001)
    w = (x[1] - x[0])
    for n in range(4):
        phi = np.asarray(bases.hermite_basis(n, jnp.asarray(x)).value)
        assert abs(np.sum(phi * phi) * w - 1.0) < 1e-4


@pytest.mark.parametrize("n", [0, 1, 4])
def test_box_basis(n):
    x = np.linspace(0, 1, 101)
    got = bases.box_basis(n, jnp.asarray(x))
    want = np.sqrt(2.0) * np.sin((n + 1) * np.pi * x)
    np.testing.assert_allclose(got.value, want, rtol=1e-5, atol=1e-5)
    k = (n + 1) * np.pi
    np.testing.assert_allclose(got.lap, -k * k * want, rtol=1e-4, atol=1e-3)
    assert abs(np.sum(np.asarray(got.value) ** 2) * (x[1] - x[0]) - 1.0) < 2e-2


@pytest.mark.parametrize("n", [0, 1, 2])
def test_airy_basis_vs_scipy(n):
    x = np.linspace(0, 20, 501)
    alpha = ai_zeros(n + 1)[0][n]
    got = bases.airy_basis(n, jnp.asarray(x))
    ai, aip, _, _ = scipy_airy(x + alpha)
    norm = abs(scipy_airy(alpha)[1])
    np.testing.assert_allclose(got.value, ai / norm, atol=2e-4)
    np.testing.assert_allclose(got.grad[:, 0], aip / norm, atol=2e-3)
    # boundary + normalization (exact: ∫Ai(x+α)²dx = Ai′(α)²)
    assert abs(got.value[0]) < 1e-4
    w = x[1] - x[0]
    assert abs(np.sum(np.asarray(got.value) ** 2) * w - 1.0) < 5e-3


def test_exact_eigenvalues():
    assert exact.harmonic_eigenvalue(0) == pytest.approx(1.0)        # −Δ+x²
    assert exact.harmonic_eigenvalue(3) == pytest.approx(7.0)
    assert exact.harmonic_eigenvalue(0, a=0.5, kinetic=0.5) == pytest.approx(0.5)  # −½Δ+½x²
    assert exact.box_eigenvalue(0) == pytest.approx(np.pi**2)
    assert exact.gravity_well_eigenvalue(0) == pytest.approx(-ai_zeros(1)[0][0])
    assert exact.harmonic_eigenvalue_2d(0, 0, a=0.5, kinetic=0.5) == pytest.approx(1.0)


def test_thomas_fermi():
    x = jnp.linspace(-5, 5, 101)
    V = physics.harmonic(x)
    mu = 4.0
    psi = thomas_fermi(mu, V, gamma=10.0)
    want = np.sqrt(np.maximum((4.0 - np.asarray(x) ** 2) / 10.0, 0.0))
    np.testing.assert_allclose(psi, want, rtol=1e-5, atol=1e-6)
    # closed-form TF μ normalizes the density to 1
    gamma = 100.0
    mu_tf = float(thomas_fermi_mu_1d_harmonic(gamma))
    xs = np.linspace(-mu_tf**0.5, mu_tf**0.5, 20001)
    dens = (mu_tf - xs**2) / gamma
    assert abs(np.trapezoid(dens, xs) - 1.0) < 1e-4
