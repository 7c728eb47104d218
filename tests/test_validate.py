"""FDM/eigsh oracle tests: linear eigenvalues, SCF vs Thomas-Fermi."""
import numpy as np
import pytest

from gpe_tpu.physics.thomas_fermi import (thomas_fermi_mu_1d_harmonic,
                                          thomas_fermi_mu_2d_harmonic)
from gpe_tpu.validate import (linear_eigensolve_1d, solve_gpe_scf_1d,
                              solve_gpe_scf_2d)
from gpe_tpu.validate.imaginary_time import imaginary_time_gpe


def _grid(lb, ub, n):
    x = np.linspace(lb, ub, n)
    return x, x[1] - x[0]


def test_linear_eigensolve_harmonic():
    x, dx = _grid(-10, 10, 1200)
    mus, psis = linear_eigensolve_1d(x * x, dx, k=4)  # −Δ+x² → μₙ=2n+1
    np.testing.assert_allclose(mus, [1, 3, 5, 7], atol=2e-3)
    # normalization of returned eigenfunctions
    assert abs(np.sum(psis[:, 0] ** 2) * dx - 1.0) < 1e-8


def test_imaginary_time_1d_exact_and_tf():
    x, dx = _grid(-14, 14, 1024)
    mu0, _ = imaginary_time_gpe(x * x, dx, 0.0)
    assert abs(mu0 - 1.0) < 1e-6
    gamma = 200.0
    mu, psi = imaginary_time_gpe(x * x, dx, gamma)
    mu_tf = float(thomas_fermi_mu_1d_harmonic(gamma))  # TF is the γ→∞ limit
    assert 0.0 < (mu - mu_tf) / mu_tf < 0.02           # small positive kinetic correction
    assert abs(np.sum(psi**2) * dx - 1.0) < 1e-6


def test_scf_1d_moderate_gamma_matches_imaginary_time():
    x, dx = _grid(-10, 10, 800)
    mu_scf, _ = solve_gpe_scf_1d(x * x, dx, 5.0)
    mu_it, _ = imaginary_time_gpe(x * x, dx, 5.0)
    assert abs(mu_scf - mu_it) < 5e-3


def test_scf_1d_gamma0_reduces_to_linear():
    x, dx = _grid(-10, 10, 800)
    mu, _ = solve_gpe_scf_1d(x * x, dx, 0.0)
    assert abs(mu - 1.0) < 5e-3


def test_scf_2d_linear():
    n = 101
    x, dx = _grid(-8, 8, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    V = 0.5 * (X**2 + Y**2)
    # γ=0, −½Δ+½r² → μ = 1
    mu0, psi0 = solve_gpe_scf_2d(V, dx, 0.0, kinetic=0.5)
    assert abs(mu0 - 1.0) < 5e-3
    assert abs(np.sum(psi0**2) * dx * dx - 1.0) < 1e-6


def test_imaginary_time_2d_tf_limit():
    n = 192
    x, dx = _grid(-10, 10, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    V = 0.5 * (X**2 + Y**2)
    mu, psi = imaginary_time_gpe(V, dx, 100.0, kinetic=0.5)
    mu_tf = float(thomas_fermi_mu_2d_harmonic(100.0, a=0.5))
    assert 0.0 < (mu - mu_tf) / mu_tf < 0.05  # positive kinetic correction
    assert abs(np.sum(psi**2) * dx * dx - 1.0) < 1e-6


def test_imaginary_time_dirichlet_free_box():
    """DST-I Dirichlet mode: free box ground state is analytic —
    μ = c·d·(π/L)² — and the propagator diagonalizes it exactly."""
    n, L, c = 127, 8.0, 0.5
    dx = L / (n + 1)
    mu, psi = imaginary_time_gpe(np.zeros(n), dx, 0.0, kinetic=c,
                                 tau=2e-3, steps=30000, bc="dirichlet")
    assert abs(mu - c * (np.pi / L) ** 2) < 1e-10
    # state ∝ sin(πx/L) on the interior grid
    ref = np.sin(np.pi * np.arange(1, n + 1) / (n + 1))
    ref /= np.sqrt(np.sum(ref * ref) * dx)
    assert np.max(np.abs(np.abs(psi) - ref)) < 1e-6


def test_imaginary_time_dirichlet_matches_periodic_when_confined():
    """For a confining trap (state decays inside the box) both boundary
    handlings must produce the same μ."""
    n = 256
    x = np.linspace(-10, 10, n, endpoint=False)
    mu_p, _ = imaginary_time_gpe(x * x, 20 / n, 5.0, richardson=1)
    xi = -10 + np.arange(1, n + 1) * (20 / (n + 1))
    mu_d, _ = imaginary_time_gpe(xi * xi, 20 / (n + 1), 5.0, richardson=1,
                                 bc="dirichlet")
    assert abs(mu_p - mu_d) < 1e-8
