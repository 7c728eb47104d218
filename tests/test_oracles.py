"""Oracle cross-validation: Newton-continuation excited-state FDM vs the
spectral imaginary-time flow, and Richardson orders."""
import numpy as np
import pytest

from gpe_tpu.validate.fdm import solve_gpe_excited_1d
from gpe_tpu.validate.imaginary_time import imaginary_time_gpe


@pytest.fixture(scope="module")
def grid():
    x = np.linspace(-10, 10, 2000)
    return x, x[1] - x[0]


def test_newton_linear_eigenvalues(grid):
    x, dx = grid
    for m in range(6):
        mu, psi = solve_gpe_excited_1d(x * x, dx, 0.0, m)
        assert abs(mu - (2 * m + 1)) < 1e-7       # −Δ+x²: μₙ = 2n+1
        # node count identifies the mode
        nodes = int(np.sum(np.abs(np.diff(np.sign(psi[np.abs(psi) > 1e-4]))) > 1))
        assert nodes == m


def test_newton_matches_imaginary_time_ground_state(grid):
    x, dx = grid
    mu_n, _ = solve_gpe_excited_1d(x * x, dx, 50.0, 0, nonlinearity="power")
    mu_it, _ = imaginary_time_gpe(x * x, dx, 50.0, tau=1e-3, richardson=2)
    assert abs(mu_n - mu_it) < 2e-5


def test_newton_excited_ordering(grid):
    x, dx = grid
    mus = [solve_gpe_excited_1d(x * x, dx, 30.0, m, nonlinearity="power")[0]
           for m in range(3)]
    assert mus[0] < mus[1] < mus[2]               # spectrum stays ordered
    for m, mu in enumerate(mus):
        assert mu > 2 * m + 1                     # repulsive shift up


def test_richardson_order2_tighter_than_order1(grid):
    x, dx = grid
    mu_ref, _ = solve_gpe_excited_1d(x * x, dx, 100.0, 0, nonlinearity="power")
    mu1, _ = imaginary_time_gpe(x * x, dx, 100.0, tau=2e-3, richardson=1)
    mu2, _ = imaginary_time_gpe(x * x, dx, 100.0, tau=2e-3, richardson=2)
    assert abs(mu2 - mu_ref) < abs(mu1 - mu_ref)
    assert abs(mu2 - mu_ref) < 1e-5


def test_newton_oracle_nonzero_wall_slope_boundaries():
    # Dirichlet problems whose eigenfunction has nonzero slope at a wall:
    # the interior-point formulation must reproduce the exact eigenvalues
    # (the wall-inclusive operator was first-order wrong here)
    from scipy.special import ai_zeros
    x = np.linspace(0.0, 35.0, 2000)
    exact = -ai_zeros(2)[0]
    for m in range(2):
        mu, _ = solve_gpe_excited_1d(x, x[1] - x[0], 0.0, m)
        assert abs(mu - exact[m]) < 1e-5
    xb = np.linspace(0.0, 1.0, 1000)
    mu, _ = solve_gpe_excited_1d(np.zeros(1000), xb[1] - xb[0], 0.0, 0)
    assert abs(mu - np.pi**2) < 1e-6
