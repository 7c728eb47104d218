"""Numeric sine-series base (physics/numeric.py): spectral-exactness of the
val/grad/lap triple, the GPESpec("numeric:...") wiring, and a miniature
PL-PINN run whose base is a numeric (grid-sampled) eigenstate."""
import numpy as np
import pytest

from gpe_tpu.physics.numeric import (SineSeries1D, SineSeries2D,
                                     register_numeric_basis)


def _interior_grid(lb, ub, n):
    h = (ub - lb) / (n + 1)
    return lb + h * np.arange(1, n + 1), h


def test_sine_series_1d_matches_analytic_gaussian():
    lb, ub, n = -8.0, 8.0, 255
    xi, _ = _interior_grid(lb, ub, n)
    psi = np.pi ** -0.25 * np.exp(-xi**2 / 2)
    s = SineSeries1D(xi, psi, lb, ub)
    pts = np.linspace(-5.0, 5.0, 333)[:, None]
    t = s(pts)
    v = np.pi ** -0.25 * np.exp(-pts[:, 0] ** 2 / 2)
    assert np.abs(t.value - v).max() < 1e-12
    assert np.abs(t.grad[:, 0] + pts[:, 0] * v).max() < 1e-11
    # Δφ = (x²−1)φ for the oscillator ground state
    assert np.abs(t.lap - (pts[:, 0] ** 2 - 1) * v).max() < 1e-9


def test_sine_series_2d_matches_analytic_gaussian():
    lb, ub, n = -8.0, 8.0, 255
    xi, _ = _interior_grid(lb, ub, n)
    X, Y = np.meshgrid(xi, xi, indexing="ij")
    psi = np.pi ** -0.5 * np.exp(-(X**2 + Y**2) / 2)
    s = SineSeries2D(xi, psi, lb, ub)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5.0, 5.0, (400, 2))
    t = s(pts)
    r2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
    v = np.pi ** -0.5 * np.exp(-r2 / 2)
    assert np.abs(t.value - v).max() < 1e-12
    assert np.abs(t.grad[:, 0] + pts[:, 0] * v).max() < 1e-11
    assert np.abs(t.lap - (r2 - 2) * v).max() < 1e-9


def test_sine_series_rejects_wrong_grid():
    xi = np.linspace(0.0, 1.0, 64)          # includes endpoints — not interior
    with pytest.raises(ValueError):
        SineSeries1D(xi, np.ones(64), 0.0, 1.0)


def test_numeric_basis_spec_wiring():
    from gpe_tpu.train.problem import GPESpec, make_batch

    lb, ub, n = 0.0, 1.0, 127
    xi, _ = _interior_grid(lb, ub, n)
    phi = np.sqrt(2.0) * np.sin(np.pi * xi)
    name = register_numeric_basis("wiring_test", SineSeries1D(xi, phi, lb, ub))
    spec = GPESpec(lb=lb, ub=ub, n_points=256, potential="box", basis=name,
                   layers=(1, 16, 16, 1))
    batch = make_batch(spec, 0)
    x = np.asarray(batch["x"])[:, 0]
    assert np.allclose(np.asarray(batch["base_val"]),
                       np.sqrt(2.0) * np.sin(np.pi * x), atol=1e-5)
    assert np.allclose(np.asarray(batch["base_lap"]),
                       -np.pi**2 * np.sqrt(2.0) * np.sin(np.pi * x), atol=1e-3)
    # boundary values of a Dirichlet sine series vanish identically
    assert np.abs(np.asarray(batch["base_bval"])).max() < 1e-6
    with pytest.raises(KeyError):
        make_batch(spec, 3)                 # only mode 0 registered
    with pytest.raises(KeyError):
        make_batch(GPESpec(basis="numeric:never_registered"), 0)


def test_plpinn_with_numeric_base_recovers_box_eigenvalue():
    """PL-PINN at γ=0 with a numeric base = grid-sampled box ground state:
    μ must recover π² (−Δ on [0,1]) — the machinery that lets PL-PINN run on
    potentials without analytic bases (the lattice ground-state recipe,
    experiments/gpe2d_lattice_plpinn.py)."""
    from gpe_tpu.train import GPESpec, train_plpinn

    lb, ub, n = 0.0, 1.0, 255
    xi, _ = _interior_grid(lb, ub, n)
    phi = np.sqrt(2.0) * np.sin(np.pi * xi)
    name = register_numeric_basis("box_gs", SineSeries1D(xi, phi, lb, ub))
    spec = GPESpec(lb=lb, ub=ub, n_points=512, potential="box", basis=name,
                   layers=(1, 24, 24, 1), p=3.0, kinetic=1.0)
    res = train_plpinn(spec, [0.0], modes=(0,), epochs=600, tol=0.0,
                       patience=10**9, pretrain_epochs=400, check_every=300)
    mu = dict(res.mu_table[0])[0.0]
    assert abs(mu - np.pi**2) < 5e-2
