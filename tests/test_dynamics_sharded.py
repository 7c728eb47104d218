"""Mesh-sharded dynamics propagator (gpe_tpu/dynamics/sharded.py) vs the
single-device propagator on the 8-virtual-device CPU mesh: identical operator
ordering means the distributed-FFT transpose path must reproduce the
single-device trajectory to FFT round-off (SURVEY.md §4 fake-mesh strategy).
"""
import jax
import numpy as np
import pytest

from gpe_tpu.dynamics import evolve
from gpe_tpu.dynamics.sharded import evolve_sharded
from gpe_tpu.parallel.mesh import make_mesh


def _setup_2d(n=64, half=8.0, d=0.5):
    x = np.linspace(-half, half, n, endpoint=False)
    dx = x[1] - x[0]
    X, Y = np.meshgrid(x, x, indexing="ij")
    V = 0.5 * (X ** 2 + Y ** 2)
    psi0 = np.exp(-0.5 * ((X - d) ** 2 + Y ** 2)).astype(complex)
    psi0 = psi0 / np.sqrt(np.sum(np.abs(psi0) ** 2) * dx * dx)
    return x, dx, V, psi0


@pytest.mark.parametrize("bc,imaginary", [("periodic", False),
                                          ("periodic", True),
                                          ("dirichlet", False)])
def test_sharded_matches_single_device_2d(bc, imaginary):
    with jax.enable_x64(True):
        mesh = make_mesh(8)
        x, dx, V, psi0 = _setup_2d()
        kw = dict(dt=2e-3, steps=150, gamma=20.0, kinetic=0.5, bc=bc,
                  lb=float(x[0]), imaginary=imaginary, record_every=50)
        psi_1, obs_1 = evolve(psi0, V, dx, **kw)
        psi_s, obs_s = evolve_sharded(psi0, V, dx, mesh=mesh, **kw)
        np.testing.assert_allclose(np.asarray(psi_s), np.asarray(psi_1),
                                   atol=5e-13)
        for key in ("norm", "energy", "mu", "center", "width_sq"):
            np.testing.assert_allclose(np.asarray(obs_s[key]),
                                       np.asarray(obs_1[key]),
                                       rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(obs_s["t"], obs_1["t"])


def test_sharded_3d_and_remainder():
    # dimension-generic path + the record_every ∤ steps final-state contract
    with jax.enable_x64(True):
        mesh = make_mesh(8)
        n, half = 16, 6.0
        x = np.linspace(-half, half, n, endpoint=False)
        dx = x[1] - x[0]
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        V = 0.5 * (X ** 2 + Y ** 2 + Z ** 2)
        psi0 = np.exp(-0.5 * ((X - 0.4) ** 2 + Y ** 2 + Z ** 2))
        psi0 = psi0 / np.sqrt(np.sum(psi0 ** 2) * dx ** 3)
        kw = dict(dt=2e-3, steps=70, gamma=10.0, lb=float(x[0]),
                  record_every=30)
        psi_1, obs_1 = evolve(psi0, V, dx, **kw)
        psi_s, obs_s = evolve_sharded(psi0, V, dx, mesh=mesh, **kw)
        assert len(obs_s["t"]) == 4 and abs(obs_s["t"][-1] - 0.140) < 1e-12
        np.testing.assert_allclose(np.asarray(psi_s), np.asarray(psi_1),
                                   atol=5e-13)
        np.testing.assert_allclose(np.asarray(obs_s["mu"]),
                                   np.asarray(obs_1["mu"]), rtol=1e-11)


def test_sharded_f32_runs_and_validates_divisibility():
    mesh = make_mesh(8)
    x, dx, V, psi0 = _setup_2d(n=64)
    psi, obs = evolve_sharded(psi0.astype(np.complex64),
                              V.astype(np.float32), dx, dt=1e-3, steps=100,
                              gamma=5.0, mesh=mesh, lb=float(x[0]),
                              record_every=50)
    assert np.asarray(psi).dtype == np.complex64
    assert np.max(np.abs(np.asarray(obs["norm"]) - 1.0)) < 1e-4
    with pytest.raises(ValueError, match="divide"):
        evolve_sharded(psi0[:60], V[:60], dx, dt=1e-3, steps=10, gamma=0.0,
                       mesh=mesh)
    with pytest.raises(ValueError, match="2-D"):
        evolve_sharded(psi0[0], V[0], dx, dt=1e-3, steps=10, gamma=0.0,
                       mesh=mesh)
