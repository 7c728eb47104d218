"""GEMM-engine propagator (dynamics/gemm_step — the TPU path on a backend
with no complex lowering) vs the FFT split-step engine: identical operator
conventions mean f64 CPU trajectories must agree to spectral round-off."""
import jax
import numpy as np
import pytest

from gpe_tpu.dynamics import evolve, ground_state
from gpe_tpu.dynamics.gemm_step import evolve_gemm, ground_state_gemm


def _setup(n=48, half=7.0, d=0.4):
    x = np.linspace(-half, half, n, endpoint=False)
    dx = x[1] - x[0]
    X, Y = np.meshgrid(x, x, indexing="ij")
    V = 0.5 * (X ** 2 + Y ** 2)
    psi0 = np.exp(-0.5 * ((X - d) ** 2 + Y ** 2)) * np.exp(0.3j * X)
    psi0 = psi0 / np.sqrt(np.sum(np.abs(psi0) ** 2) * dx * dx)
    return x, dx, V, psi0


@pytest.mark.parametrize("bc,imaginary", [("periodic", False),
                                          ("periodic", True),
                                          ("dirichlet", False)])
def test_gemm_matches_fft_engine_f64(bc, imaginary):
    with jax.enable_x64(True):
        x, dx, V, psi0 = _setup()
        kw = dict(dt=2e-3, steps=120, gamma=15.0, kinetic=0.5, bc=bc,
                  lb=float(x[0]), imaginary=imaginary, record_every=40)
        psi_f, obs_f = evolve(psi0, V, dx, **kw)
        psi_g, obs_g = evolve_gemm(psi0, V, dx, **kw)
        np.testing.assert_allclose(np.asarray(psi_g), np.asarray(psi_f),
                                   atol=2e-11)
        for key in ("norm", "energy", "mu", "center", "width_sq"):
            np.testing.assert_allclose(np.asarray(obs_g[key]),
                                       np.asarray(obs_f[key]),
                                       rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(obs_g["t"], obs_f["t"])


def test_gemm_1d_3d_and_remainder():
    with jax.enable_x64(True):
        n, half = 16, 6.0
        x = np.linspace(-half, half, n, endpoint=False)
        dx = x[1] - x[0]
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        V = 0.5 * (X ** 2 + Y ** 2 + Z ** 2)
        psi0 = np.exp(-0.5 * ((X - 0.4) ** 2 + Y ** 2 + Z ** 2)).astype(
            complex)
        psi0 /= np.sqrt(np.sum(np.abs(psi0) ** 2) * dx ** 3)
        kw = dict(dt=2e-3, steps=70, gamma=10.0, lb=float(x[0]),
                  record_every=30)
        psi_f, obs_f = evolve(psi0, V, dx, **kw)
        psi_g, obs_g = evolve_gemm(psi0, V, dx, **kw)
        assert len(obs_g["t"]) == 4 and abs(obs_g["t"][-1] - 0.140) < 1e-12
        np.testing.assert_allclose(np.asarray(psi_g), np.asarray(psi_f),
                                   atol=2e-12)
        # 1D
        V1 = 0.5 * x * x
        p1 = np.exp(-0.5 * (x - 0.3) ** 2).astype(complex)
        p1 /= np.sqrt(np.sum(np.abs(p1) ** 2) * dx)
        pf, of = evolve(p1, V1, dx, 1e-3, 100, 5.0, lb=float(x[0]),
                        record_every=50)
        pg, og = evolve_gemm(p1, V1, dx, 1e-3, 100, 5.0, lb=float(x[0]),
                             record_every=50)
        np.testing.assert_allclose(np.asarray(pg), np.asarray(pf),
                                   atol=2e-13)
        np.testing.assert_allclose(np.asarray(og["mu"]),
                                   np.asarray(of["mu"]), rtol=1e-10)


def test_gemm_f32_norm_and_kohn():
    # f32 single-precision pair path (the TPU dtype): norm conservation at
    # the f32 unitarity floor and the Kohn dipole at the fit tolerance
    from gpe_tpu.experiments.gpe_dynamics import fit_frequency

    x, dx, V, _ = _setup(n=64, half=8.0)
    X, Y = np.meshgrid(x, x, indexing="ij")
    d = 0.5
    psi0 = np.exp(-0.5 * ((X - d) ** 2 + Y ** 2))
    psi0 = (psi0 / np.sqrt(np.sum(psi0 ** 2) * dx * dx)).astype(np.complex64)
    steps = 1200
    t_end = 4.0 * np.pi
    psi, obs = evolve_gemm(psi0, V.astype(np.float32), dx, t_end / steps,
                           steps, gamma=20.0, lb=float(x[0]),
                           record_every=12)
    assert np.asarray(psi).dtype == np.complex64
    assert np.max(np.abs(np.asarray(obs["norm"]) - 1.0)) < 2e-3
    cx = np.asarray(obs["center"])[:, 0]
    w, amp, rms = fit_frequency(np.asarray(obs["t"]), cx)
    assert abs(w - 1.0) < 2e-3


def test_gemm_ground_state_matches_fft_engine():
    with jax.enable_x64(True):
        x, dx, V, _ = _setup(n=48)
        mu_f, psi_f = ground_state(V, dx, 30.0, tau=2e-3, steps=4000,
                                   tol=0.0)
        mu_g, psi_g = ground_state_gemm(V, dx, 30.0, tau=2e-3, steps=4000,
                                        tol=0.0)
        assert abs(mu_g - mu_f) < 1e-10
        ov = abs(np.sum(np.conj(np.asarray(psi_f)) * np.asarray(psi_g))
                 * dx * dx)
        assert abs(ov - 1.0) < 1e-12
