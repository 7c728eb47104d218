"""Real-time TDGPE propagation (gpe_tpu/dynamics) against exact physics.

The reference has no time-dependent capability (SURVEY.md §0), so these
oracles are textbook identities rather than reference parity targets:
unitarity (norm), energy conservation, the γ=0 coherent state, Kohn's
theorem for the interacting gas, free-Gaussian spreading, stationary-phase
rotation of box eigenstates, and the device imaginary-time ground state vs
the numpy oracle (validate/imaginary_time.py).
"""
import jax
import numpy as np
import pytest

from gpe_tpu.dynamics import evolve, ground_state
from gpe_tpu.dynamics.split_step import _dst1_ortho


def _harmonic_1d(n=512, half=12.0):
    x = np.linspace(-half, half, n, endpoint=False)
    return x, x[1] - x[0], 0.5 * x * x


def test_dst1_ortho_involution_and_modes():
    with jax.enable_x64(True):
        rng = np.random.default_rng(0)
        a = rng.standard_normal(33) + 1j * rng.standard_normal(33)
        twice = np.asarray(_dst1_ortho(_dst1_ortho(a, 0), 0))
        np.testing.assert_allclose(twice, a, atol=1e-12)
        # a pure sine mode maps to a single coefficient
        n, m = 17, 3
        j = np.arange(1, n + 1)
        mode = np.sin(np.pi * m * j / (n + 1))
        coef = np.asarray(_dst1_ortho(mode.astype(complex), 0))
        expect = np.zeros(n)
        expect[m - 1] = np.sqrt((n + 1) / 2.0)
        np.testing.assert_allclose(coef.real, expect, atol=1e-12)
        np.testing.assert_allclose(coef.imag, 0.0, atol=1e-12)


def test_norm_and_energy_conserved_interacting():
    with jax.enable_x64(True):
        x, dx, V = _harmonic_1d()
        psi0 = np.exp(-0.5 * (x - 0.7) ** 2)
        psi0 = psi0 / np.sqrt(np.sum(psi0 ** 2) * dx)
        _, obs = evolve(psi0, V, dx, 2e-3, 2000, gamma=50.0, kinetic=0.5,
                        bc="periodic", lb=float(x[0]), record_every=100)
        assert np.max(np.abs(np.asarray(obs["norm"]) - 1.0)) < 1e-11
        # O(dt²) splitting error is a BOUNDED oscillation (~7e-6 relative at
        # dt=2e-3 for this high-energy state), not a drift
        e = np.asarray(obs["energy"])
        assert np.max(np.abs(e / e[0] - 1.0)) < 2e-5


def test_coherent_state_gamma0_center():
    # γ=0 displaced ground state: ⟨x⟩(t) = d·cos(ωt) exactly (ω=1)
    with jax.enable_x64(True):
        x, dx, V = _harmonic_1d()
        d = 1.0
        psi0 = np.exp(-0.5 * (x - d) ** 2) / np.pi ** 0.25
        psi0 = psi0 / np.sqrt(np.sum(psi0 ** 2) * dx)
        steps = 4000
        dt = 2 * np.pi / steps
        _, obs = evolve(psi0, V, dx, dt, steps, gamma=0.0, kinetic=0.5,
                        bc="periodic", lb=float(x[0]), record_every=50)
        cx = np.asarray(obs["center"])[:, 0]
        assert np.max(np.abs(cx - d * np.cos(obs["t"]))) < 1e-5


def test_kohn_theorem_dipole_frequency_independent_of_gamma():
    # the INTERACTING gas displaced in a harmonic trap oscillates at the
    # bare trap frequency with no damping — sharp nonlinear-dynamics oracle
    with jax.enable_x64(True):
        n, half = 512, 14.0
        x = np.linspace(-half, half, n, endpoint=False)
        dx = x[1] - x[0]
        d, gam = 0.5, 50.0
        _, psi0 = ground_state(0.5 * (x - d) ** 2, dx, gam, kinetic=0.5,
                               tau=2e-3, steps=20000, tol=1e-12)
        steps = 8000
        dt = 4 * np.pi / steps
        _, obs = evolve(np.asarray(psi0), 0.5 * x * x, dx, dt, steps, gam,
                        kinetic=0.5, bc="periodic", lb=float(x[0]),
                        record_every=40)
        cx = np.asarray(obs["center"])[:, 0]
        assert np.max(np.abs(cx - d * np.cos(obs["t"]))) < 1e-5


def test_free_gaussian_spreading_width():
    # V=0, γ=0: σ²(t) = σ0² + (c·t/σ0)² for i∂ψ = −c ψ″
    with jax.enable_x64(True):
        n, half, sig0, c = 1024, 40.0, 1.2, 0.5
        x = np.linspace(-half, half, n, endpoint=False)
        dx = x[1] - x[0]
        psi0 = np.exp(-x ** 2 / (4.0 * sig0 ** 2))
        psi0 = psi0 / np.sqrt(np.sum(psi0 ** 2) * dx)
        _, obs = evolve(psi0, np.zeros(n), dx, 5e-3, 1200, gamma=0.0,
                        kinetic=c, bc="periodic", lb=float(x[0]),
                        record_every=200)
        w2 = np.asarray(obs["width_sq"])[:, 0]
        expect = sig0 ** 2 + (c * obs["t"] / sig0) ** 2
        np.testing.assert_allclose(w2, expect, rtol=1e-8)


def test_box_eigenstate_stationary_phase_dirichlet():
    # Dirichlet box mode 1 only rotates its phase: e^{−iμ₁t}, μ₁ = c(π/L)²
    with jax.enable_x64(True):
        n, L, c = 127, 1.0, 0.5
        dx = L / (n + 1)
        xj = np.arange(1, n + 1) * dx
        psi0 = np.sqrt(2.0 / L) * np.sin(np.pi * xj)
        t_end, steps = 0.2, 2000
        psi, obs = evolve(psi0, np.zeros(n), dx, t_end / steps, steps,
                          gamma=0.0, kinetic=c, bc="dirichlet", lb=0.0,
                          record_every=steps)
        ov = np.sum(np.conj(psi0) * np.asarray(psi)) * dx
        assert abs(abs(ov) - 1.0) < 1e-10               # density unchanged
        mu1 = c * np.pi ** 2 / L ** 2
        phase_err = np.angle(np.exp(1j * (np.angle(ov) + mu1 * t_end)))
        assert abs(phase_err) < 1e-10
        assert np.max(np.abs(np.asarray(obs["mu"]) - mu1)) < 1e-9


def test_device_ground_state_matches_numpy_oracle():
    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe

    with jax.enable_x64(True):
        x, dx, V = _harmonic_1d()
        mu_np, psi_np = imaginary_time_gpe(V, dx, 10.0, kinetic=0.5,
                                           tau=2e-3, steps=20000, tol=1e-12)
        mu_dev, psi_dev = ground_state(V, dx, 10.0, kinetic=0.5, tau=2e-3,
                                       steps=20000, tol=1e-12)
        assert abs(mu_dev - mu_np) < 1e-9
        overlap = abs(np.sum(np.conj(np.asarray(psi_dev)) * psi_np) * dx)
        assert abs(overlap - 1.0) < 1e-10


def test_2d_kohn_and_conservation():
    # dimension-generic path: 2D displaced interacting gas, short evolution
    with jax.enable_x64(True):
        n, half = 96, 10.0
        x1 = np.linspace(-half, half, n, endpoint=False)
        dx = x1[1] - x1[0]
        X, Y = np.meshgrid(x1, x1, indexing="ij")
        d, gam = 0.4, 20.0
        _, psi0 = ground_state(0.5 * ((X - d) ** 2 + Y ** 2), dx, gam,
                               kinetic=0.5, tau=3e-3, steps=8000, tol=1e-11)
        V = 0.5 * (X ** 2 + Y ** 2)
        steps = 1500
        dt = np.pi / steps
        _, obs = evolve(np.asarray(psi0), V, dx, dt, steps, gam, kinetic=0.5,
                        bc="periodic", lb=float(x1[0]), record_every=100)
        assert np.max(np.abs(np.asarray(obs["norm"]) - 1.0)) < 1e-11
        e = np.asarray(obs["energy"])
        assert np.max(np.abs(e / e[0] - 1.0)) < 1e-6
        c = np.asarray(obs["center"])
        assert np.max(np.abs(c[:, 0] - d * np.cos(obs["t"]))) < 2e-5
        assert np.max(np.abs(c[:, 1])) < 1e-8           # no y excitation


def test_fit_frequency_recovers_omega():
    # the quench-experiment fitter: FFT-seeded golden-section least squares
    from gpe_tpu.experiments.gpe_dynamics import fit_frequency

    t = np.linspace(0.0, 8 * np.pi, 401)
    y = 3.0 + 0.4 * np.cos(1.37 * t) + 0.1 * np.sin(1.37 * t)
    w, amp, rms = fit_frequency(t, y)
    assert abs(w - 1.37) < 1e-6
    assert abs(amp - np.hypot(0.4, 0.1)) < 1e-6
    assert rms < 1e-8


@pytest.mark.parametrize("bc", ["periodic", "dirichlet"])
def test_float32_path_runs(bc):
    # default (non-x64) path compiles and conserves norm to f32 precision
    x = np.linspace(-8.0, 8.0, 128, endpoint=False).astype(np.float32)
    dx = float(x[1] - x[0])
    V = (0.5 * x * x).astype(np.float32)
    psi0 = np.exp(-0.5 * x * x).astype(np.float32)
    psi0 = psi0 / np.sqrt(np.sum(psi0 ** 2) * dx)
    psi, obs = evolve(psi0, V, dx, 1e-3, 200, gamma=5.0, kinetic=0.5,
                      bc=bc, lb=float(x[0]), record_every=100)
    assert np.asarray(psi).dtype == np.complex64
    assert np.max(np.abs(np.asarray(obs["norm"]) - 1.0)) < 1e-4
