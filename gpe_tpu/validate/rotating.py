"""Rotating-frame 2D GPE ground-truth solver (BASELINE config #5, part 2).

Solves, for COMPLEX ψ(x, y) with ∫|ψ|² = 1,

    μψ = [ −c·Δ + V + γ|ψ|² − Ω·L_z ] ψ,      L_z = −i(x∂_y − y∂_x),

by imaginary-time evolution with the Bao–Wang ADI splitting: grouping the
rotation with the kinetic terms makes every factor exactly exponentiable,

    A = c·p_x² /“½”-convention + Ω·y·p_x   (diagonal after FFT in x),
    B = c·p_y² − Ω·x·p_y                   (diagonal after FFT in y),
    C = V + γ|ψ|²                          (diagonal in position),

Strang-composed e^{−τC/2} e^{−τA/2} e^{−τB} e^{−τA/2} e^{−τC/2} with per-step
renormalization. Vortices (phase windings) appear in the converged state for
Ω above the critical rotation; the solver is the float64 oracle the complex
PINN distills from and is validated against.

This capability is BEYOND the reference (no rotating frame, no complex ψ
anywhere in LevBahn/Gross-Pitaevskii-Eigenvalue-problem); BASELINE.json lists
it as config #5 ("rotating-frame GPE with ΩL_z term (vortex states)").
"""
from __future__ import annotations

import numpy as np


def rotating_imaginary_time(V: np.ndarray, x: np.ndarray, gamma: float,
                            omega: float, kinetic: float = 0.5,
                            tau: float = 2e-3, steps: int = 40000,
                            tol: float = 1e-12,
                            psi0: np.ndarray | None = None,
                            seed_vortex: bool = True):
    """Ground state of the rotating-frame GPE on a square grid.

    V: (n, n) potential on the tensor grid of 1-D coordinates `x`;
    returns (mu, psi complex (n, n), lz) with ⟨L_z⟩ the angular momentum.
    Requires omega < trap frequency (the effective radial potential
    ½(ω_trap²−Ω²)r² must confine).
    """
    n = x.shape[0]
    dx = x[1] - x[0]
    vol = dx * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    k = 2.0 * np.pi * np.fft.fftfreq(n, d=dx)

    if psi0 is None:
        psi = np.exp(-(X**2 + Y**2) / 2.0).astype(complex)
        if seed_vortex and omega > 0:
            # symmetry-broken seed: a displaced vortex + noise lets imaginary
            # time find vortex ground states instead of a metastable
            # zero-circulation state
            rng = np.random.default_rng(0)
            psi = psi * ((X - 0.3) + 1j * (Y + 0.2))
            psi += 0.01 * (rng.standard_normal(psi.shape)
                           + 1j * rng.standard_normal(psi.shape)) * np.abs(psi).max()
    else:
        psi = np.asarray(psi0, complex).copy()
    psi /= np.sqrt(np.sum(np.abs(psi) ** 2) * vol)

    # A: ½k_x² + Ω·y·k_x  (x-FFT, axis 0); B: ½k_y² − Ω·x·k_y (y-FFT, axis 1)
    symb_A = kinetic * k[:, None] ** 2 + omega * x[None, :] * k[:, None]  # (kx, y)
    symb_B = kinetic * k[None, :] ** 2 - omega * x[:, None] * k[None, :]  # (x, ky)
    expA_half = np.exp(-0.5 * tau * symb_A)
    expB = np.exp(-tau * symb_B)

    def _apply_A_half(p):
        return np.fft.ifft(np.fft.fft(p, axis=0) * expA_half, axis=0)

    def _apply_B(p):
        return np.fft.ifft(np.fft.fft(p, axis=1) * expB, axis=1)

    mu_prev = np.inf
    for it in range(steps):
        dens = V + gamma * np.abs(psi) ** 2
        psi = psi * np.exp(-0.5 * tau * dens)
        psi = _apply_A_half(psi)
        psi = _apply_B(psi)
        psi = _apply_A_half(psi)
        dens = V + gamma * np.abs(psi) ** 2
        psi = psi * np.exp(-0.5 * tau * dens)
        psi /= np.sqrt(np.sum(np.abs(psi) ** 2) * vol)

        if it % 100 == 0 or it == steps - 1:
            mu = rotating_mu(psi, V, x, gamma, omega, kinetic)
            if abs(mu - mu_prev) < tol * max(1.0, abs(mu)):
                break
            mu_prev = mu
    mu = rotating_mu(psi, V, x, gamma, omega, kinetic)
    return mu, psi, angular_momentum(psi, x)


def _spectral_grads(psi: np.ndarray, dx: float):
    n = psi.shape[0]
    k = 2.0 * np.pi * np.fft.fftfreq(n, d=dx)
    gx = np.fft.ifft(1j * k[:, None] * np.fft.fft(psi, axis=0), axis=0)
    gy = np.fft.ifft(1j * k[None, :] * np.fft.fft(psi, axis=1), axis=1)
    return gx, gy


def rotating_mu(psi, V, x, gamma, omega, kinetic=0.5) -> float:
    """μ = ∫ c|∇ψ|² + V|ψ|² + γ|ψ|⁴ − Ω·ψ*L_zψ  (∫|ψ|²=1)."""
    dx = x[1] - x[0]
    vol = dx * dx
    X, Y = np.meshgrid(x, x, indexing="ij")
    gx, gy = _spectral_grads(psi, dx)
    grad2 = np.abs(gx) ** 2 + np.abs(gy) ** 2
    lz_dens = np.real(np.conj(psi) * (-1j) * (X * gy - Y * gx))
    dens = (kinetic * grad2 + V * np.abs(psi) ** 2
            + gamma * np.abs(psi) ** 4 - omega * lz_dens)
    return float(np.sum(dens) * vol)


def angular_momentum(psi, x) -> float:
    """⟨L_z⟩ = ∫ ψ* (−i)(x∂_y − y∂_x) ψ  (∫|ψ|²=1)."""
    dx = x[1] - x[0]
    X, Y = np.meshgrid(x, x, indexing="ij")
    gx, gy = _spectral_grads(psi, dx)
    lz = np.real(np.conj(psi) * (-1j) * (X * gy - Y * gx))
    return float(np.sum(lz) * dx * dx)


def vortex_count(psi, threshold: float = 0.05, halo: int = 4) -> int:
    """Count phase windings: plaquettes where the accumulated phase around the
    2×2 cell winds by ±2π. A vortex CORE has near-zero density, so the
    spurious-winding mask uses the NEIGHBORHOOD-max density (within `halo`
    cells): a real vortex sits inside bulk condensate, numerical phase noise
    outside the cloud does not."""
    ph = np.angle(psi)

    def d(a, b):
        return np.angle(np.exp(1j * (b - a)))

    circ = (d(ph[:-1, :-1], ph[1:, :-1]) + d(ph[1:, :-1], ph[1:, 1:])
            + d(ph[1:, 1:], ph[:-1, 1:]) + d(ph[:-1, 1:], ph[:-1, :-1]))
    dens = np.abs(psi) ** 2
    neigh = dens.copy()
    for ax in (0, 1):
        for s in range(1, halo + 1):
            neigh = np.maximum(neigh, np.roll(dens, s, axis=ax))
            neigh = np.maximum(neigh, np.roll(dens, -s, axis=ax))
    mask = neigh[:-1, :-1] > threshold * dens.max()
    return int(np.sum((np.abs(circ) > np.pi) & mask))


def rotating_energy(psi, V, x, gamma, omega, kinetic=0.5) -> float:
    """Rotating-frame GP energy functional (∫|ψ|²=1):
    E[ψ] = ∫ c|∇ψ|² + V|ψ|² + (γ/2)|ψ|⁴ − Ω·ψ*L_zψ.

    Differs from μ (rotating_mu) by the ½ on the interaction term:
    μ = E + (γ/2)∫|ψ|⁴. E is the quantity whose ordering decides which of
    two near-degenerate vortex configurations is the true ground state."""
    dx = x[1] - x[0]
    X, Y = np.meshgrid(x, x, indexing="ij")
    gx, gy = _spectral_grads(psi, dx)
    grad2 = np.abs(gx) ** 2 + np.abs(gy) ** 2
    lz_dens = np.real(np.conj(psi) * (-1j) * (X * gy - Y * gx))
    dens = (kinetic * grad2 + V * np.abs(psi) ** 2
            + 0.5 * gamma * np.abs(psi) ** 4 - omega * lz_dens)
    return float(np.sum(dens) * dx * dx)


def regrid_psi(psi: np.ndarray, x_src: np.ndarray, x_dst: np.ndarray):
    """Cubic-spline regrid of a complex field between uniform tensor grids
    (re/im separately), renormalized to ∫|ψ|²=1 on the destination grid —
    the configuration-preserving warm start for grid-refined imaginary time."""
    from scipy.interpolate import RectBivariateSpline
    re = RectBivariateSpline(x_src, x_src, np.real(psi))(x_dst, x_dst)
    im = RectBivariateSpline(x_src, x_src, np.imag(psi))(x_dst, x_dst)
    out = re + 1j * im
    dx = x_dst[1] - x_dst[0]
    return out / np.sqrt(np.sum(np.abs(out) ** 2) * dx * dx)
