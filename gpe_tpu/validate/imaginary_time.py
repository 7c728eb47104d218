"""Imaginary-time (gradient-flow) ground-truth GPE solver, split-step spectral.

The robust oracle for strong nonlinearity, where plain eigensolver-SCF
oscillates: propagate ψ ← e^(−τH[ψ])ψ with Strang splitting
(half potential+nonlinear, full kinetic in spectral space, half potential),
renormalizing each step; μ = ∫ c|∇ψ|² + Vψ² + γ|ψ|^(p+1) dx at convergence.

BASELINE.json: "Solutions must match ... Thomas-Fermi and imaginary-time
ground truths." Works in 1D and 2D on uniform grids with two boundary
handlings:

- bc="periodic" (FFT): for confining potentials whose states decay to
  machine zero inside the box, where the wrap-around is negligible;
- bc="dirichlet" (DST-I): the kinetic propagator diagonalizes the Dirichlet
  Laplacian exactly, for NON-confining potentials (e.g. the optical lattice,
  BASELINE config #4) where the PINN's boundary loss — ψ=0 on the box edge —
  is a physical part of the problem and the periodic oracle would solve a
  different Hamiltonian. V must then be sampled on the n INTERIOR points
  x_j = lb + j·dx (j = 1..n, box length L = (n+1)·dx).
"""
from __future__ import annotations

import numpy as np


def _k_grid(n: int, dx: float) -> np.ndarray:
    return 2.0 * np.pi * np.fft.fftfreq(n, d=dx)


def _axis_view(k: np.ndarray, axis: int, dim: int) -> np.ndarray:
    """Reshape a per-axis 1D array so it broadcasts along `axis` of a dim-D
    grid (the N-D generalization of the kx[:, None] / ky[None, :] pattern)."""
    return k.reshape([-1 if j == axis else 1 for j in range(dim)])


def _spectral_ops(shape: tuple, dx: float, bc: str):
    """(to_spec, from_spec, k2): forward/inverse transform + the Laplacian
    symbol on the spectral grid for the requested boundary condition.
    Dimension-generic (1D/2D for the reference's problems, 3D+ beyond it).

    The periodic branch uses the real-input rFFT (ψ is real throughout this
    solver): half the spectrum, ~2× the complex-FFT speed — decisive for the
    3D oracle, where the FFT is the entire per-step cost."""
    dim = len(shape)
    if bc == "periodic":
        from scipy import fft as sfft

        ks = [_k_grid(n, dx) for n in shape[:-1]]
        ks.append(2.0 * np.pi * np.fft.rfftfreq(shape[-1], d=dx))
        k2 = sum(_axis_view(k, i, dim) ** 2 for i, k in enumerate(ks))
        return (lambda a: sfft.rfftn(a, workers=-1),
                lambda a: sfft.irfftn(a, s=shape, workers=-1), k2)
    if bc == "dirichlet":
        from scipy.fft import dstn

        # DST-I with ortho norm is involutory; sine modes k_m = πm/L,
        # m = 1..n on the n interior points of a box of length L = (n+1)dx
        def axis_k(n):
            return np.pi * np.arange(1, n + 1) / ((n + 1) * dx)

        k2 = sum(_axis_view(axis_k(n), i, dim) ** 2
                 for i, n in enumerate(shape))
        tr = lambda a: dstn(a, type=1, norm="ortho")
        return tr, tr, k2
    raise ValueError(f"unknown bc {bc!r}")


def imaginary_time_gpe(V: np.ndarray, dx: float, gamma: float,
                       kinetic: float = 1.0, p: float = 3.0,
                       tau: float = 5e-3, steps: int = 20000,
                       tol: float = 1e-12, psi0: np.ndarray | None = None,
                       richardson: bool = False, bc: str = "periodic"):
    """Ground state of −c·Δψ + Vψ + γ|ψ|^(p−1)ψ = μψ with ∫|ψ|² = 1.

    V: (n,) for 1D or (nx, ny) for 2D (same spacing dx per axis).
    Returns (mu, psi). tol is on the per-step μ change.

    The per-step renormalization makes the converged μ carry an O(τ) bias
    (first-order in the splitting, since μ is NOT stationary w.r.t. the
    nonlinear term). richardson=True (or 1) re-converges at τ/2 and
    extrapolates μ* = 2μ(τ/2) − μ(τ), removing the linear term;
    richardson=2 adds a third level at τ/4 and eliminates the τ² term too
    (verified against the Newton-continuation oracle in validate/fdm.py:
    at γ=100 the order-1 extrapolation still carries ~2.5e-4 of τ² bias at
    τ=2e-3, the order-2 one is at the 1e-6 level).
    """
    order = int(richardson)
    if order >= 1:
        mu1, psi1 = imaginary_time_gpe(V, dx, gamma, kinetic, p, tau, steps,
                                       tol, psi0, bc=bc)
        mu2, psi2 = imaginary_time_gpe(V, dx, gamma, kinetic, p, tau / 2.0,
                                       steps * 2, tol, psi1, bc=bc)
        r1 = 2.0 * mu2 - mu1
        if order == 1:
            return r1, psi2
        mu4, psi4 = imaginary_time_gpe(V, dx, gamma, kinetic, p, tau / 4.0,
                                       steps * 4, tol, psi2, bc=bc)
        r1_half = 2.0 * mu4 - mu2
        return (4.0 * r1_half - r1) / 3.0, psi4
    dim = V.ndim
    vol = dx**dim
    if psi0 is None:
        psi = np.exp(-np.asarray(V) / (2.0 * max(kinetic, 1e-6)))
        if bc == "dirichlet":
            # taper to the Dirichlet box so the seed has no edge discontinuity
            def sin_env(n):
                return np.sin(np.pi * np.arange(1, n + 1) / (n + 1))
            for i, n in enumerate(V.shape):
                psi = psi * _axis_view(sin_env(n), i, dim)
    else:
        psi = np.asarray(psi0, dtype=float).copy()
    psi /= np.sqrt(np.sum(psi * psi) * vol)

    to_spec, from_spec, k2 = _spectral_ops(V.shape, dx, bc)
    kin_prop = np.exp(-tau * kinetic * k2)
    mu_prev = np.inf
    for it in range(steps):
        dens_pot = V + gamma * np.abs(psi) ** (p - 1.0)
        psi = psi * np.exp(-0.5 * tau * dens_pot)
        psi = from_spec(to_spec(psi) * kin_prop)
        dens_pot = V + gamma * np.abs(psi) ** (p - 1.0)
        psi = psi * np.exp(-0.5 * tau * dens_pot)
        psi /= np.sqrt(np.sum(psi * psi) * vol)

        if it % 50 == 0 or it == steps - 1:
            mu = _chemical_potential(psi, V, dx, gamma, kinetic, p, bc)
            if abs(mu - mu_prev) < tol * max(1.0, abs(mu)):
                return mu, psi
            mu_prev = mu
    return mu_prev, psi


def _chemical_potential(psi, V, dx, gamma, kinetic, p=3.0, bc="periodic"):
    """μ = ∫ c|∇ψ|² + Vψ² + γ|ψ|^(p+1) (spectral gradient, ∫|ψ|²=1)."""
    dim = psi.ndim
    vol = dx**dim
    if bc == "dirichlet":
        # Parseval for DST-I (ortho): ∫|∇ψ|² dx = vol · Σ k² a²
        to_spec, _, k2 = _spectral_ops(psi.shape, dx, bc)
        a = to_spec(psi)
        kin_e = kinetic * float(np.sum(k2 * a * a)) * vol
        dens = V * psi**2 + gamma * np.abs(psi) ** (p + 1.0)
        return kin_e + float(np.sum(dens) * vol)
    from scipy import fft as sfft

    f = sfft.rfftn(psi, workers=-1)
    grad2 = np.zeros_like(psi, dtype=float)
    for i, n in enumerate(psi.shape):
        ki = _axis_view(_k_grid(n, dx) if i < dim - 1
                        else 2.0 * np.pi * np.fft.rfftfreq(n, d=dx), i, dim)
        grad2 = grad2 + sfft.irfftn(1j * ki * f, s=psi.shape,
                                    workers=-1) ** 2
    dens = kinetic * grad2 + V * psi**2 + gamma * np.abs(psi) ** (p + 1.0)
    return float(np.sum(dens) * vol)
