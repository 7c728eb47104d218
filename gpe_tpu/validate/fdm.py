"""Finite-difference ground-truth solvers for validation.

TPU-native rebuild of the reference's FDM/eigsh oracle (SURVEY.md §2.A row
A12: GPE_ground_State_FDM.ipynb cell 0): build the (Kronecker-sum) Laplacian,
then self-consistent-field iteration H[ψ] = −c·L + diag(V + γ|ψ|²),
ψ ← ground eigenvector of H[ψ], until ‖ψ_new − ψ‖ < tol. The eigenvalue of
the converged H[ψ] is the chemical potential μ.

1D linear solves run as dense jnp.linalg.eigh (device, batched-friendly);
the 2D SCF loop uses scipy sparse eigsh on host — it is a *validation* oracle,
not a training-path component, so host execution is fine.
"""
from __future__ import annotations

import numpy as np


def _lap_1d(n: int, dx: float) -> np.ndarray:
    """Dense 1D second-difference operator with Dirichlet BCs."""
    L = np.zeros((n, n))
    np.fill_diagonal(L, -2.0)
    idx = np.arange(n - 1)
    L[idx, idx + 1] = 1.0
    L[idx + 1, idx] = 1.0
    return L / (dx * dx)


def linear_eigensolve_1d(V: np.ndarray, dx: float, k: int = 6, kinetic: float = 1.0):
    """Lowest-k eigenpairs of −c·ψ″ + Vψ = μψ on a uniform Dirichlet grid.

    Returns (mus (k,), psis (n, k)) with ψ normalized to ∫|ψ|²dx = 1.
    """
    n = V.shape[0]
    H = -kinetic * _lap_1d(n, dx) + np.diag(V)
    mus, vecs = np.linalg.eigh(H)
    psis = vecs[:, :k] / np.sqrt(dx)       # eigh vectors are l2-normalized
    return mus[:k], psis


def solve_gpe_scf_1d(V: np.ndarray, dx: float, gamma: float, kinetic: float = 1.0,
                     tol: float = 1e-10, max_iter: int = 200, mixing: float = 0.5):
    """1D GPE ground state by SCF iteration (dense eigh).

    Returns (mu, psi) with ∫|ψ|²dx = 1 and H[ψ]ψ = μψ converged.
    """
    n = V.shape[0]
    L = _lap_1d(n, dx)
    psi = np.ones(n) / np.sqrt(n * dx)
    mu = 0.0
    for _ in range(max_iter):
        H = -kinetic * L + np.diag(V + gamma * psi * psi)
        mus, vecs = np.linalg.eigh(H)
        new = vecs[:, 0] / np.sqrt(dx)
        if new[np.argmax(np.abs(new))] < 0:
            new = -new
        new = mixing * new + (1.0 - mixing) * psi
        new /= np.sqrt(np.sum(new * new) * dx)
        delta = np.linalg.norm(new - psi) * np.sqrt(dx)
        psi, mu = new, mus[0]
        if delta < tol:
            break
    # report μ of the *converged* density (unmixed Hamiltonian)
    H = -kinetic * L + np.diag(V + gamma * psi * psi)
    mu = float(np.linalg.eigh(H)[0][0])
    return mu, psi


def solve_gpe_scf_2d(V: np.ndarray, dx: float, gamma: float, kinetic: float = 1.0,
                     tol: float = 1e-8, max_iter: int = 100, mixing: float = 0.5):
    """2D GPE ground state by SCF + sparse eigsh (the reference's method).

    V: (nx, ny) potential on a uniform grid with spacing dx in both axes.
    Returns (mu, psi (nx, ny)) with ∬|ψ|²dxdy = 1.
    """
    import scipy.sparse as sp
    from scipy.sparse.linalg import eigsh

    nx, ny = V.shape
    ex = np.ones(nx)
    ey = np.ones(ny)
    Dxx = sp.diags([ex[:-1], -2 * ex, ex[:-1]], [-1, 0, 1]) / (dx * dx)
    Dyy = sp.diags([ey[:-1], -2 * ey, ey[:-1]], [-1, 0, 1]) / (dx * dx)
    L = sp.kron(Dxx, sp.eye(ny)) + sp.kron(sp.eye(nx), Dyy)

    area = dx * dx
    psi = np.ones(nx * ny)
    psi /= np.sqrt(np.sum(psi * psi) * area)
    mu = 0.0
    for _ in range(max_iter):
        H = -kinetic * L + sp.diags(V.ravel() + gamma * psi * psi)
        mus, vecs = eigsh(H, k=1, which="SA")
        new = vecs[:, 0]
        if new[np.argmax(np.abs(new))] < 0:
            new = -new
        new /= np.sqrt(np.sum(new * new) * area)
        new = mixing * new + (1.0 - mixing) * psi
        new /= np.sqrt(np.sum(new * new) * area)
        delta = np.linalg.norm(new - psi) * np.sqrt(area)
        psi = new
        if delta < tol:
            break
    H = -kinetic * L + sp.diags(V.ravel() + gamma * psi * psi)
    mu = float(eigsh(H, k=1, which="SA", return_eigenvectors=False)[0])
    return mu, psi.reshape(nx, ny)
