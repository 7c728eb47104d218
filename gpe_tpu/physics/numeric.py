"""Numeric base eigenfunctions: PL-PINN bases for potentials WITHOUT an
analytic linear eigenbasis (optical lattice, double well, arbitrary traps).

The reference selects excited modes purely by swapping the analytic base
function (harmonic_pinn_simulation.py:127-134), which restricts PL-PINN to
the three potentials with closed-form eigenfunctions (Hermite/box/Airy —
SURVEY.md §2 A8-A10). This module removes that restriction: any float64 grid
eigenstate (from validate/imaginary_time.py or validate/fdm.py) becomes a
base with spectrally-exact derivatives, so the full PL continuation
machinery (q-scaling, warm starts, rebased increments, LM polish) applies to
lattice-class potentials where the delocalized ground state is unreachable
from a Gaussian base (see runs/gpe2d_lattice/summary.json branch analysis).

Representation: the grid state is expanded in the Dirichlet sine series
    ψ(x, y) = Σ_{j,k} a_{jk} sin(jπ(x−lb)/L) sin(kπ(y−lb)/L)
via an orthonormal DST-I (the same transform that diagonalizes the oracle's
Dirichlet kinetic propagator), and value/∇/Δ at ARBITRARY points are the
analytic derivatives of the truncated series — evaluated with two dense
(P×n)(n×n) host GEMMs per field. The triple is therefore exactly
self-consistent (lap really is the Laplacian of value), which the GPE
residual loss requires; interpolating ψ and differencing would not be.

Bases register by name into NUMERIC_BASES; ``GPESpec(basis="numeric:<name>")``
resolves through train.problem.base_triple. Registration is process-local —
experiments must register before building batches (and after a resume).
"""
from __future__ import annotations

import math

import numpy as np

from gpe_tpu.physics.bases import ValGradLap

#: name -> callable(mode, pts) -> ValGradLap (host numpy; cast by make_batch)
NUMERIC_BASES: dict = {}


class SineSeries2D:
    """Dirichlet sine-series representation of a 2D grid state.

    xi: interior grid nodes (n,), uniform, xi[j] = lb + (j+1)·h with
    h = (ub−lb)/(n+1) — the validate/imaginary_time.py DST-I layout.
    psi: (n, n) state values on xi×xi (indexing="ij").
    """

    def __init__(self, xi: np.ndarray, psi: np.ndarray, lb: float, ub: float):
        from scipy.fft import dstn

        xi = np.asarray(xi, np.float64)
        psi = np.asarray(psi, np.float64)
        n = xi.shape[0]
        if psi.shape != (n, n):
            raise ValueError(f"psi shape {psi.shape} != ({n},{n})")
        h = (ub - lb) / (n + 1)
        if not (np.allclose(xi[0], lb + h) and np.allclose(xi[-1], ub - h)):
            raise ValueError("xi is not the interior DST-I grid of [lb,ub]")
        self.lb, self.ub, self.n = float(lb), float(ub), n
        L = ub - lb
        # orthonormal DST-I is its own inverse → these ARE the coefficients
        # of ψ in the orthonormal sine basis s_j(x)=√(2/(n+1))·sin(jπ(x−lb)/L)
        # on the grid; rescale to plain sin() coefficients for off-grid eval
        a = dstn(psi, type=1, norm="ortho") * (2.0 / (n + 1))
        k = np.pi * np.arange(1, n + 1) / L          # (n,) wavenumbers
        self.k = k
        self.a = a                                    # value coefficients
        self.ax = a * k[:, None]                      # ∂x (cos on axis 0)
        self.ay = a * k[None, :]                      # ∂y (cos on axis 1)
        self.alap = -a * (k[:, None] ** 2 + k[None, :] ** 2)

    def __call__(self, pts: np.ndarray) -> ValGradLap:
        """Evaluate (value, grad, lap) at arbitrary points pts (P, 2)."""
        pts = np.asarray(pts, np.float64)
        tx = pts[:, 0] - self.lb
        ty = pts[:, 1] - self.lb
        Sx = np.sin(np.outer(tx, self.k))             # (P, n)
        Sy = np.sin(np.outer(ty, self.k))
        Cx = np.cos(np.outer(tx, self.k))
        Cy = np.cos(np.outer(ty, self.k))
        # einsum('pj,jk,pk->p') factored as one GEMM + a row-wise dot
        val = np.einsum("pk,pk->p", Sx @ self.a, Sy)
        gx = np.einsum("pk,pk->p", Cx @ self.ax, Sy)
        gy = np.einsum("pk,pk->p", Sx @ self.ay, Cy)
        lap = np.einsum("pk,pk->p", Sx @ self.alap, Sy)
        return ValGradLap(val, np.stack([gx, gy], -1), lap)


class SineSeries1D:
    """1D Dirichlet sine-series numeric base (same layout as the 2D case)."""

    def __init__(self, xi: np.ndarray, psi: np.ndarray, lb: float, ub: float):
        from scipy.fft import dst

        xi = np.asarray(xi, np.float64)
        psi = np.asarray(psi, np.float64)
        n = xi.shape[0]
        h = (ub - lb) / (n + 1)
        if not (np.allclose(xi[0], lb + h) and np.allclose(xi[-1], ub - h)):
            raise ValueError("xi is not the interior DST-I grid of [lb,ub]")
        self.lb, self.ub = float(lb), float(ub)
        L = ub - lb
        a = dst(psi, type=1, norm="ortho") * math.sqrt(2.0 / (n + 1))
        self.k = np.pi * np.arange(1, n + 1) / L
        self.a = a

    def __call__(self, pts: np.ndarray) -> ValGradLap:
        pts = np.asarray(pts, np.float64)
        t = (pts[:, 0] if pts.ndim == 2 else pts) - self.lb
        S = np.sin(np.outer(t, self.k))
        C = np.cos(np.outer(t, self.k))
        val = S @ self.a
        g = C @ (self.a * self.k)
        lap = S @ (-self.a * self.k**2)
        return ValGradLap(val, g[:, None], lap)


def register_numeric_basis(name: str, series_by_mode) -> str:
    """Register sine-series bases under ``"numeric:<name>"``.

    series_by_mode: a single SineSeries* (mode 0 only) or {mode: series}.
    Returns the spec.basis string to use."""
    if not isinstance(series_by_mode, dict):
        series_by_mode = {0: series_by_mode}

    def basis_fn(mode: int, pts):
        if mode not in series_by_mode:
            raise KeyError(f"numeric basis {name!r} has no mode {mode}")
        return series_by_mode[mode](np.asarray(pts))

    key = f"numeric:{name}"
    NUMERIC_BASES[key] = basis_fn
    return key
