"""TDGPE propagation with MXU GEMMs only — no complex dtype, no FFT.

This tunnel-attached TPU backend has NO complex-arithmetic lowering at all
(`jnp.fft.*` AND plain complex64 multiplies raise `UNIMPLEMENTED`, probed
2026-08-20), so the FFT split-step engine (split_step.py) is CPU-only here.
This module is the TPU-native engine for the same physics: ψ is carried as
a stacked real pair (2, n₀, …) and the kinetic Strang factor is applied in
POSITION space — for a separable kinetic term the exact spectral step
  ψ ← T⁻¹ · diag(e^{−i·dt·c·k²_axis}) · T ψ    (per axis)
is one precomputed dense (n, n) matrix per axis (T = DFT for periodic, the
involutory orthonormal DST-I for Dirichlet), applied as real matmuls:
  (K_re + iK_im)(ψ_re + iψ_im) → 4 real GEMMs per axis per step.

That trades the FFT's O(n log n) for O(n²) per axis — and is the RIGHT
trade on this hardware: at n ≲ 1024 the axis GEMMs are exactly the dense
(n,n)×(n, rest) shapes the 128×128 systolic array is built for, the whole
time loop stays one `lax.scan` under one jit, and the per-step FLOPs
(~0.3 GFLOP at 256², HIGHEST-precision 6-pass f32 GEMMs) are microseconds
of MXU time. DFT-as-matmul is the standard TPU recipe for small transforms.

Identical operator conventions, Strang ordering, and observables contract
as split_step.evolve / split_step.ground_state (parity-tested against them
on CPU in both precisions by tests/test_gemm_step.py); f64 CPU oracle
provenance: validate/imaginary_time.py. The reference repo has no time
dependence at all (SURVEY.md §0).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpe_tpu.dynamics.split_step import _axis_view, axis_coords


def _axis_matrices(n: int, dx: float, bc: str, theta: float,
                   imaginary: bool, np_dtype):
    """Host-precomputed (f64, then cast) position-space 1D matrices:
    propagator K = T⁻¹ diag(e^{−θk²} or e^{−iθk²}) T and the analysis
    transform T itself (for spectral observables). Returns
    (K_re, K_im | None, T_re, T_im | None, k²_axis)."""
    if bc == "periodic":
        k = 2.0 * np.pi * np.fft.fftfreq(n, d=dx)
        T = np.fft.fft(np.eye(n), axis=0)          # T @ u = fft(u)
        D = np.exp((-theta if imaginary else -1j * theta) * k ** 2)
        K = np.fft.ifft(D[:, None] * T, axis=0)
        T_im = np.ascontiguousarray(T.imag).astype(np_dtype)
    elif bc == "dirichlet":
        j = np.arange(1, n + 1)
        S = np.sqrt(2.0 / (n + 1)) * np.sin(np.pi * np.outer(j, j) / (n + 1))
        k = np.pi * j / ((n + 1) * dx)
        D = np.exp((-theta if imaginary else -1j * theta) * k ** 2)
        K = S @ (D[:, None] * S)                   # S is involutory ortho
        T, T_im = S, None
    else:
        raise ValueError(f"unknown bc {bc!r}")
    K_re = np.ascontiguousarray(K.real).astype(np_dtype)
    K_im = (None if imaginary
            else np.ascontiguousarray(K.imag).astype(np_dtype))
    return K_re, K_im, np.ascontiguousarray(T.real).astype(np_dtype), \
        T_im, k ** 2


def _capply(Kr, Ki, ur, ui, axis, prec):
    """(K_re + iK_im) @ (u_re + iu_im) contracted along `axis` of u —
    3-4 real GEMMs riding the MXU (Ki None ⇒ real matrix, 2 GEMMs)."""
    td = partial(jnp.tensordot, axes=([1], [axis]), precision=prec)
    rr, ri = td(Kr, ur), td(Kr, ui)
    if Ki is None:
        vr, vi = rr, ri
    else:
        vr = rr - td(Ki, ui)
        vi = ri + td(Ki, ur)
    return jnp.moveaxis(vr, 0, axis), jnp.moveaxis(vi, 0, axis)


@partial(jax.jit, static_argnames=("dx", "steps", "record_every",
                                   "imaginary", "bc", "p", "shape", "prec"))
def _evolve_gemm_jit(psi0, V, xs, mats, k2, dt, gamma, kinetic, *, dx, p,
                     steps, record_every, imaginary, bc, shape, prec):
    real_dtype = V.dtype
    ur0, ui0 = psi0[0].astype(real_dtype), psi0[1].astype(real_dtype)
    dim = len(shape)
    vol = dx ** dim
    npts = 1
    for n in shape:
        npts *= n
    # Parseval weight matching split_step._spectral_ops exactly
    pw = (vol / npts) if bc == "periodic" else vol

    def abs2(ur, ui):
        return ur * ur + ui * ui

    def dens_pow(ur, ui, q):
        a2 = abs2(ur, ui)
        if q == round(q) and q >= 0 and int(q) % 2 == 0:
            return a2 ** (int(q) // 2)
        return a2 ** (q / 2.0)

    def half_potential(ur, ui):
        theta = (0.5 * dt) * (V + gamma * dens_pow(ur, ui, p - 1.0))
        if imaginary:
            f = jnp.exp(-theta)
            return ur * f, ui * f
        c, s = jnp.cos(theta), jnp.sin(theta)       # ψ ← ψ·e^{−iθ}
        return ur * c + ui * s, ui * c - ur * s

    def kinetic_full(ur, ui):
        for ax in range(dim):
            Kr, Ki = mats["K_re"][ax], mats["K_im"][ax]
            ur, ui = _capply(Kr, Ki, ur, ui, ax, prec)
        return ur, ui

    def one_step(c):
        ur, ui = c
        ur, ui = half_potential(ur, ui)
        ur, ui = kinetic_full(ur, ui)
        ur, ui = half_potential(ur, ui)
        if imaginary:
            nrm = jnp.sqrt(jnp.sum(abs2(ur, ui)) * vol)
            ur, ui = ur / nrm, ui / nrm
        return (ur, ui)

    def to_spec(ur, ui):
        for ax in range(dim):
            Tr, Ti = mats["T_re"][ax], mats["T_im"][ax]
            ur, ui = _capply(Tr, Ti, ur, ui, ax, prec)
        return ur, ui

    def observables(c):
        ur, ui = c
        a2 = abs2(ur, ui)
        norm = jnp.sum(a2) * vol
        cr, ci = to_spec(ur, ui)
        ke = kinetic * jnp.sum(k2 * (cr * cr + ci * ci)) * pw
        pe = jnp.sum(V * a2) * vol
        inter = jnp.sum(dens_pow(ur, ui, p + 1.0)) * vol
        energy = (ke + pe + (2.0 * gamma / (p + 1.0)) * inter) / norm
        mu = (ke + pe + gamma * inter) / norm
        centers, widths = [], []
        for ax in range(dim):
            xa = _axis_view(xs[ax], ax, dim)
            cm = jnp.sum(xa * a2) * vol / norm
            w2 = jnp.sum(xa * xa * a2) * vol / norm - cm * cm
            centers.append(cm)
            widths.append(w2)
        return {"norm": norm, "energy": energy, "mu": mu,
                "center": jnp.stack(centers), "width_sq": jnp.stack(widths)}

    def chunk(c, _):
        c = lax.fori_loop(0, record_every, lambda i, s: one_step(s), c)
        return c, observables(c)

    n_rec, rem = divmod(steps, record_every)
    c = (ur0, ui0)
    c, obs = lax.scan(chunk, c, None, length=n_rec)
    c = lax.fori_loop(0, rem, lambda i, s: one_step(s), c)
    obs0 = observables((ur0, ui0))
    if rem:  # static: record the true final state when record_every ∤ steps
        obs_end = observables(c)
        obs = jax.tree_util.tree_map(
            lambda a, b, e: jnp.concatenate([a[None], b, e[None]], 0),
            obs0, obs, obs_end)
    else:
        obs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], 0), obs0, obs)
    return jnp.stack(c), obs


def _prepare(psi0, V, dx, dt, kinetic, bc, imaginary):
    V = jnp.asarray(V)
    shape = tuple(V.shape)
    np_dtype = np.dtype(V.dtype)
    psi0 = np.asarray(psi0)
    pair = np.stack([psi0.real.astype(np_dtype), psi0.imag.astype(np_dtype)])
    dim = len(shape)
    K_re, K_im, T_re, T_im, k2ax = [], [], [], [], []
    for ax in range(dim):
        kr, ki, tr, ti, k2a = _axis_matrices(
            shape[ax], float(dx), bc, float(dt) * float(kinetic),
            imaginary, np_dtype)
        K_re.append(jnp.asarray(kr))
        K_im.append(None if ki is None else jnp.asarray(ki))
        T_re.append(jnp.asarray(tr))
        T_im.append(None if ti is None else jnp.asarray(ti))
        k2ax.append(k2a)
    k2 = sum(_axis_view(jnp.asarray(a.astype(np_dtype)), i, dim)
             for i, a in enumerate(k2ax))
    mats = {"K_re": tuple(K_re), "K_im": tuple(K_im),
            "T_re": tuple(T_re), "T_im": tuple(T_im)}
    return jnp.asarray(pair), V, shape, mats, k2


def evolve_gemm(psi0, V, dx: float, dt: float, steps: int, gamma: float,
                kinetic: float = 0.5, p: float = 3.0, bc: str = "periodic",
                lb: float = 0.0, imaginary: bool = False,
                record_every: int = 1, precision: str = "highest"):
    """split_step.evolve twin on the GEMM engine — identical contract
    (complex psi_final, obs sampled at t=0, every record_every steps, and
    the true final time when record_every ∤ steps). `precision` sets the
    f32 GEMM pass count (HIGHEST = 6-pass, the accuracy-faithful default;
    'default' trades ~1e-3-class phase error per step for 6× fewer MXU
    passes — measured in the TPU artifact, not assumed)."""
    pair, V, shape, mats, k2 = _prepare(psi0, V, dx, dt, kinetic, bc,
                                        imaginary)
    xs = tuple(jnp.asarray(x, V.dtype)
               for x in axis_coords(shape, dx, lb, bc))
    prec = {"highest": lax.Precision.HIGHEST,
            "default": lax.Precision.DEFAULT}[precision]
    out, obs = _evolve_gemm_jit(
        pair, V, xs, mats, k2,
        jnp.asarray(dt, V.dtype), jnp.asarray(gamma, V.dtype),
        jnp.asarray(kinetic, V.dtype), dx=float(dx), p=float(p),
        steps=int(steps), record_every=int(record_every),
        imaginary=bool(imaginary), bc=bc, shape=shape, prec=prec)
    n_rec, rem = divmod(steps, record_every)
    t = [0.0] + list((np.arange(1, n_rec + 1) * record_every) * float(dt))
    if rem:
        t.append(steps * float(dt))
    obs["t"] = np.asarray(t)
    out = np.asarray(out)
    return out[0] + 1j * out[1], obs


def ground_state_gemm(V, dx: float, gamma: float, kinetic: float = 0.5,
                      p: float = 3.0, bc: str = "periodic", lb: float = 0.0,
                      tau: float = 2e-3, steps: int = 40000,
                      tol: float = 1e-12, chunk: int = 500, psi0=None,
                      precision: str = "highest"):
    """split_step.ground_state twin: renormalized imaginary-time GEMM flow
    with a host-side per-chunk μ tolerance check. Returns (mu, psi)."""
    V = np.asarray(V)
    if psi0 is None:
        psi0 = np.exp(-V / (2.0 * max(kinetic, 1e-6)))  # same default
        psi0 = psi0 / np.sqrt((psi0 ** 2).sum()         # as split_step
                              * float(dx) ** V.ndim)
    psi = psi0
    mu_prev = None
    for _ in range(max(1, int(steps) // int(chunk))):
        psi, obs = evolve_gemm(psi, V, dx, tau, int(chunk), gamma,
                               kinetic=kinetic, p=p, bc=bc, lb=lb,
                               imaginary=True, record_every=int(chunk),
                               precision=precision)
        mu = float(obs["mu"][-1])
        if mu_prev is not None and abs(mu - mu_prev) < tol:
            break
        mu_prev = mu
    return mu, psi
