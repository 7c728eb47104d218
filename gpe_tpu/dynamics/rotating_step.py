"""Rotating-frame TDGPE propagation — Bao–Wang ADI split-step, on device.

Beyond-reference capability twice over: the reference repo
(LevBahn/Gross-Pitaevskii-Eigenvalue-problem) has neither a rotating frame
nor any time dependence (SURVEY.md §0); this module propagates the
rotating-frame time-dependent GPE for COMPLEX ψ(x, y)

    i ∂ψ/∂t = [ −c·Δ + V + γ|ψ|^(p−1) − Ω·L_z ] ψ,   L_z = −i(x∂_y − y∂_x),

with the alternating-direction splitting of Bao & Wang (J. Comput. Phys.
217 (2006) 612): grouping the rotation with the kinetic terms makes every
factor exactly exponentiable,

    A = c·p_x² + Ω·y·p_x    (diagonal after the FFT in x — symbol on (k_x, y)),
    B = c·p_y² − Ω·x·p_y    (diagonal after the FFT in y — symbol on (x, k_y)),
    C = V + γ|ψ|^(p−1)      (diagonal in position),

Strang-composed e^{−iτC/2} e^{−iτA/2} e^{−iτB} e^{−iτA/2} e^{−iτC/2} in one
jitted `lax.scan` (the TPU-native twin of the f64 numpy oracle in
validate/rotating.py — same operator ordering, so the two agree to machine
precision step-for-step). `imaginary=True` turns the stepper into the
renormalized gradient flow whose fixed points are the rotating-frame
stationary states (vortex states for Ω above the nucleation threshold).

Physics oracles used by tests/test_rotating_dynamics.py:
- **rotating-frame Kohn splitting**: rigidly displacing ANY stationary state
  of the harmonic trap sets off center-of-mass motion that decouples from
  the internal (interacting) dynamics (Ehrenfest + translation invariance of
  the γ-term). For ζ = ⟨x⟩+i⟨y⟩ the COM obeys ζ(t) = e^{−iΩt}(u₀cos t +
  v₀sin t) with u₀ = ζ(0), v₀ = ⟨p⟩(0); a rigid displacement d (⟨p⟩ = 0)
  gives exactly
      ⟨x⟩(t) = d·cos(t)·cos(Ωt),   ⟨y⟩(t) = −d·cos(t)·sin(Ωt),
  i.e. the dipole mode splits into ω± = ω_trap ± Ω with equal weights —
  independent of γ, a sharp nonlinear test with no fit parameters;
- exact norm conservation and conservation of the rotating-frame energy
  E[ψ] = ∫ c|∇ψ|² + V|ψ|² + (2γ/(p+1))|ψ|^(p+1) − Ω·ψ*L_zψ;
- stationarity: the imaginary-time ground state evolves as e^{−i∫μdt}ψ with
  symmetry observables (L_z, centers) frozen to machine precision; μ itself
  drifts at the O(τ) bias of the imaginary-time fixed point (first order
  verified by halving τ in tests);
- device ↔ numpy-oracle μ/L_z agreement from identical initial states.

Periodic bc only: the rotation symbols Ω·y·k_x, Ω·x·k_y are first-order in
the derivative, which the DST-I (Dirichlet) does not diagonalize — the
confining trap makes the periodic box exact to spectral accuracy anyway.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gpe_tpu.dynamics.split_step import axis_coords


@partial(jax.jit, static_argnames=("dx", "steps", "record_every",
                                   "imaginary", "p", "shape"))
def _evolve_rot_jit(psi0, V, xs, dt, gamma, omega, kinetic, *, dx, p, steps,
                    record_every, imaginary, shape):
    real_dtype = V.dtype
    cdtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64
    psi0 = psi0.astype(cdtype)
    n0, n1 = shape
    vol = dx * dx
    x = xs[0]                                   # axis-0 coordinate
    y = xs[1]                                   # axis-1 coordinate
    kx = jnp.asarray(2.0 * jnp.pi * jnp.fft.fftfreq(n0, d=dx), real_dtype)
    ky = jnp.asarray(2.0 * jnp.pi * jnp.fft.fftfreq(n1, d=dx), real_dtype)
    # A on (k_x, y); B on (x, k_y) — validate/rotating.py:61-65 ordering
    symb_A = kinetic * kx[:, None] ** 2 + omega * y[None, :] * kx[:, None]
    symb_B = kinetic * ky[None, :] ** 2 - omega * x[:, None] * ky[None, :]
    factor = jnp.asarray(-1.0 if imaginary else -1.0j, cdtype)
    expA_half = jnp.exp((0.5 * dt * factor) * symb_A.astype(cdtype))
    expB = jnp.exp((dt * factor) * symb_B.astype(cdtype))

    def abs_pow(psi, q):
        a2 = psi.real ** 2 + psi.imag ** 2
        if q == round(q) and q >= 0 and int(q) % 2 == 0:
            return a2 ** (int(q) // 2)
        return a2 ** (q / 2.0)

    def one_step(psi):
        dens = V + gamma * abs_pow(psi, p - 1.0)
        psi = psi * jnp.exp((0.5 * dt * factor) * dens.astype(cdtype))
        psi = jnp.fft.ifft(jnp.fft.fft(psi, axis=0) * expA_half, axis=0)
        psi = jnp.fft.ifft(jnp.fft.fft(psi, axis=1) * expB, axis=1)
        psi = jnp.fft.ifft(jnp.fft.fft(psi, axis=0) * expA_half, axis=0)
        dens = V + gamma * abs_pow(psi, p - 1.0)
        psi = psi * jnp.exp((0.5 * dt * factor) * dens.astype(cdtype))
        if imaginary:
            nrm = jnp.sqrt(jnp.sum(psi.real ** 2 + psi.imag ** 2) * vol)
            psi = psi / nrm.astype(cdtype)
        return psi

    def observables(psi):
        a2 = psi.real ** 2 + psi.imag ** 2
        norm = jnp.sum(a2) * vol
        gx = jnp.fft.ifft(
            (1j * kx[:, None]).astype(cdtype) * jnp.fft.fft(psi, axis=0),
            axis=0)
        gy = jnp.fft.ifft(
            (1j * ky[None, :]).astype(cdtype) * jnp.fft.fft(psi, axis=1),
            axis=1)
        grad2 = gx.real ** 2 + gx.imag ** 2 + gy.real ** 2 + gy.imag ** 2
        lz_dens = jnp.real(jnp.conj(psi) * (-1j)
                           * (x[:, None] * gy - y[None, :] * gx))
        ke = kinetic * jnp.sum(grad2) * vol
        pe = jnp.sum(V * a2) * vol
        inter = jnp.sum(abs_pow(psi, p + 1.0)) * vol
        lz = jnp.sum(lz_dens) * vol
        mu = (ke + pe + gamma * inter - omega * lz) / norm
        energy = (ke + pe + (2.0 * gamma / (p + 1.0)) * inter
                  - omega * lz) / norm
        cx = jnp.sum(x[:, None] * a2) * vol / norm
        cy = jnp.sum(y[None, :] * a2) * vol / norm
        wx = jnp.sum(x[:, None] ** 2 * a2) * vol / norm - cx * cx
        wy = jnp.sum(y[None, :] ** 2 * a2) * vol / norm - cy * cy
        return {"norm": norm, "energy": energy, "mu": mu,
                "lz": lz / norm,
                "center": jnp.stack([cx, cy]),
                "width_sq": jnp.stack([wx, wy])}

    n_rec, rem = divmod(steps, record_every)

    def chunk(psi, _):
        psi = lax.fori_loop(0, record_every, lambda i, s: one_step(s), psi)
        return psi, observables(psi)

    psi, obs = lax.scan(chunk, psi0, None, length=n_rec)
    psi = lax.fori_loop(0, rem, lambda i, s: one_step(s), psi)
    obs0 = observables(psi0)
    if rem:  # static: record the true final state when record_every ∤ steps
        obs_end = observables(psi)
        obs = jax.tree_util.tree_map(
            lambda a, b, c: jnp.concatenate([a[None], b, c[None]], 0),
            obs0, obs, obs_end)
    else:
        obs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], 0), obs0, obs)
    return psi, obs


def evolve_rotating(psi0, V, dx: float, dt: float, steps: int, gamma: float,
                    omega: float, kinetic: float = 0.5, p: float = 3.0,
                    lb: float = 0.0, imaginary: bool = False,
                    record_every: int = 1):
    """Propagate complex ψ(x, y) in the frame rotating at Ω for `steps`
    Strang ADI steps of size dt (imaginary=True: renormalized gradient flow
    toward the rotating-frame ground state — validate/rotating.py:74-82 on
    device). V: (nx, ny) real grid (same dx per axis, periodic box starting
    at lb). Returns (psi_final, obs) with obs sampled at t=0, after every
    `record_every` steps, and (when record_every ∤ steps) at the true final
    time steps·dt. float64 V selects the complex128 path ONLY inside an
    enabled-x64 context (`with jax.enable_x64(True):` — this JAX version
    removed jax.experimental.enable_x64); otherwise f64 input is silently
    downcast and the complex64 path runs."""
    V = jnp.asarray(V)
    if V.ndim != 2:
        raise ValueError("rotating frame is 2D: V must be (nx, ny)")
    shape = tuple(V.shape)
    xs = tuple(jnp.asarray(c, V.dtype)
               for c in axis_coords(shape, dx, lb, "periodic"))
    psi, obs = _evolve_rot_jit(
        jnp.asarray(psi0), V, xs,
        jnp.asarray(dt, V.dtype), jnp.asarray(gamma, V.dtype),
        jnp.asarray(omega, V.dtype), jnp.asarray(kinetic, V.dtype),
        dx=float(dx), p=float(p), steps=int(steps),
        record_every=int(record_every), imaginary=bool(imaginary),
        shape=shape)
    import numpy as np

    n_rec, rem = divmod(steps, record_every)
    t = [0.0] + list((np.arange(1, n_rec + 1) * record_every) * float(dt))
    if rem:
        t.append(steps * float(dt))
    obs["t"] = np.asarray(t)
    return psi, obs


def rotating_ground_state(V, dx: float, gamma: float, omega: float,
                          kinetic: float = 0.5, p: float = 3.0,
                          tau: float = 2e-3, steps: int = 40000,
                          tol: float = 1e-11, lb: float = 0.0,
                          psi0=None, seed_vortex: bool = True,
                          chunk: int = 200):
    """Device-resident rotating-frame ground state: chunked jitted imaginary
    time with a host μ-tolerance check every `chunk` steps. The default seed
    mirrors the numpy oracle (validate/rotating.py:47-56): a displaced
    vortex × Gaussian + deterministic noise, so imaginary time can break
    symmetry into vortex states above the critical Ω; pass psi0 (or
    seed_vortex=False) to target the zero-circulation branch. Returns
    (mu, psi, lz) with ∫|ψ|²=1."""
    import numpy as np

    V = jnp.asarray(V)
    n0, n1 = V.shape
    x0, x1 = axis_coords(V.shape, dx, lb, "periodic")
    if psi0 is None:
        X, Y = np.meshgrid(np.asarray(x0), np.asarray(x1), indexing="ij")
        psi = np.exp(-(X ** 2 + Y ** 2) / 2.0).astype(complex)
        if seed_vortex and omega > 0:
            rng = np.random.default_rng(0)
            psi = psi * ((X - 0.3) + 1j * (Y + 0.2))
            psi += 0.01 * (rng.standard_normal(psi.shape)
                           + 1j * rng.standard_normal(psi.shape)
                           ) * np.abs(psi).max()
        psi = jnp.asarray(psi)
    else:
        psi = jnp.asarray(psi0)
    vol = dx * dx
    psi = psi / jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2) * vol)

    mu_prev = float("inf")
    obs = None
    for _ in range(max(1, steps // chunk)):
        psi, obs = evolve_rotating(psi, V, dx, tau, chunk, gamma, omega,
                                   kinetic, p, lb=lb, imaginary=True,
                                   record_every=chunk)
        mu = float(obs["mu"][-1])
        if abs(mu - mu_prev) < tol * max(1.0, abs(mu)):
            break
        mu_prev = mu
    return float(obs["mu"][-1]), psi, float(obs["lz"][-1])
