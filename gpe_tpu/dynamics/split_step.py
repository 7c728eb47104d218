"""Real/imaginary-time TDGPE propagation — split-step spectral, on device.

Beyond-reference capability: the reference repo is entirely
time-INdependent (SURVEY.md §0 — every script solves the stationary
eigenproblem); once a ground or excited state is found there is no way to
ask the physical follow-up questions (quench response, collective modes,
transport). This module propagates the time-dependent GPE

    i ∂ψ/∂t = −c Δψ + V ψ + γ |ψ|^(p−1) ψ

with Strang splitting under one jitted `lax.scan` — the TPU-native twin of
the f64 numpy oracle in validate/imaginary_time.py (same operator
conventions: `kinetic` = c, `p`-power nonlinearity, bc ∈ {periodic FFT,
Dirichlet DST-I}), generic over dimension (1D/2D/3D share the code path).

Design notes (TPU):
- the per-step cost is two spectral transforms; XLA lowers `jnp.fft` to the
  TPU FFT, and the whole time loop is a single compiled scan — no host
  round-trips between steps;
- Dirichlet needs a DST-I, which jnp does not provide: it is built from the
  complex FFT of the odd extension (length 2(n+1)) — O(2× the FFT), static
  shapes, works for complex ψ (`_dst1_ortho`);
- observables (norm, energy, μ, per-axis dipole ⟨x⟩ and width) are computed
  spectrally via Parseval inside the scan every `record_every` steps, so a
  full conservation/mode trace costs no extra transforms of ψ itself;
- `imaginary=True` turns the same stepper into the gradient-flow ground-state
  solver (renormalizing each step) — `ground_state()` wraps it with a
  chunked-scan host tolerance check, giving a device-resident oracle that
  tests verify against the numpy reference oracle.

Physics oracles used by tests/test_dynamics.py: exact norm conservation,
O(dt²) energy conservation, the γ=0 coherent state ⟨x⟩(t)=d·cos(ωt), Kohn's
theorem (the dipole mode of the INTERACTING gas oscillates at the bare trap
frequency, independent of γ — a sharp nonlinear test), free-Gaussian
spreading, and stationary-phase evolution e^{−iμt} of box eigenstates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _axis_view(k: jnp.ndarray, axis: int, dim: int) -> jnp.ndarray:
    return k.reshape([-1 if j == axis else 1 for j in range(dim)])


def _dst1_ortho(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Orthonormal DST-I along `axis` via the odd-extension FFT identity
    FFT(0, a, 0, −rev(a))_k = −2i·Σ_j a_j sin(πjk/(n+1)); involutory, valid
    for complex input (the identity is linear — no conjugation involved)."""
    n = a.shape[axis]
    zshape = list(a.shape)
    zshape[axis] = 1
    z = jnp.zeros(zshape, dtype=jnp.result_type(a, jnp.complex64))
    ext = jnp.concatenate([z, a.astype(z.dtype), z, -jnp.flip(a, axis)],
                          axis=axis)
    F = jnp.fft.fft(ext, axis=axis)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(1, n + 1)
    return (0.5j) * F[tuple(sl)] * jnp.sqrt(2.0 / (n + 1)).astype(F.real.dtype)


def _spectral_ops(shape: tuple, dx: float, bc: str, real_dtype):
    """(to_spec, from_spec, k2, parseval): transforms + Laplacian symbol +
    a function giving Σ_k k²·w(coef) ≡ ∫|∇ψ|²dx / vol-units for the bc.
    Mirrors validate/imaginary_time._spectral_ops but in jnp for complex ψ."""
    dim = len(shape)
    vol = dx ** dim
    if bc == "periodic":
        ks = [jnp.asarray(2.0 * jnp.pi * jnp.fft.fftfreq(n, d=dx),
                          real_dtype) for n in shape]
        k2 = sum(_axis_view(k, i, dim) ** 2 for i, k in enumerate(ks))
        npts = 1
        for n in shape:
            npts *= n

        def grad_sq_int(coef):  # Parseval: Σ_j|ψ_j|² = (1/N)Σ_k|F_k|²
            return jnp.sum(k2 * (coef.real ** 2 + coef.imag ** 2)) \
                * (vol / npts)

        return jnp.fft.fftn, jnp.fft.ifftn, k2, grad_sq_int
    if bc == "dirichlet":
        def axis_k(n):
            return jnp.asarray(
                jnp.pi * jnp.arange(1, n + 1) / ((n + 1) * dx), real_dtype)

        k2 = sum(_axis_view(axis_k(n), i, dim) ** 2
                 for i, n in enumerate(shape))

        def tr(a):
            for ax in range(dim):
                a = _dst1_ortho(a, ax)
            return a

        def grad_sq_int(coef):  # ortho DST-I coefficients: plain Parseval
            return jnp.sum(k2 * (coef.real ** 2 + coef.imag ** 2)) * vol

        return tr, tr, k2, grad_sq_int
    raise ValueError(f"unknown bc {bc!r}")


def axis_coords(shape: tuple, dx: float, lb: float, bc: str):
    """Per-axis sample coordinates matching the oracle conventions:
    periodic x_j = lb + j·dx (j=0..n−1); dirichlet interior x_j = lb + j·dx
    (j=1..n, box length L=(n+1)dx) — validate/imaginary_time.py:14-19."""
    import numpy as np

    off = 1 if bc == "dirichlet" else 0
    return [np.asarray(lb + (np.arange(n) + off) * dx) for n in shape]


def abs_pow(psi, q):
    """|ψ|^q for static python float q: even integer exponents lower to
    |ψ|²-powers with no sqrt."""
    a2 = psi.real ** 2 + psi.imag ** 2
    if q == round(q) and q >= 0 and int(q) % 2 == 0:
        return a2 ** (int(q) // 2)
    return a2 ** (q / 2.0)


def _evolve_core(psi0, V, xs, dt, gamma, kinetic, *, vol, p, steps,
                 record_every, imaginary, to_spec, from_spec, kin_prop,
                 grad_sq_int, gsum, dim, cdtype, factor):
    """Shared Strang-splitting loop: the single-device (_evolve_jit) and the
    mesh-sharded (sharded.py, to_spec/from_spec with all_to_all transposes
    and `gsum` a psum-reduced global sum) paths differ ONLY in the injected
    spectral transforms and reduction."""

    def one_step(psi):
        dens = V + gamma * abs_pow(psi, p - 1.0)
        psi = psi * jnp.exp((0.5 * dt * factor) * dens.astype(cdtype))
        psi = from_spec(to_spec(psi) * kin_prop)
        dens = V + gamma * abs_pow(psi, p - 1.0)
        psi = psi * jnp.exp((0.5 * dt * factor) * dens.astype(cdtype))
        if imaginary:
            nrm = jnp.sqrt(gsum(psi.real ** 2 + psi.imag ** 2) * vol)
            psi = psi / nrm.astype(cdtype)
        return psi

    def observables(psi):
        a2 = psi.real ** 2 + psi.imag ** 2
        norm = gsum(a2) * vol
        ke = kinetic * grad_sq_int(to_spec(psi))
        pe = gsum(V * a2) * vol
        inter = gsum(abs_pow(psi, p + 1.0)) * vol
        energy = (ke + pe + (2.0 * gamma / (p + 1.0)) * inter) / norm
        mu = (ke + pe + gamma * inter) / norm
        centers, widths = [], []
        for ax in range(dim):
            xa = _axis_view(xs[ax], ax, dim)
            c = gsum(xa * a2) * vol / norm
            w2 = gsum(xa * xa * a2) * vol / norm - c * c
            centers.append(c)
            widths.append(w2)
        return {"norm": norm, "energy": energy, "mu": mu,
                "center": jnp.stack(centers), "width_sq": jnp.stack(widths)}

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


@partial(jax.jit, static_argnames=("dx", "steps", "record_every",
                                   "imaginary", "bc", "p", "shape"))
def _evolve_jit(psi0, V, xs, dt, gamma, kinetic, *, dx, p, steps,
                record_every, imaginary, bc, shape):
    real_dtype = V.dtype
    cdtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64
    psi0 = psi0.astype(cdtype)
    dim = len(shape)
    vol = dx ** dim
    to_spec, from_spec, k2, grad_sq_int = _spectral_ops(
        shape, dx, bc, real_dtype)
    factor = jnp.asarray(-1.0 if imaginary else -1.0j, cdtype)
    kin_prop = jnp.exp(factor * (dt * kinetic) * k2.astype(cdtype))
    return _evolve_core(
        psi0, V, xs, dt, gamma, kinetic, vol=vol, p=p, steps=steps,
        record_every=record_every, imaginary=imaginary, to_spec=to_spec,
        from_spec=from_spec, kin_prop=kin_prop, grad_sq_int=grad_sq_int,
        gsum=jnp.sum, dim=dim, cdtype=cdtype, factor=factor)

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


def evolve(psi0, V, dx: float, dt: float, steps: int, gamma: float,
           kinetic: float = 0.5, p: float = 3.0, bc: str = "periodic",
           lb: float = 0.0, imaginary: bool = False, record_every: int = 1):
    """Propagate ψ under i∂ψ/∂t = −c·Δψ + Vψ + γ|ψ|^(p−1)ψ for `steps`
    Strang steps of size dt (imaginary=True: τ-flow with per-step
    renormalization — the ground-state iteration of
    validate/imaginary_time.imaginary_time_gpe:117-123, on device).

    V: (n,)/(nx,ny)/(nx,ny,nz) real grid sampling (same dx per axis; float64
    input selects the complex128 path ONLY inside `with jax.enable_x64(True):`
    — without it f64 arrays are silently downcast to the complex64 path).
    Returns (psi_final, obs): obs holds "t" plus norm/energy/mu/center/
    width_sq sampled at t=0, after every `record_every` steps, and (when
    record_every ∤ steps) at the true final time steps·dt.
    """
    V = jnp.asarray(V)
    shape = tuple(V.shape)
    xs = tuple(jnp.asarray(x, V.dtype)
               for x in axis_coords(shape, dx, lb, bc))
    psi, obs = _evolve_jit(
        jnp.asarray(psi0), V, xs,
        jnp.asarray(dt, V.dtype), jnp.asarray(gamma, V.dtype),
        jnp.asarray(kinetic, V.dtype),
        dx=float(dx), p=float(p), steps=int(steps),
        record_every=int(record_every),
        imaginary=bool(imaginary), bc=bc, shape=shape)
    import numpy as np

    n_rec, rem = divmod(steps, record_every)
    t = [0.0] + list((np.arange(1, n_rec + 1) * record_every) * float(dt))
    if rem:
        t.append(steps * float(dt))
    obs["t"] = np.asarray(t)
    return psi, obs


def ground_state(V, dx: float, gamma: float, kinetic: float = 0.5,
                 p: float = 3.0, tau: float = 2e-3, steps: int = 20000,
                 tol: float = 1e-11, bc: str = "periodic",
                 psi0=None, chunk: int = 200):
    """Device-resident imaginary-time ground state: chunked jitted scans with
    a host μ-tolerance check every `chunk` steps (compiles once, reuses).
    Returns (mu, psi) with ∫|ψ|²=1. Carries the same O(τ) μ bias as the
    numpy oracle — use validate/imaginary_time.py with richardson≥1 when the
    μ itself is the quantity under test; this is the fast warm-start/
    dynamics-initial-condition path."""
    V = jnp.asarray(V)
    if psi0 is None:
        psi = jnp.exp(-V / (2.0 * max(kinetic, 1e-6)))
        if bc == "dirichlet":
            for ax, n in enumerate(V.shape):
                env = jnp.sin(jnp.pi * jnp.arange(1, n + 1) / (n + 1))
                psi = psi * _axis_view(env.astype(V.dtype), ax, V.ndim)
    else:
        psi = jnp.asarray(psi0)
    vol = dx ** V.ndim
    psi = psi / jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2) * vol)

    mu_prev = float("inf")
    for _ in range(max(1, steps // chunk)):
        psi, obs = evolve(psi, V, dx, tau, chunk, gamma, kinetic, p, bc=bc,
                          imaginary=True, record_every=chunk)
        mu = float(obs["mu"][-1])
        if abs(mu - mu_prev) < tol * max(1.0, abs(mu)):
            break
        mu_prev = mu
    return mu, psi
