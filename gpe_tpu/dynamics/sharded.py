"""Mesh-sharded TDGPE propagation — distributed spectral transforms.

Scales the split-step propagator (split_step.py) over a 1-D device mesh by
sharding the grid's leading axis — the dynamics analog of the framework's
collocation-point data parallelism (parallel/mesh.py). The FFT along the
sharded axis is non-local, so each kinetic half-step does the classic
distributed-FFT transpose dance, entirely on ICI:

    position layout  (n0/P, n1, …)   — axis 0 sharded
      1. local FFT/DST along axes 1..d−1          (XLA on-chip)
      2. `lax.all_to_all` axis 1 → axis 0          (one ICI collective)
    transposed layout (n0, n1/P, …)  — axis 1 sharded
      3. local FFT/DST along axis 0
      4. multiply by the kinetic symbol exp(−i·dt·c·k²)  (sharded the same)
      5-7. inverse of 3-2-1

Everything else — the position-space nonlinear factor, the per-step
renormalization of imaginary time, the spectral observables — is local math
plus one `psum` per global reduction, riding the same mesh axis. The whole
time loop stays a single `lax.scan` under one jit: per Strang step the only
communication is two all_to_alls (+ a psum when imaginary).

Parity contract: identical operator ordering to split_step._evolve_jit, so a
sharded run reproduces the single-device trajectory to FFT round-off —
asserted on the 8-virtual-device CPU mesh by tests/test_dynamics_sharded.py
and exercised by __graft_entry__.dryrun_multichip stage 6. Beyond-reference
twice over: the reference (LevBahn/Gross-Pitaevskii-Eigenvalue-problem) has
neither time dependence nor any multi-device execution (SURVEY.md §0, §2.G).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpe_tpu.dynamics.split_step import (_axis_view, _dst1_ortho,
                                         _evolve_core, axis_coords)

AXIS = "grid"


def _full_k2(shape, dx, bc, real_dtype):
    """Laplacian symbol k² on the FULL grid (sharded along axis 1 when passed
    into the shard_map — the layout where the symbol is applied)."""
    dim = len(shape)
    if bc == "periodic":
        ks = [jnp.asarray(2.0 * jnp.pi * jnp.fft.fftfreq(n, d=dx), real_dtype)
              for n in shape]
    elif bc == "dirichlet":
        ks = [jnp.asarray(jnp.pi * jnp.arange(1, n + 1) / ((n + 1) * dx),
                          real_dtype) for n in shape]
    else:
        raise ValueError(f"unknown bc {bc!r}")
    return sum(_axis_view(k, i, dim) ** 2 for i, k in enumerate(ks))


@partial(jax.jit, static_argnames=("dx", "steps", "record_every", "imaginary",
                                   "bc", "p", "shape", "mesh", "axis"))
def _evolve_sharded_jit(psi0, V, xs, k2, dt, gamma, kinetic, *, dx, p, steps,
                        record_every, imaginary, bc, shape, mesh, axis):
    real_dtype = V.dtype
    cdtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64
    psi0 = psi0.astype(cdtype)
    dim = len(shape)
    vol = dx ** dim
    npts = 1
    for n in shape:
        npts *= n
    factor = jnp.asarray(-1.0 if imaginary else -1.0j, cdtype)
    kin_prop = jnp.exp(factor * (dt * kinetic) * k2.astype(cdtype))

    def tr1(a, ax):                 # local transform along one full axis
        return jnp.fft.fft(a, axis=ax) if bc == "periodic" \
            else _dst1_ortho(a, ax)

    def itr1(a, ax):
        return jnp.fft.ifft(a, axis=ax) if bc == "periodic" \
            else _dst1_ortho(a, ax)

    def body(psi_b, V_b, x0_b, kin_b, k2_b):
        # inside shard_map: blocks are (n0/P, n1, …) position layout for
        # psi/V, (n0, n1/P, …) transposed layout for kin/k2
        def to_spec(a):
            for ax in range(1, dim):
                a = tr1(a, ax)
            a = lax.all_to_all(a, axis, split_axis=1, concat_axis=0,
                               tiled=True)
            return tr1(a, 0)        # transposed layout: axis 1 sharded

        def from_spec(c):
            c = itr1(c, 0)
            c = lax.all_to_all(c, axis, split_axis=0, concat_axis=1,
                               tiled=True)
            for ax in range(1, dim):
                c = itr1(c, ax)
            return c

        def gsum(a):
            return lax.psum(jnp.sum(a), axis)

        if bc == "periodic":
            def grad_sq_int(coef):  # Parseval: Σ_j|ψ_j|² = (1/N)Σ_k|F_k|²
                return gsum(k2_b * (coef.real ** 2 + coef.imag ** 2)) \
                    * (vol / npts)
        else:
            def grad_sq_int(coef):  # ortho DST-I coefs: plain Parseval
                return gsum(k2_b * (coef.real ** 2 + coef.imag ** 2)) * vol

        xs_local = (x0_b,) + xs[1:]
        return _evolve_core(
            psi_b, V_b, xs_local, dt, gamma, kinetic, vol=vol, p=p,
            steps=steps, record_every=record_every, imaginary=imaginary,
            to_spec=to_spec, from_spec=from_spec, kin_prop=kin_b,
            grad_sq_int=grad_sq_int, gsum=gsum, dim=dim, cdtype=cdtype,
            factor=factor)

    shard0 = P(axis, *([None] * (dim - 1)))          # position layout
    shard1 = P(None, axis, *([None] * (dim - 2)))    # transposed layout
    return shard_map(
        body, mesh=mesh,
        in_specs=(shard0, shard0, P(axis), shard1, shard1),
        out_specs=(shard0, P()))(psi0, V, xs[0], kin_prop, k2)


def evolve_sharded(psi0, V, dx: float, dt: float, steps: int, gamma: float,
                   mesh: Mesh, kinetic: float = 0.5, p: float = 3.0,
                   bc: str = "periodic", lb: float = 0.0,
                   imaginary: bool = False, record_every: int = 1,
                   axis: str | None = None):
    """split_step.evolve, sharded over `mesh` (1-D). The grid's axis 0 AND
    axis 1 must both be divisible by mesh.size (the all_to_all transpose
    tiles both); V must be ≥2-D. Returns (psi_final sharded on axis 0, obs)
    with identical semantics/conventions to evolve() — see its docstring for
    the x64 note and the record_every ∤ steps contract."""
    V = jnp.asarray(V)
    if V.ndim < 2:
        raise ValueError("sharded propagation needs a ≥2-D grid")
    shape = tuple(V.shape)
    n_dev = mesh.size
    if shape[0] % n_dev or shape[1] % n_dev:
        raise ValueError(f"grid axes 0/1 {shape[:2]} must divide mesh size "
                         f"{n_dev} (all_to_all transpose)")
    axis = axis or mesh.axis_names[0]
    xs = tuple(jnp.asarray(x, V.dtype)
               for x in axis_coords(shape, dx, lb, bc))
    k2 = _full_k2(shape, float(dx), bc, V.dtype)
    dim = len(shape)
    sh0 = NamedSharding(mesh, P(axis, *([None] * (dim - 1))))
    sh1 = NamedSharding(mesh, P(None, axis, *([None] * (dim - 2))))
    psi0 = jax.device_put(jnp.asarray(psi0), sh0)
    V = jax.device_put(V, sh0)
    k2 = jax.device_put(k2, sh1)
    xs = (jax.device_put(xs[0], NamedSharding(mesh, P(axis))),) + xs[1:]
    psi, obs = _evolve_sharded_jit(
        psi0, V, xs, k2,
        jnp.asarray(dt, V.dtype), jnp.asarray(gamma, V.dtype),
        jnp.asarray(kinetic, V.dtype),
        dx=float(dx), p=float(p), steps=int(steps),
        record_every=int(record_every), imaginary=bool(imaginary), bc=bc,
        shape=shape, mesh=mesh, axis=axis)
    import numpy as np

    n_rec, rem = divmod(steps, record_every)
    t = [0.0] + list((np.arange(1, n_rec + 1) * record_every) * float(dt))
    if rem:
        t.append(steps * float(dt))
    obs["t"] = np.asarray(t)
    return psi, obs
