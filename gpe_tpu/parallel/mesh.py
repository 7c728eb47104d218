"""Collocation-point data parallelism over a device mesh.

The reference is single-device (SURVEY.md §2.G); the TPU-native scaling axis
is the collocation batch — the "long context" of a PINN. Design:

- 1-D `Mesh(('data',))`; collocation arrays sharded on their leading axis,
  params and boundary points replicated.
- The loss runs under `shard_map`; every quadrature reduction (μ numerator/
  denominator, ∫|ψ|², mean residual²) is a `jax.lax.psum` over the mesh axis,
  riding ICI. No other communication exists — gradients of the psum-reduced
  scalar are automatically correct (the transpose of psum is identity, and
  replicated params receive summed contributions via the shard_map transpose).
- Multi-host ready: the same code runs under `jax.distributed.initialize`
  with a global mesh; nothing here assumes single-process.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

AXIS = "data"


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize multi-host (DCN) execution via jax.distributed.

    On TPU pods the arguments are discovered from the environment
    (megascale/TPU metadata), so `initialize_multihost()` with no arguments is
    correct there; on CPU/GPU clusters pass coordinator_address
    ("host:port"), num_processes, and process_id explicitly (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Returns True when a multi-process runtime was initialized, False when
    this is a plain single-process session (no coordinator configured) — the
    single-host-multi-chip path needs no initialization: the same
    `make_mesh` + `shard_map` code runs over ICI unchanged, and after
    initialization it runs over ICI+DCN with jax.devices() spanning all hosts.
    """
    import os

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # pod-ish env: megascale coordinator, or a MULTI-worker hostname list (a
    # single-entry TPU_WORKER_HOSTNAMES — e.g. this image's tunnel runtime
    # sets "localhost" — is not a multihost deployment)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod_env = bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")) or \
        len([h for h in workers.split(",") if h.strip()]) > 1
    if coord is None and not on_pod_env:
        return False
    # NOTE: must not call jax.process_count()/jax.devices() here — any device
    # query initializes the XLA backend, after which jax.distributed refuses
    # to initialize. is_initialized() inspects the client without booting.
    if jax.distributed.is_initialized():
        return True
    try:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        if coord is None:
            # ambient pod-ish env vars but the XLA backend is already up in a
            # single-process session (e.g. this image's axon TPU runtime) —
            # treat as single-host
            return jax.process_count() > 1
        raise
    return True


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def batch_pspecs(batch: dict, axis: str = AXIS) -> dict:
    """PartitionSpecs for a problem batch: arrays whose leading axis is the
    collocation axis (same length as batch["x"]) are sharded on it; everything
    else (boundary points/values, probe sets, scalars) is replicated.

    The rule is structural, not name-based, so problem families with their own
    batch keys (Helmholtz boundary data, 2D disk samples) shard correctly
    without registering key names here. Collocation counts are sized in the
    thousands (n_points ≥ 1000 in every registered config) while boundary sets
    are tiny, so an accidental length collision is not a practical concern.
    """
    n_colloc = batch["x"].shape[0]

    def spec_for(v):
        arr = jnp.asarray(v) if not hasattr(v, "shape") else v
        if arr.ndim >= 1 and arr.shape[0] == n_colloc:
            return P(axis)
        return P()

    return {k: spec_for(v) for k, v in batch.items()}


def shard_batch(batch: dict, mesh: Mesh, axis: str = AXIS) -> dict:
    """Place batch arrays on the mesh with their canonical shardings."""
    specs = batch_pspecs(batch, axis)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in batch.items()}


def make_parallel_loss(loss_fn: Callable, mesh: Mesh, batch: dict,
                       axis: str = AXIS) -> Callable:
    """Wrap a psum-aware loss (signature loss_fn(params, batch, gamma, scale,
    axis_name)) in shard_map over the collocation axis.

    Returns sharded_loss(params, batch, gamma, scale) -> (total, aux), with
    identical (replicated) outputs on every device.
    """
    specs = batch_pspecs(batch, axis)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), specs, P(), P()),
             out_specs=(P(), P()),
             check_vma=False)
    def sharded(params, b, gamma, scale):
        return loss_fn(params, b, gamma, scale, axis_name=axis)

    return sharded


# Weak-keyed on the wrapped fn: when a spec/family's loss_fn (or fused vag)
# is garbage-collected, its sharded wrappers — and their jit caches — go with
# it, instead of accumulating for the process lifetime in long multi-family
# sweeps (advisor finding r2).
_PARALLEL_LOSS_CACHE: "weakref.WeakKeyDictionary" = None
_PARALLEL_VAG_CACHE: "weakref.WeakKeyDictionary" = None


def _weak_cached(cache_name: str, fn, make, mesh: Mesh, batch: dict,
                 axis: str) -> Callable:
    import weakref

    g = globals()
    if g[cache_name] is None:
        g[cache_name] = weakref.WeakKeyDictionary()
    sub = g[cache_name].setdefault(fn, {})
    key = (mesh, axis,
           tuple(sorted((k, tuple(jnp.shape(v))) for k, v in batch.items())))
    wrapped = sub.get(key)
    if wrapped is None:
        wrapped = make(fn, mesh, batch, axis)
        sub[key] = wrapped
    return wrapped


def parallel_loss_cached(loss_fn: Callable, mesh: Mesh, batch: dict,
                         axis: str = AXIS) -> Callable:
    """make_parallel_loss with a stable identity: repeated calls with the same
    (loss_fn, mesh, batch structure) return the SAME wrapper object, so
    fit()'s jitted chunk (which keys its compile cache on the loss_fn object)
    compiles once per continuation ramp instead of once per γ step."""
    return _weak_cached("_PARALLEL_LOSS_CACHE", loss_fn, make_parallel_loss,
                        mesh, batch, axis)


def make_parallel_vag(vag: Callable, mesh: Mesh, batch: dict,
                      axis: str = AXIS) -> Callable:
    """Wrap a psum-aware value_and_grad (the fused Pallas training gradient,
    pallas/fused_grad.py) in shard_map over the collocation axis.

    The kernel runs per-device on the LOCAL collocation shard; the wrapped
    vag psums the four global sums before forming the scalar cotangents and
    psums the collocation weight-grad tiles after pass 2 — two collectives
    per step riding ICI. Handles both the exact (stateless) and the
    one-step-relaxed (stateful) contract; the relaxed state holds the GLOBAL
    sums, replicated.
    """
    specs = batch_pspecs(batch, axis)
    if getattr(vag, "stateful", False):
        inner = partial(shard_map, mesh=mesh,
                        in_specs=(P(), specs, P(), P(), P()),
                        out_specs=((P(), P()), P(), P()),
                        check_vma=False)(
            lambda params, b, gamma, scale, state:
                vag(params, b, gamma, scale, state, axis_name=axis))
        inner_init = partial(shard_map, mesh=mesh,
                             in_specs=(P(), specs, P(), P()),
                             out_specs=P(), check_vma=False)(
            lambda params, b, gamma, scale:
                vag.init_state(params, b, gamma, scale, axis_name=axis))

        def sharded(params, b, gamma, scale, state):
            return inner(params, b, gamma, scale, state)

        sharded.stateful = True
        sharded.init_state = inner_init
        return sharded

    inner = partial(shard_map, mesh=mesh,
                    in_specs=(P(), specs, P(), P()),
                    out_specs=((P(), P()), P()), check_vma=False)(
        lambda params, b, gamma, scale:
            vag(params, b, gamma, scale, axis_name=axis))

    def sharded(params, b, gamma, scale):
        return inner(params, b, gamma, scale)

    return sharded


def parallel_vag_cached(vag: Callable, mesh: Mesh, batch: dict,
                        axis: str = AXIS) -> Callable:
    """make_parallel_vag with a stable identity (same rationale as
    parallel_loss_cached: fit()'s jit keys on the vag object)."""
    return _weak_cached("_PARALLEL_VAG_CACHE", vag, make_parallel_vag,
                        mesh, batch, axis)


def make_parallel_step(loss_fn: Callable, optimizer, mesh: Mesh, batch: dict,
                       axis: str = AXIS) -> Callable:
    """Jitted full training step (loss + grad + optimizer update) with the
    loss evaluated under shard_map. Gradients w.r.t. replicated params come out
    replicated (shard_map transposes the broadcast into a psum over ICI)."""
    import optax

    sharded_loss = make_parallel_loss(loss_fn, mesh, batch, axis)

    @jax.jit
    def step(params, opt_state, b, gamma, scale):
        (total, aux), grads = jax.value_and_grad(sharded_loss, has_aux=True)(
            params, b, gamma, scale)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, aux

    return step


def make_ensemble_step(loss_fn, optimizer, mesh: Mesh, axis: str = "ens"):
    """Device-parallel ENSEMBLE training step: R independent runs (seeds or
    modes) advance simultaneously with the run axis sharded across chips —
    the second TPU-native parallelism mode named in SURVEY.md §2.G (the first
    is collocation DP). Params/optimizer state carry a leading run axis and
    shard along it; the batch is replicated; there is NO cross-run
    communication, so scaling is embarrassingly linear over ICI.

    Returns step(params_b, opt_state_b, batch, gamma, scales) with scales a
    per-run (R,) vector (each seed keeps its own q/normal_const).
    """
    import optax

    def _one(params, opt_state, batch, gamma, scale):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, gamma, scale)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, aux["mu"]

    vstep = jax.vmap(_one, in_axes=(0, 0, None, None, 0))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(), P(), P(axis)),
             out_specs=(P(axis), P(axis), P(axis), P(axis)),
             check_vma=False)
    def sharded(params_b, opt_b, batch, gamma, scales):
        return vstep(params_b, opt_b, batch, gamma, scales)

    return jax.jit(sharded)


def shard_ensemble(tree, mesh: Mesh, axis: str = "ens"):
    """Place a pytree with a leading run axis so runs shard across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
