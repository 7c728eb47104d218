"""Lane-packing for ensembles of narrow MLPs (the fused-kernel small-N path).

Width-w nets (w ≤ 64) are zero-padded to the TPU's 128 lanes inside the fused
Pallas kernels, wasting ≥ half of every GEMM and VPU op. For ENSEMBLES of
independent runs (multirun seeds, β-sweep members — fit_ensemble workloads)
the padding lanes can instead carry M = 128//w more runs, packed
block-diagonally:

    layer 0:  W_packed = [W⁽⁰⁾ | W⁽¹⁾ | …]              (d, M·w)   — shared x
    hidden:   W_packed = blockdiag(W⁽⁰⁾, …, W⁽ᴹ⁻¹⁾)     (M·w, M·w)
    output:   W_packed[m·w:(m+1)·w, m] = W⁽ᵐ⁾           (M·w, M)
    biases:   concatenated                               (M·w,) / (M,)

The packed net's padded kernel shapes are IDENTICAL to a single run's
(zero-padding already blew everything up to 128 lanes), so one kernel
invocation now advances M runs at the cost of one — and the contraction
lengths and accumulation order are unchanged (the replaced padding zeros
become other-run features × zero weights, still exact zeros), so packed
results are bit-identical to the vmapped-unpacked path.

Training coupling: the loss gradient w.r.t. the OFF-diagonal blocks is
nonzero (if those weights moved, runs would see each other's features), so
packed gradients must be masked with `block_masks` before the optimizer
update — with the off-diagonal blocks pinned at zero, packed training is
exactly M independent runs.

Reference analog: none (the reference trains seeds sequentially,
plot_box_potential_at_ground_state_multiple_runs.py:987-1053); this is a
TPU-lane-economics design, VERDICT r1 weak #6.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

LANES = 128


def packable_runs(layers: Sequence[int], lanes: int = LANES) -> int:
    """How many runs of this per-run architecture fit in the lane budget.

    Requires uniform hidden width and scalar output; returns 1 (no packing)
    otherwise."""
    hidden = tuple(layers[1:-1])
    if not hidden or layers[-1] != 1:
        return 1
    w = hidden[0]
    if any(h != w for h in hidden):
        return 1
    return max(1, lanes // w)


def packed_layers(layers: Sequence[int], n_runs: int) -> tuple:
    """Per-run architecture → packed architecture."""
    return (layers[0],) + tuple(n_runs * h for h in layers[1:-1]) + (n_runs,)


def pack_params(params_batch, n_runs: int):
    """Stack-of-runs params (leading axis R on every leaf, R % n_runs == 0)
    → list of R//n_runs packed params pytrees, leading axis = packed unit.

    Layout per layer (w = per-run hidden width, M = n_runs):
      first:  (d, M·w)  column blocks
      hidden: (M·w, M·w) block diagonal
      last:   (M·w, M)  run m in column m, rows m·w:(m+1)·w
    """
    leaves = jax.tree.leaves(params_batch)
    R = leaves[0].shape[0]
    assert R % n_runs == 0, f"R={R} not divisible by n_runs={n_runs}"
    U = R // n_runs
    n_layers = len(params_batch)

    out_layers = []
    for li, (W, b) in enumerate(params_batch):
        # (R, fi, fo) → (U, M, fi, fo)
        Wm = W.reshape(U, n_runs, *W.shape[1:])
        bm = b.reshape(U, n_runs, *b.shape[1:])
        fi, fo = W.shape[1], W.shape[2]
        if li == 0:
            # shared input: concat along out axis → (U, fi, M·fo)
            Wp = jnp.concatenate([Wm[:, m] for m in range(n_runs)], axis=-1)
        elif li == n_layers - 1:
            # output: (U, M·fi, M·fo) with run m in rows m·fi, cols m·fo
            Wp = jnp.zeros((U, n_runs * fi, n_runs * fo), W.dtype)
            for m in range(n_runs):
                Wp = Wp.at[:, m * fi:(m + 1) * fi,
                           m * fo:(m + 1) * fo].set(Wm[:, m])
        else:
            Wp = jnp.zeros((U, n_runs * fi, n_runs * fo), W.dtype)
            for m in range(n_runs):
                Wp = Wp.at[:, m * fi:(m + 1) * fi,
                           m * fo:(m + 1) * fo].set(Wm[:, m])
        bp = jnp.concatenate([bm[:, m] for m in range(n_runs)], axis=-1)
        out_layers.append((Wp, bp))
    return tuple(out_layers)


def unpack_params(packed, layers: Sequence[int], n_runs: int):
    """Inverse of pack_params: packed (leading axis U) → per-run stack
    (leading axis R = U·n_runs, run-major within each unit)."""
    n_layers = len(packed)
    out = []
    for li, (Wp, bp) in enumerate(packed):
        fi, fo = layers[li], layers[li + 1]
        Ws, bs = [], []
        for m in range(n_runs):
            if li == 0:
                Ws.append(Wp[:, :, m * fo:(m + 1) * fo])
            else:
                Ws.append(Wp[:, m * fi:(m + 1) * fi, m * fo:(m + 1) * fo])
            bs.append(bp[:, m * fo:(m + 1) * fo])
        # (U, M, fi, fo) → (R, fi, fo)
        W = jnp.stack(Ws, axis=1).reshape(-1, *Ws[0].shape[1:])
        b = jnp.stack(bs, axis=1).reshape(-1, *bs[0].shape[1:])
        out.append((W, b))
    return tuple(out)


def block_masks(layers: Sequence[int], n_runs: int, dtype=jnp.float32):
    """Per-layer {0,1} weight masks keeping only the per-run blocks (the
    first layer needs none — every column is a legitimate per-run weight).
    Returns a pytree shaped like one packed params unit (weights, biases)."""
    n_layers = len(layers) - 1
    masks = []
    for li in range(n_layers):
        fi, fo = layers[li], layers[li + 1]
        if li == 0:
            Wm = jnp.ones((fi, n_runs * fo), dtype)
        else:
            r = jnp.arange(n_runs * fi)[:, None] // fi
            c = jnp.arange(n_runs * fo)[None, :] // fo
            Wm = (r == c).astype(dtype)
        bm = jnp.ones((n_runs * fo,), dtype)
        masks.append((Wm, bm))
    return tuple(masks)


def mask_grads(grads, masks):
    """Zero the off-diagonal (cross-run) blocks of packed gradients. Works
    with or without a leading unit axis (masks broadcast from the right)."""
    return jax.tree.map(lambda g, m: g * m, grads, masks)


def run_where(masks, cond_vec, new, old):
    """Per-run select on a packed pytree: for each run m, take `new`'s block
    where cond_vec[m] else `old`'s. cond_vec: (M,) bool (or (U, M) with a
    leading unit axis matching the leaves).

    Selection derives purely from the COLUMN block layout (run m owns the
    contiguous column block m): selecting whole columns by run suffices
    because both operands keep the off-diagonal cross-run blocks identically
    zero (block_masks pins them), so the rows a column-select "drags along"
    agree between `new` and `old` outside the diagonal block anyway. `masks`
    is accepted for signature symmetry with the other packed helpers but is
    not consulted."""
    del masks
    n_runs = cond_vec.shape[-1]

    def sel(n, o, is_bias):
        # per-run selector broadcast to the leaf's packed shape
        fi_fo = n.shape[-1]
        w = fi_fo // n_runs
        runs = jnp.arange(fi_fo) // w          # (cols,) → run index per lane
        c = cond_vec[..., runs]                # (..., cols)
        if not is_bias:
            c = c[..., None, :]                # broadcast over rows
        return jnp.where(c, n, o)

    out = []
    for (Wn, bn), (Wo, bo) in zip(new, old):
        out.append((sel(Wn, Wo, False), sel(bn, bo, True)))
    return tuple(out)
