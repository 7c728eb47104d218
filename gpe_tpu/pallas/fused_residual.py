"""Fused GPE loss-evaluation kernel (Pallas/TPU).

One kernel evaluates, per collocation row-tile, the ENTIRE forward-Laplacian
MLP (value + d Jacobian channels + Laplacian stacked into one GEMM per layer),
applies the GPE Hamiltonian Hu = −c·Δu + V·u + γ|u|^{p−1}u, and accumulates
the four global sums that determine the loss:

    S = (Σ (Hu)²,  Σ u·Hu,  Σ u²,  Σ u²·w)

from which μ = S₁/S₂, pde = (S₀ − 2μS₁ + μ²S₂)/N and the normalization
(S₃ − 1)² follow exactly. All channel state stays VMEM-resident across layers.

Measured on TPU v5e (224² points, [2,100,100,100,1]) with honest device
timing (forced-fetch scan regression — `jax.block_until_ready` does not
synchronize on this image's tunnel backend, see bench.py): ~2.5e8 pts/s at
tile=1792 (41 TF/s, ≈84% of the v5e's f32 MXU rate; the 2026-08-18 tile
sweep runs/probe_scoped_vmem/tile_sweep.json has 1792 beating 3136/3584/7168
at the padded-128 shape) vs ~8.6e7 pts/s for the unfused XLA path, which is
HBM-bandwidth-bound for these skinny 100-wide GEMMs (~25 FLOP/byte →
~20 TF/s roofline). Keeping all channel state
VMEM-resident across layers is a 3–4× win. `compute_dtype=bfloat16` runs the
GEMMs at the MXU's bf16 rate with f32 accumulation — measured neutral here
(the fused kernel is bound by the f32 VPU elementwise work: activation
triple + channel combines), kept for wider nets where the MXU dominates.

Scope: the vanilla ansatz (u = scale·net(x)) on scalar-output MLPs — the
flagship/bench evaluation path. Training still uses the XLA path (the kernel
defines no VJP); parity is enforced by tests against `make_loss_fn`.

Weights are zero-padded to 128 lanes on the host: padded hidden units carry
bias 0 → activation σ(0) ≠ 0, but the NEXT layer's padded input ROWS are zero,
so the extra units never contribute — verified against the unpadded XLA path.
"""
from __future__ import annotations


from typing import Sequence

import jax
import jax.numpy as jnp

from gpe_tpu.ops.laplacian import activation_triple

LANES = 128


def kernel_vmem_limit_bytes() -> int:
    """Per-kernel Mosaic VMEM limit for the fused kernels.

    Mosaic's default scoped-VMEM limit is 16 MiB, which caps the gradient
    kernel at row tiles <784 (width-128, shifted_tanh) and the eval kernel
    at 3136 for packed runs. Raising the limit per kernel via
    `pltpu.CompilerParams(vmem_limit_bytes=...)` travels with the kernel
    (no `--xla_tpu_scoped_vmem_limit_kib` deployment flag needed) and
    unlocks larger, faster tiles: measured +4% on the pass-2 gradient at
    tile 1024 vs the 16 MiB-safe 512 (runs/probe_scoped_vmem/result.json).
    Default 64 MiB — half a v5e core's 128 MiB VMEM, leaving the other half
    for XLA's surrounding buffers; GPE_TPU_SCOPED_VMEM_KIB overrides (and
    feeds the tile-cap model, fused_grad.grad_kernel_tile_cap)."""
    import os

    kib = int(os.environ.get("GPE_TPU_SCOPED_VMEM_KIB", 64 * 1024))
    return min(kib, 100 * 1024) * 1024


def pallas_supported() -> bool:
    """True when a TPU backend is active (the kernel also runs in interpret
    mode on CPU for tests)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pad_params(params: Sequence[tuple], w_dtype=jnp.float32):
    """Zero-pad every (W, b): output lanes to 128, input sublanes to ≥8
    (a K=2 contraction is hostile to the MXU and crashes Mosaic).
    Weights are stored in `w_dtype` (bf16 halves the VMEM footprint and runs
    the MXU at its bf16 rate); biases stay f32 (added post-accumulation)."""
    padded = []
    for w, b in params:
        fi, fo = w.shape
        pi = max(8, ((fi + LANES - 1) // LANES) * LANES if fi > 8 else fi)
        po = LANES * ((fo + LANES - 1) // LANES)
        wp = jnp.zeros((pi, po), w_dtype).at[:fi, :fo].set(w.astype(w_dtype))
        bp = jnp.zeros((po,), jnp.float32).at[:fo].set(b.astype(jnp.float32))
        padded.append((wp, bp))
    return padded


def make_pallas_loss_eval(layers: Sequence[int], activation: str = "tanh",
                          p: float = 3.0, kinetic: float = 1.0,
                          nonlinearity: str = "abs_power",
                          bc_weight: float = 10.0, norm_weight: float = 20.0,
                          tile: int = 1792, interpret: bool = False,
                          compute_dtype=jnp.float32, n_runs: int = 1):
    """Build eval_fn(params, batch, gamma, scale) -> (total, aux) computing the
    full GPE loss with the fused Pallas kernel for the collocation terms
    (boundary term handled by plain XLA — it is tiny).

    `layers` and the physics constants are compile-time; params/γ/scale are
    runtime. Matches train.problem.make_loss_fn for a vanilla-ansatz GPESpec.
    compute_dtype=bf16 runs the layer GEMMs at the MXU bf16 rate with f32
    accumulation (channel state, activations, and reductions stay f32).

    n_runs > 1 evaluates M INDEPENDENT runs lane-packed into one net
    (pallas/packing.py): `layers` stays the PER-RUN architecture, params must
    be packed (block-diagonal, run m's output on lane m), gamma/scale become
    (M,) vectors, and eval_fn returns (M,)-vector total/aux. The kernel body
    is unchanged — only the output lanes read and the global sums are
    per-run; the per-kernel cost is that of ONE padded run.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = layers[0]
    assert layers[-1] == 1, "scalar-output nets only"
    M = n_runs
    assert 1 <= M <= LANES // 4, f"n_runs={M} out of range"
    n_layers = len(layers) - 1
    act = activation_triple(activation)
    C = d + 2                              # value + d jacobian rows + laplacian

    def kernel(gamma_ref, scale_ref, x_ref, V_ref, w_ref, bval_ref, blap_ref,
               *rest):
        wrefs = rest[:-1]
        out_ref = rest[-1]
        i = pl.program_id(0)
        # per-run scalars broadcast to lane rows: run m's output (and sums)
        # live on lane m (scalar path M=1 → lane 0, as before)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def lane_row(ref):
            r = jnp.zeros((1, LANES), jnp.float32)
            for m in range(M):
                r = r + jnp.where(lane_r == m, ref[0, m], 0.0)
            return r

        gamma = lane_row(gamma_ref)
        scale = lane_row(scale_ref)

        T = x_ref.shape[0]
        d_pad = x_ref.shape[1]                           # ≥ 8 (lane padding)
        # Forward-Laplacian channels kept as SEPARATE (T, F) arrays — no
        # concatenates or sub-block slicing (Mosaic rejects the layout
        # offset changes), no .at[] scatter (unimplemented). The identity
        # Jacobian rows come from an iota comparison.
        col = jax.lax.broadcasted_iota(jnp.int32, (T, d_pad), 1)
        v = x_ref[...]
        jac = [(col == k).astype(jnp.float32) for k in range(d)]
        lp = jnp.zeros((T, d_pad), jnp.float32)

        for li in range(n_layers):
            W = wrefs[2 * li][...]
            b = wrefs[2 * li + 1][...]
            cast = lambda a: a.astype(compute_dtype)
            v = jnp.dot(cast(v), W, preferred_element_type=jnp.float32) + b
            jac = [jnp.dot(cast(j), W, preferred_element_type=jnp.float32)
                   for j in jac]
            lp = jnp.dot(cast(lp), W, preferred_element_type=jnp.float32)
            if li < n_layers - 1:
                val, d1, d2 = act(v)
                g2 = jac[0] * jac[0]
                for j in jac[1:]:
                    g2 = g2 + j * j
                jac = [d1 * j for j in jac]
                lp = d1 * lp + d2 * g2
                v = val

        # perturbation ansatz support: u = base + scale·net (vanilla passes
        # zero base tiles — two (T,1) streams, negligible bandwidth).
        # Full-width (T, LANES) elementwise: a (T,1) array occupies the same
        # (…,128) vector registers, so this costs nothing extra, and run m's
        # stream rides lane m (lanes ≥ M carry masked-out garbage).
        u = bval_ref[...] + scale * v                    # (T,1)+(1,L)·(T,L)
        lap = blap_ref[...] + scale * lp
        V = V_ref[...]
        w = w_ref[...]
        if nonlinearity == "power":
            nl = gamma * u**p
        else:
            nl = gamma * jnp.abs(u) ** (p - 1.0) * u
        hu = -kinetic * lap + V * u + nl

        # scatter-free scalar packing: per-run sum k lands on lane 4m+k via
        # iota masks (pure elementwise + broadcast, layout-stable)
        T_lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
        streams = (hu * hu, u * hu, u * u, u * u * w)
        sums = jnp.zeros((1, LANES), jnp.float32)
        for m in range(M):
            for k, arr in enumerate(streams):
                s = jnp.sum(jnp.where(T_lane == m, arr, 0.0))
                sums = sums + jnp.where(lane_r == 4 * m + k, s, 0.0)
        sums = sums.astype(jnp.float32)

        @pl.when(i == 0)
        def _():
            out_ref[...] = sums

        @pl.when(i > 0)
        def _():
            out_ref[...] = out_ref[...] + sums

    def _base_stream(arr, n):
        """Base array → kernel stream: None/(n,) shared → (n, 1) broadcast;
        per-run (n, M) → zero-padded to (n, LANES) so run m's base rides
        lane m (the kernel's full-width elementwise then needs no change)."""
        if arr is None:
            return jnp.zeros((n, 1), jnp.float32)
        arr = jnp.asarray(arr, jnp.float32)
        if arr.ndim == 1:
            return arr.reshape(-1, 1)
        assert arr.shape == (n, M), (arr.shape, n, M)
        return jnp.zeros((n, LANES), jnp.float32).at[:, :M].set(arr)

    def collocation_sums(params, x, V, w, gamma, scale,
                         base_val=None, base_lap=None):
        n = x.shape[0]
        # padded tail rows would contribute u(0) ≠ 0 to the global sums, so
        # the point count must tile exactly (every registered config does)
        assert n % tile == 0, f"collocation count {n} must be divisible by tile={tile}"
        grid = n // tile
        xp = jnp.zeros((n, max(d, 8)), jnp.float32).at[:, :d].set(
            x.astype(jnp.float32))
        padded = _pad_params(params, w_dtype=compute_dtype)
        flat = []
        for W, b in padded:
            flat.extend([W, b.reshape(1, -1)])

        bval = _base_stream(base_val, n)
        blap = _base_stream(base_lap, n)
        in_specs = [
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, max(d, 8)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, bval.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, blap.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for a in flat]

        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=kernel_vmem_limit_bytes()),
        )(jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, M)),
          jnp.reshape(jnp.asarray(scale, jnp.float32), (1, M)),
          xp, V.astype(jnp.float32).reshape(-1, 1),
          w.astype(jnp.float32).reshape(-1, 1), bval, blap, *flat)
        if M == 1:
            return out[0, 0], out[0, 1], out[0, 2], out[0, 3]
        s = out[0, :4 * M].reshape(M, 4)            # lane 4m+k → [m, k]
        return s[:, 0], s[:, 1], s[:, 2], s[:, 3]

    def eval_fn(params, batch, gamma, scale):
        from gpe_tpu.models import mlp

        hu2, uhu, u2, u2w = collocation_sums(
            params, batch["x"], batch["V"], batch["w"], gamma, scale,
            batch.get("base_val"), batch.get("base_lap"))
        n = batch["x"].shape[0]
        mu = uhu / (u2 + 1e-12)
        pde = (hu2 - 2.0 * mu * uhu + mu * mu * u2) / n
        norm = (u2w - 1.0) ** 2
        bv = mlp.mlp_apply(params, batch["bx"], activation) * scale
        if M > 1:
            bv = bv.reshape(-1, M)                 # (B, M), column per run
        if "base_bval" in batch:
            bbv = jnp.asarray(batch["base_bval"])
            if M > 1:
                # shared (B,) broadcasts across runs; per-run (B, M) adds as-is
                bv = bv + (bbv.reshape(-1, 1) if bbv.ndim == 1 else bbv)
            else:
                bv = bbv + bv
        boundary = jnp.mean(bv * bv, axis=0) if M > 1 else jnp.mean(bv * bv)
        total = pde + bc_weight * boundary + norm_weight * norm
        return total, {"pde": pde, "boundary": boundary, "norm": norm,
                       "mu": mu, "total": total}

    eval_fn.collocation_sums = collocation_sums    # reused by fused_grad.py
    return eval_fn
