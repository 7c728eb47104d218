"""Channel-blocked ("rowcat") variant of the fused GPE loss-eval kernel.

The production kernel (`fused_residual.py`) runs C = d+2 SEPARATE
(T,128)x(128,128) GEMMs per layer — one per forward-Laplacian channel
(value, d Jacobian rows, Laplacian) — because Mosaic rejects concatenating
the channel REGISTER arrays into one (C·T, 128) operand (a vector-layout
offset change, `fused_residual.py:27-32`).

This module measures the one restructuring VERDICT r4 left untried
(weak #7): block the channels into the SUBLANE (row) dimension via a VMEM
scratch buffer instead of a register concat. The channel state lives in a
(C·T, 128) scratch ref; each layer is then ONE (C·T,128)x(128,128) GEMM,
and the channel-specific elementwise recursion reads/writes the scratch at
static row offsets (plain sliced ref loads/stores — no register-layout
change, no scatter). MXU FLOPs are identical; what changes is GEMM count
(1 vs C per layer: longer MXU pipeline, fewer fixed overheads) against an
explicit VMEM round-trip per layer that the register version leaves to
Mosaic's implicit spilling.

Scope: M=1 scalar path, hidden widths <= 128 (the bench headline shape
[2,128,128,128,1]); perturbation base streams supported like the
production kernel. Parity-tested against train.make_loss_fn in interpret
mode (tests/test_pallas.py); measured on-chip by
benchmarks/probe_rowcat_eval.py. The production default only flips if the
measurement says so — see runs/bench_r5/rowcat.json.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from gpe_tpu.ops.laplacian import activation_triple
from gpe_tpu.pallas.fused_residual import (LANES, _pad_params,
                                           kernel_vmem_limit_bytes)


def make_rowcat_loss_eval(layers: Sequence[int], activation: str = "tanh",
                          p: float = 3.0, kinetic: float = 1.0,
                          nonlinearity: str = "abs_power",
                          bc_weight: float = 10.0, norm_weight: float = 20.0,
                          tile: int = 1792, interpret: bool = False,
                          compute_dtype=jnp.float32):
    """eval_fn(params, batch, gamma, scale) -> (total, aux); channel-blocked
    single-GEMM-per-layer kernel. Same contract as
    fused_residual.make_pallas_loss_eval at n_runs=1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = layers[0]
    assert layers[-1] == 1, "scalar-output nets only"
    n_layers = len(layers) - 1
    assert n_layers >= 2, "rowcat kernel needs at least one hidden layer"
    assert all(h <= LANES for h in layers[1:-1]), (
        "rowcat scratch is one lane-tile wide: hidden widths must be <= 128")
    act = activation_triple(activation)
    C = d + 2                            # value + d jacobian rows + laplacian

    def kernel(gamma_ref, scale_ref, x_ref, V_ref, w_ref, bval_ref, blap_ref,
               *rest):
        wrefs = rest[:-3]
        out_ref, st, st2 = rest[-3], rest[-2], rest[-1]
        i = pl.program_id(0)
        T = x_ref.shape[0]
        d_pad = x_ref.shape[1]
        cast = lambda a: a.astype(compute_dtype)

        # ---- layer 0: separate small (T, d_pad) dots (padding the input to
        # 128 lanes would add a full GEMM-layer of wasted MXU work), then the
        # post-activation channel state is stored into the scratch blocks.
        col = jax.lax.broadcasted_iota(jnp.int32, (T, d_pad), 1)
        W0 = wrefs[0][...]
        b0 = wrefs[1][...]
        v = jnp.dot(cast(x_ref[...]), W0,
                    preferred_element_type=jnp.float32) + b0
        jac = [jnp.dot(cast((col == k).astype(jnp.float32)), W0,
                       preferred_element_type=jnp.float32) for k in range(d)]
        # input Laplacian stream is zero -> after the linear layer it is
        # still zero; only the activation's d2*g2 term creates it
        val, d1, d2 = act(v)
        g2 = jac[0] * jac[0]
        for j in jac[1:]:
            g2 = g2 + j * j
        st[pl.ds(0, T), :] = val
        for k in range(d):
            st[pl.ds((1 + k) * T, T), :] = d1 * jac[k]
        st[pl.ds((1 + d) * T, T), :] = d2 * g2

        # ---- hidden layers: ONE (C*T,128)x(128,128) GEMM, then the
        # channel recursion via static-offset scratch loads/stores
        for li in range(1, n_layers - 1):
            W = wrefs[2 * li][...]
            b = wrefs[2 * li + 1][...]
            st2[...] = jnp.dot(cast(st[...]), W,
                               preferred_element_type=jnp.float32)
            yv = st2[pl.ds(0, T), :] + b        # bias feeds the value channel only
            val, d1, d2 = act(yv)
            g2 = jnp.zeros((T, LANES), jnp.float32)
            yj = []
            for k in range(d):
                jk = st2[pl.ds((1 + k) * T, T), :]
                yj.append(jk)
                g2 = g2 + jk * jk
            ylp = st2[pl.ds((1 + d) * T, T), :]
            st[pl.ds(0, T), :] = val
            for k in range(d):
                st[pl.ds((1 + k) * T, T), :] = d1 * yj[k]
            st[pl.ds((1 + d) * T, T), :] = d1 * ylp + d2 * g2

        # ---- output layer (width 1, zero-padded to 128 lanes)
        W = wrefs[2 * (n_layers - 1)][...]
        b = wrefs[2 * (n_layers - 1) + 1][...]
        st2[...] = jnp.dot(cast(st[...]), W,
                           preferred_element_type=jnp.float32)
        v = st2[pl.ds(0, T), :] + b
        lp = st2[pl.ds((1 + d) * T, T), :]

        # ---- Hamiltonian + masked lane-0 reduction (M=1 path of the
        # production kernel)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        gamma = jnp.where(lane_r == 0, gamma_ref[0, 0], 0.0)
        scale = jnp.where(lane_r == 0, scale_ref[0, 0], 0.0)
        u = bval_ref[...] + scale * v
        lap = blap_ref[...] + scale * lp
        V = V_ref[...]
        w = w_ref[...]
        if nonlinearity == "power":
            nl = gamma * u**p
        else:
            nl = gamma * jnp.abs(u) ** (p - 1.0) * u
        hu = -kinetic * lap + V * u + nl

        T_lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
        streams = (hu * hu, u * hu, u * u, u * u * w)
        sums = jnp.zeros((1, LANES), jnp.float32)
        for k, arr in enumerate(streams):
            s = jnp.sum(jnp.where(T_lane == 0, arr, 0.0))
            sums = sums + jnp.where(lane_r == k, s, 0.0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = sums

        @pl.when(i > 0)
        def _():
            out_ref[...] = out_ref[...] + sums

    def _base_stream(arr, n):
        if arr is None:
            return jnp.zeros((n, 1), jnp.float32)
        return jnp.asarray(arr, jnp.float32).reshape(-1, 1)

    def collocation_sums(params, x, V, w, gamma, scale,
                         base_val=None, base_lap=None):
        n = x.shape[0]
        assert n % tile == 0, (
            f"collocation count {n} must be divisible by tile={tile}")
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
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, max(d, 8)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for a in flat]

        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((C * tile, LANES), jnp.float32),
                            pltpu.VMEM((C * tile, LANES), jnp.float32)],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=kernel_vmem_limit_bytes()),
        )(jnp.reshape(jnp.asarray(gamma, jnp.float32), (1, 1)),
          jnp.reshape(jnp.asarray(scale, jnp.float32), (1, 1)),
          xp, V.astype(jnp.float32).reshape(-1, 1),
          w.astype(jnp.float32).reshape(-1, 1), bval, blap, *flat)
        return out[0, 0], out[0, 1], out[0, 2], out[0, 3]

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
        if "base_bval" in batch:
            bv = jnp.asarray(batch["base_bval"]) + bv
        boundary = jnp.mean(bv * bv)
        total = pde + bc_weight * boundary + norm_weight * norm
        return total, {"pde": pde, "boundary": boundary, "norm": norm,
                       "mu": mu, "total": total}

    eval_fn.collocation_sums = collocation_sums
    return eval_fn
