"""Fused GPE training gradient (Pallas/TPU): value_and_grad in two kernels.

Training is the wall-clock bottleneck of every experiment: reverse-mode over
the forward-Laplacian eval in XLA runs ~6× slower than the fused eval kernel
(the stored (T, width) intermediates make the backward HBM-bound). The loss,
however, has a special structure: it depends on the collocation points ONLY
through four global sums

    S = (Σ (Hu)²,  Σ u·Hu,  Σ u²,  Σ u²·w),
    L_colloc = (S₀ − S₁²/S₂)/N + norm_weight·(S₃ − 1)²      (μ = S₁/S₂),

so ∂L/∂S is four SCALARS. The exact parameter gradient therefore factors into
two fused passes, both VMEM-resident:

  pass 1 — the existing sums kernel (fused_residual.py) → S, total, aux, and
           the scalar cotangents c = ∂L/∂S (μ-dependence handled exactly via
           the S₁²/S₂ form);
  pass 2 — a recompute-and-reverse kernel: per row-tile it re-runs the
           forward-Laplacian recursion storing each hidden layer's
           PRE-ACTIVATION channel state (z, d Jacobian rows jz, Laplacian
           lz) — the reverse sweep recovers the layer INPUTS from the
           previous layer's stored pre-activations with elementwise σ
           evaluations instead of re-running the C GEMMs per layer the
           earlier input-storing variant needed — then forms the pointwise
           cotangents
               h̄u = 2c₀·Hu + c₁·u,
               ū  = c₁·Hu + 2c₂·u + 2c₃·w·u + h̄u·(V + γ·∂ₙₗ),
               l̄  = −kinetic·h̄u,
           and reverses the chain. The Laplacian channel carries σ″, so the
           reverse sweep needs σ‴ (ops/laplacian.py:activation_quad):
               z̄   = σ′·v̄ + σ″·Σᵢ jzᵢ·j̄ᵢ + (σ″·lz + σ‴·Σᵢ jzᵢ²)·l̄p
               jz̄ᵢ = σ′·j̄ᵢ + 2σ″·jzᵢ·l̄p
               lz̄  = σ′·l̄p
           and per layer  W̄ += v₀ᵀz̄ + Σᵢ j₀ᵢᵀjz̄ᵢ + l₀ᵀlz̄,  b̄ += Σ_rows z̄,
           with cotangents propagated through Wᵀ. Weight-gradient tiles
           accumulate across the (sequential) grid in the kernel outputs.

The tiny boundary term (bc_weight·mean((scale·net(bx))²)) is differentiated
by plain XLA and added. Exact-gradient parity with
jax.grad(make_loss_fn(spec)) is enforced by tests/test_pallas_grad.py.

Scope: vanilla (u = scale·net(x)) AND perturbation (u = base + scale·net(x))
ansätze — the base (value, Laplacian) streams enter as constant per-point
inputs (`base_val`/`base_lap` below), so PL-PINN training runs fused too.
Scalar-output MLP, activations with a registered σ‴ (tanh family, sin).
Reference analog: none — the reference trains with torch autograd
(SURVEY.md §3 hot spots); this kernel is the TPU-native speed-of-light
replacement for the training hot path.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from gpe_tpu.ops.laplacian import activation_quad
from gpe_tpu.pallas.fused_residual import (LANES, _pad_params,
                                           make_pallas_loss_eval)


def make_pallas_value_and_grad(layers: Sequence[int], activation: str = "tanh",
                               p: float = 3.0, kinetic: float = 1.0,
                               nonlinearity: str = "abs_power",
                               bc_weight: float = 10.0,
                               norm_weight: float = 20.0,
                               tile: int = 896, sum_tile: int = 1792,
                               interpret: bool = False,
                               compute_dtype=jnp.float32):
    """Build vag(params, batch, gamma, scale) -> ((total, aux), grads) with
    the same contract as jax.value_and_grad(make_loss_fn(spec), has_aux=True)
    for a vanilla-ansatz GPESpec. `tile` is the backward row-tile (smaller
    than the eval tile: the backward stores 4 channel arrays per layer in
    VMEM); `sum_tile` is pass 1's tile.
    compute_dtype=bf16 runs every GEMM in both passes at the MXU bf16 rate
    with f32 accumulation — gradients then agree with the f32 XLA path only
    to bf16 precision (~1e-2 relative on small components), so it is opt-in;
    the default keeps exact-parity f32 GEMMs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = layers[0]
    assert layers[-1] == 1, "scalar-output nets only"
    n_layers = len(layers) - 1
    quad = activation_quad(activation)

    ev = make_pallas_loss_eval(layers, activation, p, kinetic, nonlinearity,
                               bc_weight=bc_weight, norm_weight=norm_weight,
                               tile=sum_tile, interpret=interpret,
                               compute_dtype=compute_dtype)
    collocation_sums = ev.collocation_sums

    def kernel(scal_ref, x_ref, V_ref, w_ref, bval_ref, blap_ref, *rest):
        wrefs = rest[:2 * n_layers]
        orefs = rest[2 * n_layers:]
        i = pl.program_id(0)
        gamma, scale = scal_ref[0, 0], scal_ref[0, 1]
        c0, c1 = scal_ref[0, 2], scal_ref[0, 3]
        c2, c3 = scal_ref[0, 4], scal_ref[0, 5]
        cast = lambda a: a.astype(compute_dtype)

        T = x_ref.shape[0]
        d_pad = x_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (T, d_pad), 1)

        # ---- forward, storing each hidden layer's PRE-ACTIVATION state ----
        # (z, jz rows, lz). The reverse sweep recovers layer inputs from the
        # previous layer's stored pre-activations with elementwise σ evals —
        # no recompute GEMMs.
        v = x_ref[...]
        jac = [(col == k).astype(jnp.float32) for k in range(d)]
        lp = jnp.zeros((T, d_pad), jnp.float32)
        zs, jzs, lzs = [], [], []
        for li in range(n_layers):
            W = wrefs[2 * li][...]
            b = wrefs[2 * li + 1][...]
            z = jnp.dot(cast(v), W, preferred_element_type=jnp.float32) + b
            jz = [jnp.dot(cast(j), W, preferred_element_type=jnp.float32)
                  for j in jac]
            lz = jnp.dot(cast(lp), W, preferred_element_type=jnp.float32)
            zs.append(z)
            jzs.append(jz)
            lzs.append(lz)
            if li < n_layers - 1:
                s0, s1, s2, _ = quad(z)
                g2 = jz[0] * jz[0]
                for j in jz[1:]:
                    g2 = g2 + j * j
                v, jac, lp = s0, [s1 * j for j in jz], s1 * lz + s2 * g2
            else:
                v, lp = z, lz          # final layer is linear

        def layer_inputs(li):
            """(vin, jin, lin) of layer li, from stored pre-activations."""
            if li == 0:
                x0 = x_ref[...]
                j0 = [(col == k).astype(jnp.float32) for k in range(d)]
                return x0, j0, jnp.zeros((T, d_pad), jnp.float32)
            zp, jzp, lzp = zs[li - 1], jzs[li - 1], lzs[li - 1]
            s0, s1, s2, _ = quad(zp)
            g2 = jzp[0] * jzp[0]
            for j in jzp[1:]:
                g2 = g2 + j * j
            return s0, [s1 * j for j in jzp], s1 * lzp + s2 * g2

        # ---- pointwise cotangents -----------------------------------------
        u = bval_ref[...] + scale * v[:, 0:1]     # perturbation ansatz: the
        lap = blap_ref[...] + scale * lp[:, 0:1]  # base is constant (no grads)
        V = V_ref[...]
        w = w_ref[...]
        au = jnp.abs(u)
        if nonlinearity == "power":
            nl, dnl = gamma * u ** p, gamma * p * u ** (p - 1.0)
        else:
            nl = gamma * au ** (p - 1.0) * u
            dnl = gamma * p * au ** (p - 1.0)
        hu = -kinetic * lap + V * u + nl
        hu_bar = 2.0 * c0 * hu + c1 * u
        u_bar = c1 * hu + 2.0 * c2 * u + 2.0 * c3 * w * u + hu_bar * (V + dnl)
        l_bar = -kinetic * hu_bar

        # ---- reverse sweep ------------------------------------------------
        out_lane = jax.lax.broadcasted_iota(
            jnp.int32, (T, wrefs[2 * (n_layers - 1)].shape[1]), 1)
        v_bar = jnp.where(out_lane == 0, scale * u_bar, 0.0)
        lp_bar = jnp.where(out_lane == 0, scale * l_bar, 0.0)
        j_bar = None                   # final layer: Jacobian rows unused

        for li in range(n_layers - 1, -1, -1):
            W = wrefs[2 * li][...]
            vin, jin, lin = layer_inputs(li)
            if li < n_layers - 1:
                z, jz, lz = zs[li], jzs[li], lzs[li]
                _, s1, s2, s3 = quad(z)
                jj = jz[0] * j_bar[0]
                g2 = jz[0] * jz[0]
                for k in range(1, d):
                    jj = jj + jz[k] * j_bar[k]
                    g2 = g2 + jz[k] * jz[k]
                z_bar = s1 * v_bar + s2 * jj + (s2 * lz + s3 * g2) * lp_bar
                jz_bar = [s1 * j_bar[k] + 2.0 * s2 * jz[k] * lp_bar
                          for k in range(d)]
                lz_bar = s1 * lp_bar
            else:
                z_bar, lz_bar = v_bar, lp_bar
                jz_bar = None

            cT = lambda a, b_: jax.lax.dot_general(
                cast(a), cast(b_), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dW = cT(vin, z_bar) + cT(lin, lz_bar)
            if jz_bar is not None:
                for k in range(d):
                    dW = dW + cT(jin[k], jz_bar[k])
            db = jnp.sum(z_bar, axis=0, keepdims=True)

            oW, ob = orefs[2 * li], orefs[2 * li + 1]

            @pl.when(i == 0)
            def _(oW=oW, ob=ob, dW=dW, db=db):
                oW[...] = dW
                ob[...] = db

            @pl.when(i > 0)
            def _(oW=oW, ob=ob, dW=dW, db=db):
                oW[...] = oW[...] + dW
                ob[...] = ob[...] + db

            if li > 0:
                bT = lambda a: jax.lax.dot_general(
                    cast(a), W, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                v_bar = bT(z_bar)
                lp_bar = bT(lz_bar)
                j_bar = ([bT(jb) for jb in jz_bar] if jz_bar is not None
                         else [jnp.zeros_like(v_bar) for _ in range(d)])

    def collocation_grads(params, x, V, w, gamma, scale, cots,
                          base_val=None, base_lap=None):
        n = x.shape[0]
        assert n % tile == 0, \
            f"collocation count {n} must be divisible by grad tile={tile}"
        grid = n // tile
        xp = jnp.zeros((n, max(d, 8)), jnp.float32).at[:, :d].set(
            x.astype(jnp.float32))
        padded = _pad_params(params)
        flat = []
        for W, b in padded:
            flat.extend([W, b.reshape(1, -1)])
        scal = jnp.stack([jnp.float32(gamma), jnp.float32(scale),
                          *[c.astype(jnp.float32) for c in cots]]).reshape(1, 6)

        bval = (jnp.zeros((n, 1), jnp.float32) if base_val is None
                else base_val.astype(jnp.float32).reshape(-1, 1))
        blap = (jnp.zeros((n, 1), jnp.float32) if base_lap is None
                else base_lap.astype(jnp.float32).reshape(-1, 1))
        in_specs = [
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, max(d, 8)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for a in flat]
        out_specs, out_shape = [], []
        for W, b in padded:
            out_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(W.shape, jnp.float32))
            out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))

        outs = pl.pallas_call(
            kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(scal, xp, V.astype(jnp.float32).reshape(-1, 1),
          w.astype(jnp.float32).reshape(-1, 1), bval, blap, *flat)

        grads = []
        for li, (W, b) in enumerate(params):
            fi, fo = W.shape
            grads.append((outs[2 * li][:fi, :fo].astype(W.dtype),
                          outs[2 * li + 1][0, :fo].astype(b.dtype)))
        return grads

    def boundary_term(params, bx, scale, base_bval):
        # unweighted mean(bv²): aux reports it directly (no division by
        # bc_weight, which may legitimately be 0) and the weight is applied
        # to the value/grads at the call site
        from gpe_tpu.models import mlp
        bv = base_bval + mlp.mlp_apply(params, bx, activation) * scale
        return jnp.mean(bv * bv)

    boundary_vg = jax.value_and_grad(boundary_term)

    def vag(params, batch, gamma, scale):
        x, V, w = batch["x"], batch["V"], batch["w"]
        n = x.shape[0]
        bval = batch.get("base_val")
        blap = batch.get("base_lap")
        bbv = batch.get("base_bval", jnp.float32(0.0))
        s0, s1, s2, s3 = collocation_sums(params, x, V, w, gamma, scale,
                                          bval, blap)
        mu = s1 / (s2 + 1e-12)
        pde = (s0 - 2.0 * mu * s1 + mu * mu * s2) / n
        norm = (s3 - 1.0) ** 2
        bmean, bgrads = boundary_vg(params, batch["bx"], scale, bbv)
        bgrads = jax.tree.map(lambda g: bc_weight * g, bgrads)
        total = pde + bc_weight * bmean + norm_weight * norm
        aux = {"pde": pde, "boundary": bmean, "norm": norm,
               "mu": mu, "total": total}
        cots = (jnp.float32(1.0 / n), -2.0 * mu / n, mu * mu / n,
                2.0 * norm_weight * (s3 - 1.0))
        cgrads = collocation_grads(params, x, V, w, gamma, scale, cots,
                                   bval, blap)
        leaves = [g for (cw, cb), (bw, bb) in zip(cgrads, bgrads)
                  for g in (cw + bw, cb + bb)]
        grads = jax.tree.unflatten(jax.tree.structure(params), leaves)
        return (total, aux), grads

    return vag
