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

One-step-relaxed mode (delayed=True): the exact step is two kernels because
the scalar cotangents c = ∂L/∂S need the CURRENT global sums S before the
backward can run — and profiling shows pass 1 is a third of the step at the
MXU/VPU roofline. But the gradient is LINEAR in c (grad = Σ_k c_k ∂S_k/∂θ),
so weighting the backward with the PREVIOUS step's cotangents gives a
descent direction that converges to the same fixed points (at stationarity c
is stationary, so the exact and relaxed gradients coincide), while pass 2
itself emits this step's sums S as extra outputs — making the reported loss
and μ EXACT for the current params with ONE kernel per step. The relaxed vag
is stateful (carries (S_{t−1}, S_{t−2}, step)); fit() threads the state
through its scan carry. Convergence parity with the exact mode is enforced
by tests/test_pallas_grad.py::test_delayed_mode_exact_loss_and_convergence.

Relaxed-mode bias control (round-4 A/B, runs/ab_relaxed_fused): the stale-μ
error in the cotangents adds a spurious gradient term ≈ 2·S₂·(μ_t−μ_{t−1})·
∂μ/∂θ /n — proportional to the PER-STEP sum motion, which is why the plain
relaxed arm drifts basins during the fast early phase of each γ rung. Two
zero-/low-cost correctors:
  • extrapolate=True — cotangents from the linear prediction
    2·S_{t−1} − S_{t−2} ≈ S_t + O(δ²): kills the O(δ) bias with NO extra
    kernel work (the state already holds both past sums).
  • refresh_every=K — every K steps run pass 1 for the current params and
    use its EXACT cotangents (that step is the exact two-pass step);
    amortized cost pass1/K.

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

from gpe_tpu.ops.laplacian import (activation_from_values, activation_quad,
                                   activation_triple)
from gpe_tpu.pallas.fused_residual import (LANES, _pad_params,
                                           kernel_vmem_limit_bytes,
                                           make_pallas_loss_eval)


def grad_kernel_tile_cap(layers: Sequence[int], n_runs: int = 1,
                         budget_bytes: int | None = None) -> int:
    """Largest safe row-tile for the pass-2 gradient kernel, from a
    per-point VMEM model of its resident f32 streams.

    Per hidden layer the kernel stores (σ, σ′, jz×d, lz) plus the derived
    (σ″, σ‴-term, g²) — (6+d) width-streams each; the final layer holds
    (jz×d, lz); the reverse sweep keeps ~(2d+4) live cotangent streams; the
    base-value/Laplacian inputs add 1 (shared) or LANES (per-run packed)
    lanes apiece. Mosaic's scoped-stack allocation exceeds this sum by a
    scheduler-dependent margin: measured width-128/3-hidden/d=2 points are
    16.68 MiB at tile=896 (tanh, 1.09× the 4492-f32 model) and 16.18 MiB at
    tile=784 (shifted_tanh — its σ/σ′/σ″/σ‴ chain keeps more temporaries
    live, 1.205×). We apply 1.28 over the model and budget 96.875% of the
    scope so every registered activation picks with real headroom.

    The budget defaults to the limit the kernels request from Mosaic via
    `CompilerParams(vmem_limit_bytes=...)` (64 MiB — see
    fused_residual.kernel_vmem_limit_bytes; the calibration anchors above
    were measured against Mosaic's 16 MiB default scope before the raise).
    GPE_TPU_SCOPED_VMEM_KIB overrides both together."""
    if budget_bytes is None:
        budget_bytes = kernel_vmem_limit_bytes()
    d = layers[0]
    n_hidden = len(layers) - 2
    W = max(LANES, ((max(layers[1:-1], default=1) + LANES - 1) // LANES)
            * LANES)
    base_w = LANES if n_runs > 1 else 1
    floats = (W * ((6 + d) * n_hidden + (d + 1) + (2 * d + 4))
              + max(d, 8) + 2 + 2 * base_w)
    per_pt = int(floats * 1.28) * 4
    return max(8, (int(budget_bytes * 0.96875) // per_pt) // 8 * 8)


def make_pallas_value_and_grad(layers: Sequence[int], activation: str = "tanh",
                               p: float = 3.0, kinetic: float = 1.0,
                               nonlinearity: str = "abs_power",
                               bc_weight: float = 10.0,
                               norm_weight: float = 20.0,
                               tile: int = 896, sum_tile: int = 1792,
                               interpret: bool = False,
                               compute_dtype=jnp.float32,
                               delayed: bool = False, n_runs: int = 1,
                               refresh_every: int = 0,
                               extrapolate: bool = False,
                               exact_until: int = 0,
                               fresh_values: bool = False):
    """Build vag(params, batch, gamma, scale) -> ((total, aux), grads) with
    the same contract as jax.value_and_grad(make_loss_fn(spec), has_aux=True)
    for a vanilla-ansatz GPESpec. `tile` is the backward row-tile (smaller
    than the eval tile: the backward stores 4 channel arrays per layer in
    VMEM); `sum_tile` is pass 1's tile.
    compute_dtype=bf16 runs every GEMM in both passes at the MXU bf16 rate
    with f32 accumulation — gradients then agree with the f32 XLA path only
    to bf16 precision (~1e-2 relative on small components), so it is opt-in;
    the default keeps exact-parity f32 GEMMs.

    n_runs > 1 trains M independent runs lane-packed into one net
    (pallas/packing.py): params packed block-diagonally, gamma/scale (M,)
    vectors, vag returns per-run (M,) loss/aux and BLOCK-MASKED packed
    gradients (the off-diagonal cross-run blocks are zeroed so packed
    training is exactly M independent runs at the kernel cost of one)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = layers[0]
    assert layers[-1] == 1, "scalar-output nets only"
    M = n_runs
    assert 1 <= M <= LANES // 4, f"n_runs={M} out of range"
    n_layers = len(layers) - 1
    quad = activation_quad(activation)          # registry gate (σ‴ must exist)
    triple = activation_triple(activation)
    from_vals = activation_from_values(activation)
    del quad

    ev = make_pallas_loss_eval(layers, activation, p, kinetic, nonlinearity,
                               bc_weight=bc_weight, norm_weight=norm_weight,
                               tile=sum_tile, interpret=interpret,
                               compute_dtype=compute_dtype, n_runs=n_runs)
    collocation_sums = ev.collocation_sums

    def kernel(scal_ref, x_ref, V_ref, w_ref, bval_ref, blap_ref, *rest):
        wrefs = rest[:2 * n_layers]
        orefs = rest[2 * n_layers:-1] if delayed else rest[2 * n_layers:]
        sums_ref = rest[-1] if delayed else None
        i = pl.program_id(0)
        # per-run scalars (γ, s, c0..c3) broadcast to lane rows — run m's
        # output channel is lane m; scal_ref is (M, 6) in SMEM
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def lane_row(j):
            r = jnp.zeros((1, LANES), jnp.float32)
            for m in range(M):
                r = r + jnp.where(lane_r == m, scal_ref[m, j], 0.0)
            return r

        gamma, scale = lane_row(0), lane_row(1)
        c0, c1, c2, c3 = lane_row(2), lane_row(3), lane_row(4), lane_row(5)
        cast = lambda a: a.astype(compute_dtype)

        T = x_ref.shape[0]
        d_pad = x_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (T, d_pad), 1)

        # ---- forward, storing each hidden layer's (σ, σ′) + pre-activation
        # Jacobian/Laplacian channels. The reverse derives σ″/σ‴
        # ALGEBRAICALLY from the stored values (activation_from_values) — no
        # transcendental recomputes and no recompute GEMMs in the (VPU-bound)
        # reverse sweep.
        v = x_ref[...]
        jac = [(col == k).astype(jnp.float32) for k in range(d)]
        lp = jnp.zeros((T, d_pad), jnp.float32)
        s0s, s1s, jzs, lzs = [], [], [], []
        for li in range(n_layers):
            W = wrefs[2 * li][...]
            b = wrefs[2 * li + 1][...]
            z = jnp.dot(cast(v), W, preferred_element_type=jnp.float32) + b
            jz = [jnp.dot(cast(j), W, preferred_element_type=jnp.float32)
                  for j in jac]
            lz = jnp.dot(cast(lp), W, preferred_element_type=jnp.float32)
            jzs.append(jz)
            lzs.append(lz)
            if li < n_layers - 1:
                s0, s1, s2 = triple(z)
                s0s.append(s0)
                s1s.append(s1)
                g2 = jz[0] * jz[0]
                for j in jz[1:]:
                    g2 = g2 + j * j
                v, jac, lp = s0, [s1 * j for j in jz], s1 * lz + s2 * g2
            else:
                v, lp = z, lz          # final layer is linear

        # derived per-hidden-layer quantities (cheap muls, computed once)
        s2s, s3s, g2s = [], [], []
        for li in range(n_layers - 1):
            s2, s3 = from_vals(s0s[li], s1s[li])
            s2s.append(s2)
            s3s.append(s3)
            g2 = jzs[li][0] * jzs[li][0]
            for j in jzs[li][1:]:
                g2 = g2 + j * j
            g2s.append(g2)

        def layer_inputs(li):
            """(vin, jin, lin) of layer li, from the stored forward state."""
            if li == 0:
                x0 = x_ref[...]
                j0 = [(col == k).astype(jnp.float32) for k in range(d)]
                return x0, j0, jnp.zeros((T, d_pad), jnp.float32)
            k = li - 1
            return (s0s[k], [s1s[k] * j for j in jzs[k]],
                    s1s[k] * lzs[k] + s2s[k] * g2s[k])

        # ---- pointwise cotangents -----------------------------------------
        # full-width (T, LANES) elementwise (same vector registers as (T,1));
        # run m's stream rides lane m, lanes ≥ M carry zero-cotangent garbage
        u = bval_ref[...] + scale * v             # perturbation ansatz: the
        lap = blap_ref[...] + scale * lp          # base is constant (no grads)
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

        if delayed:
            # this step's global sums as extra outputs (the relaxed mode
            # reads them back as the next step's cotangent state AND as the
            # exact loss of the current params); skipped in exact mode —
            # pass 1 already produced them and the packing costs ~10%
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
                sums_ref[...] = sums

            @pl.when(i > 0)
            def _():
                sums_ref[...] = sums_ref[...] + sums

        # ---- reverse sweep ------------------------------------------------
        out_lane = jax.lax.broadcasted_iota(
            jnp.int32, (T, wrefs[2 * (n_layers - 1)].shape[1]), 1)
        # run m's cotangent seeds its own lane (scale/c-rows are already zero
        # on lanes ≥ M, so u_bar/l_bar vanish there; the mask documents it)
        v_bar = jnp.where(out_lane < M, scale * u_bar, 0.0)
        lp_bar = jnp.where(out_lane < M, scale * l_bar, 0.0)
        j_bar = None                   # final layer: Jacobian rows unused

        for li in range(n_layers - 1, -1, -1):
            W = wrefs[2 * li][...]
            vin, jin, lin = layer_inputs(li)
            if li < n_layers - 1:
                jz, lz = jzs[li], lzs[li]
                s1, s2, s3 = s1s[li], s2s[li], s3s[li]
                g2 = g2s[li]
                jj = jz[0] * j_bar[0]
                for k in range(1, d):
                    jj = jj + jz[k] * j_bar[k]
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
        g = jnp.broadcast_to(jnp.asarray(gamma, jnp.float32), (M,))
        s_ = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (M,))
        cs = [jnp.broadcast_to(jnp.asarray(c, jnp.float32), (M,))
              for c in cots]
        scal = jnp.stack([g, s_, *cs], axis=1)        # (M, 6) — row per run

        def base_stream(arr):
            # None/(n,) shared → (n,1) broadcast; per-run (n,M) → padded to
            # (n, LANES) so run m's base rides lane m (see fused_residual)
            if arr is None:
                return jnp.zeros((n, 1), jnp.float32)
            arr = jnp.asarray(arr, jnp.float32)
            if arr.ndim == 1:
                return arr.reshape(-1, 1)
            assert arr.shape == (n, M), (arr.shape, n, M)
            return jnp.zeros((n, LANES), jnp.float32).at[:, :M].set(arr)

        bval = base_stream(base_val)
        blap = base_stream(base_lap)
        in_specs = [
            pl.BlockSpec((M, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
        out_specs, out_shape = [], []
        for W, b in padded:
            out_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct(W.shape, jnp.float32))
            out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        if delayed:
            out_specs.append(pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, LANES), jnp.float32))

        outs = pl.pallas_call(
            kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=kernel_vmem_limit_bytes()),
        )(scal, xp, V.astype(jnp.float32).reshape(-1, 1),
          w.astype(jnp.float32).reshape(-1, 1), bval, blap, *flat)

        grads = []
        for li, (W, b) in enumerate(params):
            fi, fo = W.shape
            grads.append((outs[2 * li][:fi, :fo].astype(W.dtype),
                          outs[2 * li + 1][0, :fo].astype(b.dtype)))
        if not delayed:
            return grads, None
        s = outs[-1]
        if M == 1:
            return grads, (s[0, 0], s[0, 1], s[0, 2], s[0, 3])
        sm = s[0, :4 * M].reshape(M, 4)               # lane 4m+k → [m, k]
        return grads, (sm[:, 0], sm[:, 1], sm[:, 2], sm[:, 3])

    def boundary_term(params, bx, scale, base_bval):
        # unweighted mean(bv²): aux reports it directly (no division by
        # bc_weight, which may legitimately be 0) and the weight is applied
        # to the value/grads at the call site. For packed runs (M > 1) the
        # objective is Σ_m mean(bv_m²) — per-run blocks get their own grads
        # (cross-run blocks are masked with the rest) — with the per-run
        # means returned as aux.
        from gpe_tpu.models import mlp
        bv = mlp.mlp_apply(params, bx, activation) * scale
        if M > 1:
            bb = jnp.asarray(base_bval, jnp.float32)
            # scalar/(B,) shared broadcasts across runs; per-run (B, M) as-is
            bv = bv + (bb.reshape(-1, 1) if bb.ndim == 1 else bb)
            means = jnp.mean(bv * bv, axis=0)             # (M,)
            return jnp.sum(means), means
        m = jnp.mean((base_bval + bv) ** 2)
        return m, m

    boundary_vg = jax.value_and_grad(boundary_term, has_aux=True)

    if M > 1:
        from gpe_tpu.pallas.packing import block_masks
        _masks = block_masks(layers, M)

    def _loss_and_cots(sums, n):
        s0, s1, s2, s3 = sums
        mu = s1 / (s2 + 1e-12)
        pde = (s0 - 2.0 * mu * s1 + mu * mu * s2) / n
        norm = (s3 - 1.0) ** 2
        cots = (jnp.full_like(mu, 1.0 / n), -2.0 * mu / n, mu * mu / n,
                2.0 * norm_weight * (s3 - 1.0))
        return mu, pde, norm, cots

    def _merge(cgrads, bgrads, params):
        leaves = [g for (cw, cb), (bw, bb) in zip(cgrads, bgrads)
                  for g in (cw + bw, cb + bb)]
        tree = jax.tree.unflatten(jax.tree.structure(params), leaves)
        if M > 1:
            # zero the off-diagonal (cross-run) blocks: with them pinned at
            # zero, packed training is exactly M independent runs
            tree = jax.tree.map(lambda g, mk: g * mk, tree, _masks)
        return tree

    def vag(params, batch, gamma, scale, axis_name=None):
        """axis_name (shard_map mesh axis) turns on the psum-aware mode: the
        batch's collocation arrays are LOCAL shards; the four global sums and
        the collocation weight-grad contributions are each reduced with ONE
        `lax.psum` over the axis (the loss factors through the sums, so the
        scalar cotangents need the global S before pass 2 — everything else
        is embarrassingly parallel). Boundary points are replicated, so the
        boundary grads need no collective."""
        x, V, w = batch["x"], batch["V"], batch["w"]
        n = x.shape[0]
        bval = batch.get("base_val")
        blap = batch.get("base_lap")
        bbv = batch.get("base_bval", jnp.float32(0.0))
        sums = collocation_sums(params, x, V, w, gamma, scale, bval, blap)
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        mu, pde, norm, cots = _loss_and_cots(sums, n)
        (_, bmean), bgrads = boundary_vg(params, batch["bx"], scale, bbv)
        bgrads = jax.tree.map(lambda g: bc_weight * g, bgrads)
        total = pde + bc_weight * bmean + norm_weight * norm
        aux = {"pde": pde, "boundary": bmean, "norm": norm,
               "mu": mu, "total": total}
        cgrads, _ = collocation_grads(params, x, V, w, gamma, scale, cots,
                                      bval, blap)
        if axis_name is not None:
            cgrads = jax.lax.psum(cgrads, axis_name)
        return (total, aux), _merge(cgrads, bgrads, params)

    vag.psum_aware = True
    if not delayed:
        return vag

    def _value_sums(params, x, w, scale, base_val):
        """Fresh (S₂, S₃) = (Σu², Σu²w) from a value-only XLA forward — no
        Jacobian/Laplacian channels, so ~5% of the fused kernel's FLOPs.
        Rationale (round-4 A/B, runs/ab_relaxed_fused): the relaxed mode's
        γ≥10 bias is NOT accumulated drift (refresh_every K=8 barely moved
        it) but a delay-induced feedback instability, dominated by the norm
        cotangent c₃ = 2λ(S₃−1), whose SIGN flips as S₃ crosses 1 — a
        one-step-stale sign pushes outward half of every oscillation. S₂/S₃
        need only u (not Hu), so they can be exact every step at negligible
        cost; only the Laplacian-heavy S₀/S₁ stay relaxed."""
        from gpe_tpu.models.mlp import mlp_apply

        v = mlp_apply(params, x, activation)         # (N,) or (N, M)
        if M > 1:
            u = v.reshape(-1, M) * jnp.reshape(scale, (1, M))
            if base_val is not None:
                b = jnp.asarray(base_val, jnp.float32)
                u = u + (b.reshape(-1, 1) if b.ndim == 1 else b)
            ww = jnp.reshape(w, (-1, 1))
            return jnp.sum(u * u, axis=0), jnp.sum(u * u * ww, axis=0)
        u = scale * v
        if base_val is not None:
            u = u + jnp.asarray(base_val, jnp.float32).reshape(-1)
        return jnp.sum(u * u), jnp.sum(u * u * jnp.reshape(w, (-1,)))

    def init_state(params, batch, gamma, scale, axis_name=None):
        """Exact sums of the INITIAL params — the first step's cotangent
        weights (one pass-1 kernel, once per fit). Under shard_map the state
        holds the GLOBAL (psum-reduced) sums, replicated on every shard.
        State = (S_{t−1}, S_{t−2}, step); both histories start at the exact
        initial sums so step 0's cotangents are exact with or without
        extrapolation."""
        sums = collocation_sums(
            params, batch["x"], batch["V"], batch["w"], gamma, scale,
            batch.get("base_val"), batch.get("base_lap"))
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
        s = jnp.stack(sums)
        return (s, s, jnp.zeros((), jnp.int32))

    def vag_relaxed(params, batch, gamma, scale, state, axis_name=None):
        x, V, w = batch["x"], batch["V"], batch["w"]
        n = x.shape[0]
        if axis_name is not None:
            n = n * jax.lax.psum(1, axis_name)
        bval = batch.get("base_val")
        blap = batch.get("base_lap")
        bbv = batch.get("base_bval", jnp.float32(0.0))
        # state carries GLOBAL sums (psum'd at the previous step), so the
        # cotangents are identical on every shard
        sums_prev, sums_prev2, step = state
        if extrapolate:
            # linear prediction S_t ≈ 2·S_{t−1} − S_{t−2}: O(δ²) cotangent
            # bias instead of O(δ), no extra kernel work
            sums_cot = 2.0 * sums_prev - sums_prev2
        else:
            sums_cot = sums_prev
        if refresh_every or exact_until:
            # exact two-pass step when selected: pass 1 under the cond runs
            # only then; the psum stays OUTSIDE the cond (uniform collective
            # under shard_map), reducing zeros otherwise.
            # exact_until=E runs a contiguous exact PREFIX — the fast early
            # phase of a rung, where the per-step sum motion (and hence the
            # relaxed-cotangent bias) is large; refresh_every=K adds
            # periodic exact steps after that.
            do = (step > 0) & (step < exact_until)
            if refresh_every:
                do = do | (((step % refresh_every) == 0) & (step > 0))
            fresh = jax.lax.cond(
                do,
                lambda _: jnp.stack(collocation_sums(
                    params, x, V, w, gamma, scale, bval, blap)),
                lambda _: jnp.zeros_like(sums_prev), None)
            if axis_name is not None:
                fresh = jax.lax.psum(fresh, axis_name)
            sums_cot = jnp.where(do, fresh, sums_cot)
        if fresh_values:
            s2f, s3f = _value_sums(params, x, w, scale, bval)
            fresh23 = jnp.stack([s2f, s3f])
            if axis_name is not None:
                fresh23 = jax.lax.psum(fresh23, axis_name)
            sums_cot = jnp.concatenate([sums_cot[:2], fresh23])
        _, _, _, cots_prev = _loss_and_cots(
            (sums_cot[0], sums_cot[1], sums_cot[2], sums_cot[3]), n)
        cgrads, sums_new = collocation_grads(params, x, V, w, gamma, scale,
                                             cots_prev, bval, blap)
        if axis_name is not None:
            cgrads = jax.lax.psum(cgrads, axis_name)
            sums_new = jax.lax.psum(sums_new, axis_name)
        mu, pde, norm, _ = _loss_and_cots(sums_new, n)   # EXACT current loss
        (_, bmean), bgrads = boundary_vg(params, batch["bx"], scale, bbv)
        bgrads = jax.tree.map(lambda g: bc_weight * g, bgrads)
        total = pde + bc_weight * bmean + norm_weight * norm
        aux = {"pde": pde, "boundary": bmean, "norm": norm,
               "mu": mu, "total": total}
        return ((total, aux), _merge(cgrads, bgrads, params),
                (jnp.stack(sums_new), sums_prev, step + 1))

    vag_relaxed.stateful = True
    vag_relaxed.psum_aware = True
    vag_relaxed.init_state = init_state
    return vag_relaxed
