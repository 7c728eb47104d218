"""Helmholtz 2D solvers — capability parity with the reference's Helmholtz
family (SURVEY.md §2: A13 exact solutions, B7 learnable-k PINN, B8 plain PINN;
src/helmholtz_2D.py, src/helmholtz_2D_circle*.py,
Notebooks/Helmholtz/Helmholtz_learnable_k_and_bc.ipynb).

Problems:
- square [0,π]²: Δu + k²u = q with the manufactured solution
  u* = sin(ax)sin(by) (reference forcing q = k²·u*, helmholtz_2D.py:375-377 —
  supported via `forcing="reference"`; `forcing="manufactured"` uses the
  consistent q = Δu* + k²u* so u* solves the PDE exactly).
- circle r<R: Δu + k²u = 0 with Bessel boundary data u = Jₙ(kR)cos(nθ)
  (exact interior solution Jₙ(kr)cos(nθ); scipy Bessel evaluated host-side
  into data arrays).
- inverse problem: k (and an adaptive BC weight) as TRAINABLE parameters
  recovering the wavenumber from solution data (B7) — k enters the loss as a
  leaf of the params pytree, so the same jitted step trains net and physics
  jointly.

TPU design: single forward-Laplacian pass feeds the PDE residual; boundary/
data terms reuse the cheap value-only path; everything runs in the same
chunked-scan `fit` loop as the GPE trainers.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.train.loop import fit


@dataclass(frozen=True)
class HelmholtzSpec:
    domain: str = "square"            # "square" | "circle"
    k: float = 2.0                    # wavenumber (init value when learnable)
    learnable_k: bool = False
    learnable_bc_scale: bool = False  # B7's adaptive_bc_scale = nn.Parameter(10.)
    bc_weight: float = 10.0
    data_weight: float = 1.0
    layers: tuple = (2, 64, 64, 64, 1)
    activation: str = "tanh"
    init_scheme: str = "xavier_uniform"  # "siren" pairs with activation="sin"
    w0: float = 6.0                      # siren first-layer frequency reach
    n_interior: int = 4096
    n_boundary: int = 256
    mode_n: int = 0                   # circle: angular order of the Bessel mode
    radius: float = 1.0
    ab: tuple = (1.0, 1.0)            # square manufactured u* = sin(ax)sin(by)
    forcing: str = "manufactured"     # or "reference" (q = k²·u*)
    lb: float = 0.0
    ub: float = math.pi
    dtype: any = jnp.float32


def square_exact(spec: HelmholtzSpec, xy):
    """u* = sin(ax)sin(by) on [0,π]² (reference usol, helmholtz_2D.py:390)."""
    a, b = spec.ab
    return jnp.sin(a * xy[:, 0]) * jnp.sin(b * xy[:, 1])


def circle_exact(spec: HelmholtzSpec, xy):
    """u* = Jₙ(k·r)·cos(nθ) — exact Helmholtz solution in the disk
    (helmholtz_2D_circle_3.py:225-243). scipy Bessel on host."""
    from scipy.special import jn
    xy = np.asarray(xy)
    r = np.sqrt(xy[:, 0] ** 2 + xy[:, 1] ** 2)
    th = np.arctan2(xy[:, 1], xy[:, 0])
    return jnp.asarray(jn(spec.mode_n, spec.k * r) * np.cos(spec.mode_n * th))


def make_helmholtz_batch(spec: HelmholtzSpec, seed: int = 0) -> dict:
    """Interior collocation + boundary points + data values (with the
    reference's 80/20 boundary train/test split, helmholtz_2D.py:399-403)."""
    rng = np.random.default_rng(seed)
    if spec.domain == "square":
        lo, hi = spec.lb, spec.ub
        x = rng.uniform(lo, hi, (spec.n_interior, 2)).astype(np.float32)
        t = rng.uniform(lo, hi, (spec.n_boundary,)).astype(np.float32)
        sides = np.concatenate([
            np.stack([t, np.full_like(t, lo)], -1),
            np.stack([t, np.full_like(t, hi)], -1),
            np.stack([np.full_like(t, lo), t], -1),
            np.stack([np.full_like(t, hi), t], -1)], axis=0)
        bx = sides.astype(np.float32)
        exact = square_exact(spec, jnp.asarray(bx))
        u_exact_interior = square_exact(spec, jnp.asarray(x))
    elif spec.domain == "circle":
        r = spec.radius * np.sqrt(rng.uniform(0, 1, (spec.n_interior,)))
        th = rng.uniform(0, 2 * np.pi, (spec.n_interior,))
        x = np.stack([r * np.cos(th), r * np.sin(th)], -1).astype(np.float32)
        tb = rng.uniform(0, 2 * np.pi, (spec.n_boundary * 4,))
        bx = (spec.radius * np.stack([np.cos(tb), np.sin(tb)], -1)).astype(np.float32)
        exact = circle_exact(spec, bx)
        u_exact_interior = circle_exact(spec, x)
    else:
        raise ValueError(f"unknown domain {spec.domain!r}")

    n_b = bx.shape[0]
    split = int(0.8 * n_b)
    perm = rng.permutation(n_b)
    return {
        "x": jnp.asarray(x),
        "bx": jnp.asarray(bx[perm[:split]]),
        "bu": jnp.asarray(np.asarray(exact)[perm[:split]]),
        "bx_test": jnp.asarray(bx[perm[split:]]),
        "bu_test": jnp.asarray(np.asarray(exact)[perm[split:]]),
        "u_exact": jnp.asarray(u_exact_interior),
    }


def init_helmholtz_params(spec: HelmholtzSpec, seed: int = 0):
    net = mlp.init_mlp(jax.random.PRNGKey(seed), spec.layers,
                       scheme=spec.init_scheme, w0=spec.w0)
    params = {"net": net}
    if spec.learnable_k:
        params["k_raw"] = jnp.asarray(spec.k, jnp.float32)
    if spec.learnable_bc_scale:
        params["bc_scale"] = jnp.asarray(10.0, jnp.float32)
    return params


def make_helmholtz_loss(spec: HelmholtzSpec):
    """loss_fn(params, batch, k_override, scale) -> (total, aux) — the second
    traced scalar slot carries k for fixed-k sweeps; ignored when learnable."""
    a, b = spec.ab

    def loss_fn(params, batch, k_in, scale, axis_name=None):
        k = params["k_raw"] if spec.learnable_k else k_in
        # The forcing is DATA: it is generated by the true wavenumber spec.k,
        # never by the trainable k — otherwise the inverse problem is
        # unidentifiable (any k satisfies the residual at u = u*).
        k_data = spec.k
        n = mlp.mlp_vgl(params["net"], batch["x"], spec.activation)
        if spec.domain == "square":
            ustar = jnp.sin(a * batch["x"][:, 0]) * jnp.sin(b * batch["x"][:, 1])
            if spec.forcing == "reference":
                q = k_data * k_data * ustar
            else:
                q = (k_data * k_data - (a * a + b * b)) * ustar
        else:
            q = 0.0
        r = n.lap + k * k * n.value - q
        pde = jnp.mean(r * r)

        ub_pred = mlp.mlp_apply(params["net"], batch["bx"], spec.activation)
        bc = jnp.mean((ub_pred - batch["bu"]) ** 2)
        bc_w = params.get("bc_scale", spec.bc_weight) if isinstance(params, dict) else spec.bc_weight
        if spec.learnable_bc_scale and "bc_scale" in params:
            # The reference trains bc_scale by plain descent on bc_scale·MSE,
            # which is unbounded below (bc_scale → −∞). Keep the value but
            # flip its gradient (2·sg(w)−w): the weight ASCENDS toward the
            # hardest constraint — SA-PINN min-max semantics.
            bc_w = 2.0 * jax.lax.stop_gradient(bc_w) - bc_w

        data = jnp.mean((n.value - batch["u_exact"]) ** 2) if spec.learnable_k else 0.0

        total = pde + bc_w * bc + spec.data_weight * data
        aux = {"pde": pde, "boundary": bc, "data": data, "k": k, "mu": k,
               "total": total}
        return total, aux

    return loss_fn


def make_helmholtz_residual_fn(spec: HelmholtzSpec):
    """Flat residual vector whose sum of squares equals the (fixed-weight)
    training loss — feeds train.gauss_newton.make_lm_solver for the
    second-order polish. For the inverse problem the data residuals are
    included, so LM refines the trainable k jointly with the net (the
    learnable bc_scale, if present, has zero Jacobian here and stays put)."""
    a, b = spec.ab

    def rfn(params, batch, k_in, scale):
        k = params["k_raw"] if spec.learnable_k else k_in
        k_data = spec.k
        n = mlp.mlp_vgl(params["net"], batch["x"], spec.activation)
        if spec.domain == "square":
            ustar = jnp.sin(a * batch["x"][:, 0]) * jnp.sin(b * batch["x"][:, 1])
            if spec.forcing == "reference":
                q = k_data * k_data * ustar
            else:
                q = (k_data * k_data - (a * a + b * b)) * ustar
        else:
            q = 0.0
        r_pde = (n.lap + k * k * n.value - q) / jnp.sqrt(1.0 * n.value.shape[0])
        ub_pred = mlp.mlp_apply(params["net"], batch["bx"], spec.activation)
        r_bc = jnp.sqrt(spec.bc_weight / batch["bx"].shape[0]) * (
            ub_pred - batch["bu"])
        parts = [r_pde.ravel(), r_bc.ravel()]
        if spec.learnable_k:
            r_d = jnp.sqrt(spec.data_weight / n.value.shape[0]) * (
                n.value - batch["u_exact"])
            parts.append(r_d.ravel())
        return jnp.concatenate(parts)

    return rfn


class HelmholtzResult(NamedTuple):
    params: any
    k: float
    test_mae: float
    interior_mse: float
    loss_history: np.ndarray
    k_error: float = 0.0       # |k_learned − k_true| (inverse problem)


def train_helmholtz(spec: HelmholtzSpec, epochs: int = 4000, lr: float = 1e-3,
                    seed: int = 0, check_every: int = 1000,
                    lbfgs_steps: int = 0, lm_steps: int = 0,
                    lm_cg_iters: int = 80) -> HelmholtzResult:
    """End-to-end Helmholtz training (Adam; optional L-BFGS polish, matching
    the reference circle scripts' LBFGS phase, helmholtz_2D_circle.py:357-391;
    optional Levenberg–Marquardt residual polish — lm_steps > 0 — beyond the
    reference, same solver as the GPE PL+LM column)."""
    from gpe_tpu.train.optimizers import make_optimizer
    from gpe_tpu.train.hybrid import fit_hybrid

    batch = make_helmholtz_batch(spec, seed)
    loss_fn = make_helmholtz_loss(spec)
    params = init_helmholtz_params(spec, seed)
    if lbfgs_steps > 0:
        hr = fit_hybrid(loss_fn, params, batch, spec.k, 1.0, adam_epochs=epochs,
                        adam_lr=lr, lbfgs_steps=lbfgs_steps, clip_norm=1.0,
                        check_every=check_every)
        params, hist = hr.params, hr.adam.loss_history
    else:
        opt = make_optimizer("adam", lr, clip_norm=1.0)
        res = fit(loss_fn, opt, params, batch, spec.k, 1.0, epochs=epochs,
                  tol=0.0, patience=10**9, check_every=check_every)
        params, hist = res.params, res.loss_history

    if lm_steps > 0:
        from gpe_tpu.train.gauss_newton import make_lm_solver
        lm = make_lm_solver(make_helmholtz_residual_fn(spec), params,
                            steps=lm_steps, cg_iters=lm_cg_iters)
        params = lm(params, batch, jnp.float32(spec.k),
                    jnp.float32(1.0)).params

    _, aux = loss_fn(params, batch, jnp.float32(spec.k), jnp.float32(1.0))
    test_pred = mlp.mlp_apply(params["net"], batch["bx_test"], spec.activation)
    test_mae = float(jnp.mean(jnp.abs(test_pred - batch["bu_test"])))
    interior_pred = mlp.mlp_apply(params["net"], batch["x"], spec.activation)
    interior_mse = float(jnp.mean((interior_pred - batch["u_exact"]) ** 2))
    return HelmholtzResult(params, float(aux["k"]), test_mae, interior_mse,
                           np.asarray(hist),
                           k_error=abs(float(aux["k"]) - spec.k))
