"""Physics-informed DeepONet: learns the operator V(·) ↦ ψ(·) for the 1D GPE
(reference B6: Gross_Pitaevskii_1D_Physics_Informed_DeepONet.ipynb cells 3,9,11
— branch net on potential samples, trunk net on coordinates, dot-product merge
with bias).

TPU design: u(V)(x) = Σ_k b_k(V)·t_k(x) + c. The x-Laplacian needed by the
PDE residual touches ONLY the trunk: Δu = Σ_k b_k·Δt_k, so one forward-
Laplacian pass through the trunk serves every potential in the batch, and the
branch/trunk contraction is a single (B,K)×(K,N) MXU matmul. Training fans the
potential family out as a batch axis — operator learning is embarrassingly
data-parallel over ICI with the same psum quadrature as the GPE trainers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.ops.rayleigh import hamiltonian_apply


@dataclass(frozen=True)
class DeepONetSpec:
    branch_layers: tuple = (64, 64, 64, 40)    # input = n_sensors
    trunk_layers: tuple = (1, 64, 64, 40)      # input = coordinate dim
    activation: str = "tanh"
    n_sensors: int = 64
    lb: float = -10.0
    ub: float = 10.0
    n_points: int = 512
    p: float = 3.0
    kinetic: float = 1.0
    nonlinearity: str = "abs_power"
    bc_weight: float = 10.0
    norm_weight: float = 20.0


def init_deeponet(key, spec: DeepONetSpec):
    kb, kt, kc = jax.random.split(key, 3)
    branch_layers = (spec.n_sensors,) + tuple(spec.branch_layers)
    return {
        "branch": mlp.init_mlp(kb, branch_layers),
        "trunk": mlp.init_mlp(kt, spec.trunk_layers),
        "bias": jnp.zeros(()),
    }


def deeponet_apply(params, v_samples, x, activation: str = "tanh"):
    """u[b, n] = Σ_k branch(v_b)_k · trunk(x_n)_k + bias.

    v_samples: (B, n_sensors); x: (N, d) → (B, N)."""
    b = mlp.mlp_apply(params["branch"], v_samples, activation)   # (B, K)
    t = mlp.mlp_apply(params["trunk"], x, activation)            # (N, K)
    return b @ t.T + params["bias"]


def deeponet_vgl(params, v_samples, x, activation: str = "tanh"):
    """(u, Δ_x u) for the whole potential batch from ONE trunk fwdlap pass."""
    b = mlp.mlp_apply(params["branch"], v_samples, activation)   # (B, K)
    t = mlp.mlp_vgl(params["trunk"], x, activation)              # value (N,K), lap (N,K)
    u = b @ t.value.T + params["bias"]
    lap = b @ t.lap.T
    return u, lap


def make_potential_family_batch(spec: DeepONetSpec, n_functions: int = 64,
                                family: str = "scaled_harmonic", seed: int = 0,
                                beta_range=(0.5, 2.0), betas=None) -> dict:
    """Sample a family of potentials: sensor values (for the branch) and
    collocation values (for the residual).

    `betas` (scaled_harmonic only) pins the family parameters explicitly —
    used for held-out evaluation grids."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(spec.lb, spec.ub, spec.n_sensors)
    xc = np.linspace(spec.lb, spec.ub, spec.n_points)
    if family == "scaled_harmonic":
        betas = (np.asarray(betas, np.float64) if betas is not None
                 else rng.uniform(*beta_range, size=(n_functions,)))
        Vs = betas[:, None] * xs[None, :] ** 2
        Vc = betas[:, None] * xc[None, :] ** 2
        meta = betas
    elif family == "shifted_gaussian":
        centers = rng.uniform(spec.lb / 2, spec.ub / 2, size=(n_functions,))
        Vs = -np.exp(-((xs[None, :] - centers[:, None]) ** 2)) + xs[None, :] ** 2 * 0.05
        Vc = -np.exp(-((xc[None, :] - centers[:, None]) ** 2)) + xc[None, :] ** 2 * 0.05
        meta = centers
    else:
        raise ValueError(f"unknown family {family!r}")
    dx = xc[1] - xc[0]
    return {
        "v_sensors": jnp.asarray(Vs, jnp.float32),
        "V": jnp.asarray(Vc, jnp.float32),
        "x": jnp.asarray(xc[:, None], jnp.float32),
        "w": jnp.full((spec.n_points,), dx, jnp.float32),
        "bx": jnp.asarray([[spec.lb], [spec.ub]], jnp.float32),
        "meta": jnp.asarray(meta, jnp.float32),
    }


def make_deeponet_loss(spec: DeepONetSpec):
    """Physics-informed operator loss: per-potential GPE residual with
    per-potential Rayleigh μ, plus boundary and normalization terms."""
    def loss_fn(params, batch, gamma, scale, axis_name=None):
        u, lap = deeponet_vgl(params, batch["v_sensors"], batch["x"], spec.activation)
        V = batch["V"]                                        # (B, N)
        hu = hamiltonian_apply(u, lap, V, gamma, spec.p, spec.kinetic,
                               spec.nonlinearity)
        den = jnp.sum(u * u, axis=1)
        mu = jnp.sum(u * hu, axis=1) / (den + 1e-12)          # (B,)
        r = hu - mu[:, None] * u
        pde = jnp.mean(r * r)

        vb = jnp.stack([batch["v_sensors"][:, 0], batch["v_sensors"][:, -1]], axis=1)
        ub = deeponet_apply(params, batch["v_sensors"], batch["bx"], spec.activation)
        boundary = jnp.mean(ub * ub)

        norm = jnp.mean((jnp.sum(u * u * batch["w"][None, :], axis=1) - 1.0) ** 2)

        total = pde + spec.bc_weight * boundary + spec.norm_weight * norm
        aux = {"pde": pde, "boundary": boundary, "norm": norm,
               "mu": jnp.mean(mu), "mu_per_fn": mu, "total": total}
        return total, aux

    return loss_fn


class DeepONetResult(NamedTuple):
    params: any
    mu_per_fn: np.ndarray
    loss_history: np.ndarray


def _analytic_family_targets(batch) -> jnp.ndarray:
    """Exact γ=0 ground states for the scaled-harmonic family V=βx²:
    φ_β(x) = β^(1/8)·π^(−1/4)·exp(−√β·x²/2) (kinetic=1 convention)."""
    betas = batch["meta"]                                      # (B,)
    x = batch["x"][:, 0]                                       # (N,)
    sb = jnp.sqrt(betas)[:, None]
    return (sb ** 0.25) * (jnp.pi ** -0.25) * jnp.exp(-0.5 * sb * x[None, :] ** 2)


def train_deeponet(spec: DeepONetSpec, gamma: float = 0.0, epochs: int = 5000,
                   lr: float = 1e-3, n_functions: int = 64, seed: int = 0,
                   family: str = "scaled_harmonic", check_every: int = 1000,
                   beta_range=(0.5, 2.0), pretrain_epochs: int = 3000) -> DeepONetResult:
    """Pretrain the operator on the analytic γ=0 family (the PL-PINN warm-start
    idea lifted to operator learning — eigenproblem PINNs collapse to excited
    states from random init), then physics-informed refinement."""
    from gpe_tpu.train.loop import fit
    from gpe_tpu.train.optimizers import make_optimizer
    import optax

    batch = make_potential_family_batch(spec, n_functions, family, seed, beta_range)
    loss_fn = make_deeponet_loss(spec)
    params = init_deeponet(jax.random.PRNGKey(seed), spec)

    if pretrain_epochs > 0 and family == "scaled_harmonic":
        targets = _analytic_family_targets(batch)

        opt = optax.adam(lr)

        @jax.jit
        def pre_scan(p, s):
            def mse(p):
                u = deeponet_apply(p, batch["v_sensors"], batch["x"], spec.activation)
                return jnp.mean((u - targets) ** 2)

            def step(c, _):
                p, s = c
                l, g = jax.value_and_grad(mse)(p)
                updates, s = opt.update(g, s, p)
                return (optax.apply_updates(p, updates), s), l

            (p, s), ls = jax.lax.scan(step, (p, s), None,
                                      length=pretrain_epochs)
            return p, ls[-1]

        params, _ = pre_scan(params, opt.init(params))

    opt = make_optimizer("adam", lr * 0.1, clip_norm=1.0)
    res = fit(loss_fn, opt, params, batch, gamma, 1.0, epochs=epochs, tol=0.0,
              patience=10**9, check_every=check_every)
    _, aux = loss_fn(res.params, batch, jnp.float32(gamma), jnp.float32(1.0))
    return DeepONetResult(res.params, np.asarray(aux["mu_per_fn"]), res.loss_history)


def evaluate_deeponet(spec: DeepONetSpec, params, betas, gamma: float = 0.0):
    """Held-out generalization evaluation on UNSEEN potentials V=βx²: one
    forward pass per β (no training), μ and wavefunction error vs the float64
    Newton-continuation FDM oracle (the reference DeepONet notebook evaluates
    on held-out potentials, Gross_Pitaevskii_1D_Physics_Informed_DeepONet
    .ipynb cell 11).

    Returns a list of per-β dicts: {beta, mu_pred, mu_ref, mu_abs_err,
    psi_l2_err} plus the (B, N) predicted wavefunctions and the x grid."""
    from gpe_tpu.validate.fdm import solve_gpe_excited_1d

    betas = [float(b) for b in betas]
    batch = make_potential_family_batch(spec, len(betas), "scaled_harmonic",
                                        betas=betas)
    u, lap = deeponet_vgl(params, batch["v_sensors"], batch["x"],
                          spec.activation)
    V = batch["V"]
    hu = hamiltonian_apply(u, lap, V, jnp.float32(gamma), spec.p, spec.kinetic,
                           spec.nonlinearity)
    den = jnp.sum(u * u, axis=1)
    mu = np.asarray(jnp.sum(u * hu, axis=1) / (den + 1e-12))

    x = np.asarray(batch["x"][:, 0], np.float64)
    dx = x[1] - x[0]
    u_np = np.asarray(u, np.float64)
    rows = []
    for i, b in enumerate(betas):
        mu_ref, psi_ref = solve_gpe_excited_1d(b * x ** 2, dx, float(gamma), 0,
                                               kinetic=spec.kinetic, p=spec.p,
                                               nonlinearity=spec.nonlinearity)
        psi = u_np[i] / np.sqrt(np.sum(u_np[i] ** 2) * dx)
        psi_ref_n = psi_ref / np.sqrt(np.sum(psi_ref ** 2) * dx)
        if np.sum(psi * psi_ref_n) < 0:
            psi = -psi
        rows.append({"beta": b, "mu_pred": float(mu[i]), "mu_ref": float(mu_ref),
                     "mu_abs_err": float(abs(mu[i] - mu_ref)),
                     "psi_l2_err": float(np.sqrt(
                         np.sum((psi - psi_ref_n) ** 2) * dx))})
    return rows, u_np, x
