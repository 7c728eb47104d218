"""A/B: tanh/xavier vs sin/siren distillation of the Ω=0.9 vortex field.

Round-4a found the configuration-matched vortex rows are limited by the
DISTILL floor, not the LM polish: H¹ (Sobolev) distillation of the cached
v7 seven-vortex oracle state floors at fit MSE ~1.9e-6 with a tanh MLP
(runs/gpe2d_vortex/config_matched.json), which leaves within-configuration
μ err at 0.8–1.2e-2 vs the ≤5e-3 target (VERDICT r3 #2). A tanh net
struggles to represent 7 oscillatory phase-winding cores; SIREN
(sin activation + Sitzmann init, models/mlp.py scheme="siren") is the
standard fix for oscillatory targets.

Arms: (tanh, xavier_uniform) vs (sin, siren) at w0 ∈ {3, 4, 6}, identical
Sobolev distill budget on the cached v7 field regridded to 128².
Reports value MSE, jacobian MSE, and the mesh-free μ of the (normalized,
unpolished) distilled net vs the oracle μ*.

Run (TPU): python benchmarks/ab_siren_vortex.py [--epochs N]
Writes runs/gpe2d_vortex/ab_siren.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE = "runs/gpe2d_vortex/config_oracle_cache.npz"
OUT = "runs/gpe2d_vortex/ab_siren.json"
GAMMA, OMEGA, TRAP, KIN = 50.0, 0.9, 0.5, 0.5
LB, UB = -8.0, 8.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6000)
    ap.add_argument("--lbfgs", type=int, default=600)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--width", type=int, default=176)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from gpe_tpu.models import mlp
    from gpe_tpu.train.pretrain import pretrain_sobolev
    from gpe_tpu.validate.rotating import _spectral_grads, regrid_psi

    cache = np.load(CACHE)
    psi = cache["v7_psi_re"] + 1j * cache["v7_psi_im"]
    x_src = cache["v7_x"]
    mu_star = float(cache["v7_mu"])

    n = args.n
    xs = np.linspace(LB, UB, n)
    psi_s = regrid_psi(psi, x_src, xs)
    Xs, Ys = np.meshgrid(xs, xs, indexing="ij")
    x_s = np.stack([Xs.ravel(), Ys.ravel()], -1).astype(np.float32)
    tval = np.stack([np.real(psi_s).ravel(),
                     np.imag(psi_s).ravel()], -1).astype(np.float32)
    dxs = float(xs[1] - xs[0])
    gx, gy = _spectral_grads(psi_s, dxs)
    tjac = np.empty((n * n, 2, 2), np.float32)
    tjac[:, 0, 0] = np.real(gx).ravel()
    tjac[:, 0, 1] = np.imag(gx).ravel()
    tjac[:, 1, 0] = np.real(gy).ravel()
    tjac[:, 1, 1] = np.imag(gy).ravel()

    w = jnp.full((n * n,), dxs * dxs, jnp.float32)
    V = jnp.asarray(TRAP * (Xs.ravel() ** 2 + Ys.ravel() ** 2), jnp.float32)
    xj = jnp.asarray(x_s)

    def meshfree_mu(params, act):
        net = mlp.mlp_vgl(params, xj, act)
        a, b = net.value[:, 0], net.value[:, 1]
        a_x, a_y = net.grad[:, 0, 0], net.grad[:, 1, 0]
        b_x, b_y = net.grad[:, 0, 1], net.grad[:, 1, 1]
        lap_a, lap_b = net.lap[:, 0], net.lap[:, 1]
        norm = jnp.sqrt(jnp.sum((a * a + b * b) * w) + 1e-30)
        a, b, a_x, a_y, b_x, b_y, lap_a, lap_b = (
            v / norm for v in (a, b, a_x, a_y, b_x, b_y, lap_a, lap_b))
        X_, Y_ = xj[:, 0], xj[:, 1]
        rho = a * a + b * b
        Veff = V + GAMMA * rho
        h_re = -KIN * lap_a + Veff * a - OMEGA * (X_ * b_y - Y_ * b_x)
        h_im = -KIN * lap_b + Veff * b + OMEGA * (X_ * a_y - Y_ * a_x)
        return float(jnp.sum(a * h_re + b * h_im) / (jnp.sum(rho) + 1e-12))

    layers = (2, args.width, args.width, args.width, 2)
    arms = [
        {"name": "tanh_xavier", "act": "tanh", "scheme": "xavier_uniform",
         "w0": 0.0},
        {"name": "sin_siren_w3", "act": "sin", "scheme": "siren", "w0": 3.0},
        {"name": "sin_siren_w4", "act": "sin", "scheme": "siren", "w0": 4.0},
        {"name": "sin_siren_w6", "act": "sin", "scheme": "siren", "w0": 6.0},
    ]
    results = []
    for arm in arms:
        t0 = time.time()
        params = mlp.init_mlp(jax.random.PRNGKey(0), layers,
                              scheme=arm["scheme"], w0=arm["w0"] or 4.0)
        params, fit = pretrain_sobolev(
            params, x_s, tval, tjac, arm["act"], epochs=args.epochs,
            lbfgs_steps=args.lbfgs, jac_weight=0.1)
        net = mlp.mlp_vgl(params, xj, arm["act"])
        vmse = float(jnp.mean((net.value - jnp.asarray(tval)) ** 2))
        jmse = float(jnp.mean((net.grad - jnp.asarray(tjac)) ** 2))
        mu = meshfree_mu(params, arm["act"])
        row = {**arm, "fit_loss": fit, "value_mse": vmse, "jac_mse": jmse,
               "mu_net_unpolished": mu, "mu_star": mu_star,
               "mu_err": abs(mu - mu_star),
               "wall_s": round(time.time() - t0, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"epochs": args.epochs, "lbfgs": args.lbfgs,
                   "n": n, "width": args.width, "arms": results}, f, indent=2)
    print(json.dumps({"written": OUT}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
