"""Oracle pass for BASELINE config #4 (2D optical lattice): compute the
float64 Dirichlet ground state per γ and score the committed runs.

The lattice is NON-confining, so the PINN's ψ=0 box boundary is part of the
Hamiltonian: the oracle is the split-step imaginary-time solver with the
DST-I Dirichlet kinetic propagator (validate/imaginary_time.py, machine-exact
vs the free-box analytic; cross-checked against a sparse FDM eigsh at γ=0:
2.0435 (2nd-order, 255²) vs 2.04443 spectral).

Two physical branches exist:
- the DELOCALIZED ground state spanning the 3×3 lattice wells (the oracle);
- a LOCALIZED single-well branch — the state the committed PL-PINN run
  (hermite Gaussian base + q-perturbation) converges to, since the
  perturbation ansatz cannot traverse the finite density rearrangement to
  the delocalized state. This run records that branch as
  `localized_branch`; the ground-state net result is produced by
  gpe2d_lattice_flagship.py (distill + LM polish) into the same summary.

Also writes oracle_cache.npz (ψ per γ on the interior grid) so the TPU
training stage can distill without recomputing the host oracle.

Run: python -m gpe_tpu.experiments.lattice_summary  [--dir runs/gpe2d_lattice]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

# host-only work (numpy/scipy oracle + a jnp potential eval): force the CPU
# backend BEFORE jax initializes — on a dead TPU tunnel the axon claim hangs
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def lattice_potential_grid(spec: dict, n: int):
    """V on the n×n INTERIOR grid of the spec's box (f64) + the grid."""
    import numpy as np

    from gpe_tpu.physics import potentials

    lb, ub = float(spec["lb"]), float(spec["ub"])
    dx = (ub - lb) / (n + 1)
    xi = lb + dx * np.arange(1, n + 1)
    X, Y = np.meshgrid(xi, xi, indexing="ij")
    vfn = potentials.get_potential(spec["potential"],
                                   **dict(spec["potential_kwargs"]))
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
    V = np.asarray(vfn(pts), np.float64).reshape(n, n)
    return V, xi, dx


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/gpe2d_lattice")
    ap.add_argument("--n-oracle", type=int, default=255,
                    help="interior oracle grid points per axis")
    ap.add_argument("--tau", type=float, default=2e-3)
    ap.add_argument("--richardson", type=int, default=2)
    args = ap.parse_args(argv)

    import numpy as np

    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe

    with open(os.path.join(args.dir, "bundle.pkl"), "rb") as f:
        bundle = pickle.load(f)
    spec = bundle["spec"]
    mus = dict(bundle["mu_table"][0])          # mode 0 PL-PINN: {γ: μ}
    kinetic, p = float(spec["kinetic"]), float(spec["p"])
    n = args.n_oracle
    V, xi, dx = lattice_potential_grid(spec, n)

    rows, psis, psi = [], {}, None
    for g in sorted(mus):
        mu_ref, psi = imaginary_time_gpe(
            V, dx, float(g), kinetic=kinetic, p=p, tau=args.tau,
            richardson=args.richardson, bc="dirichlet", psi0=psi)
        psis[float(g)] = np.asarray(psi)
        rows.append({"gamma": float(g), "mu_localized_plpinn": float(mus[g]),
                     "mu_ref_ground": float(mu_ref),
                     "branch_gap": float(mus[g] - mu_ref)})
        print(json.dumps(rows[-1]), flush=True)

    gs = sorted(psis)
    np.savez(os.path.join(args.dir, "oracle_cache.npz"),
             gammas=np.asarray(gs),
             psis=np.stack([psis[g] for g in gs]),
             mu_refs=np.asarray([next(r["mu_ref_ground"] for r in rows
                                      if r["gamma"] == g) for g in gs]),
             xi=xi, dx=dx, V=V)

    summary = {
        "experiment": "gpe2d_lattice",
        "oracle": f"imaginary_time dirichlet DST-I n={n} tau={args.tau} "
                  f"richardson={args.richardson}",
        "localized_branch": {
            "note": "committed PL-PINN run (hermite base + q-perturbation) "
                    "converges to the localized single-well branch — a "
                    "symmetry-broken metastable state, NOT the delocalized "
                    "ground state; μ gap vs the ground state below",
            "rows": rows,
        },
    }
    path = os.path.join(args.dir, "summary.json")
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        old.update(summary)
        summary = old
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
