"""Quantitative artifact for BASELINE config #4 (2D optical lattice).

Compares the committed gpe2d_lattice run's μ(γ) (runs/gpe2d_lattice/
bundle.pkl, PL-PINN mode 0) against the Dirichlet split-step imaginary-time
oracle (validate/imaginary_time.py, bc="dirichlet" — the lattice is
non-confining, so the PINN's ψ=0 box boundary is part of the Hamiltonian and
a periodic oracle would solve a different problem). Writes
runs/gpe2d_lattice/summary.json with per-γ |μ−μ_ref|.

Run: python -m gpe_tpu.experiments.lattice_summary  [--dir runs/gpe2d_lattice]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/gpe2d_lattice")
    ap.add_argument("--n-oracle", type=int, default=255,
                    help="interior oracle grid points per axis")
    ap.add_argument("--tau", type=float, default=2e-3)
    ap.add_argument("--richardson", type=int, default=2)
    args = ap.parse_args(argv)

    import numpy as np

    from gpe_tpu.physics import potentials
    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe

    with open(os.path.join(args.dir, "bundle.pkl"), "rb") as f:
        bundle = pickle.load(f)
    spec = bundle["spec"]
    mus = dict(bundle["mu_table"][0])          # mode 0: {γ: μ}
    lb, ub = float(spec["lb"]), float(spec["ub"])
    kinetic, p = float(spec["kinetic"]), float(spec["p"])
    n = args.n_oracle
    dx = (ub - lb) / (n + 1)
    xi = lb + dx * np.arange(1, n + 1)
    X, Y = np.meshgrid(xi, xi, indexing="ij")
    vfn = potentials.get_potential(spec["potential"],
                                   **dict(spec["potential_kwargs"]))
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
    V = np.asarray(vfn(pts), np.float64).reshape(n, n)

    rows, psi = [], None
    for g in sorted(mus):
        mu_ref, psi = imaginary_time_gpe(
            V, dx, float(g), kinetic=kinetic, p=p, tau=args.tau,
            richardson=args.richardson, bc="dirichlet", psi0=psi)
        err = abs(mus[g] - mu_ref)
        rows.append({"gamma": float(g), "mu": float(mus[g]),
                     "mu_ref": float(mu_ref), "abs_err": float(err)})
        print(json.dumps(rows[-1]), flush=True)

    summary = {"experiment": "gpe2d_lattice",
               "oracle": f"imaginary_time dirichlet DST-I n={n} "
                         f"tau={args.tau} richardson={args.richardson}",
               "rows": rows,
               "max_abs_err": max(r["abs_err"] for r in rows),
               "mean_abs_err": float(np.mean([r["abs_err"] for r in rows]))}
    with open(os.path.join(args.dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in ("max_abs_err",
                                              "mean_abs_err")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
