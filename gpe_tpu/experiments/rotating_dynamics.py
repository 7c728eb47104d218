"""Rotating-frame TDGPE experiment — vortex nucleation + Kohn splitting.

Beyond-reference capability (the reference repo has neither time dependence
nor a rotating frame, SURVEY.md §0); this is the committed experiment
artifact for gpe_tpu/dynamics/rotating_step.py (VERDICT r4 #2), connecting
the dynamics engine to the rotating vortex flagship
(runs/gpe2d_vortex/config_oracle_table.json — same trap, γ, Ω):

1. **Spin-up nucleation** — start from the Ω=0 interacting ground state
   (γ=50), switch the frame rotation on at Ω=0.9, and follow the
   renormalized gradient flow (imaginary time) with a small deterministic
   symmetry-breaking perturbation: μ(τ) descends monotonically, L_z(τ)
   climbs from 0 as vortices nucleate at the cloud edge and migrate in,
   and the flow lands on the same finite-circulation vortex-lattice branch
   the flagship's grid oracle converges to (final μ vs the n=128 oracle
   row of config_oracle_table.json).
2. **Stationarity** — real-time evolution of the final state over 2 trap
   periods: L_z and the COM freeze, μ holds to the O(τ) fixed-point bias,
   norm and rotating-frame energy are conserved.
3. **Rotating-frame Kohn splitting** — rigidly displace the vortex state by
   d: ζ(t) = ⟨x⟩+i⟨y⟩ = d·e^{−iΩt}·cos t exactly (any γ, any internal
   state), i.e. the dipole splits into ω± = ω_trap ± Ω with equal weights.
   Reported: max deviation from the ZERO-fit-parameter prediction, and the
   two spectral peaks of ζ (at ω₊ and −ω₋) refined by golden-section vs
   1±Ω.

CPU float64 (the FFT/ADI engine; this tunnel TPU backend lowers no complex
ops — on-chip dynamics evidence rides the real-pair GEMM engine,
dynamics/gemm_step.py and runs/gpe_dynamics/summary_tpu*.json).

Run: python -m gpe_tpu.experiments.rotating_dynamics
Smoke: ... --n 64 --spinup-steps 2000 --rt-steps 400
"""
from __future__ import annotations

import argparse
import json
import os
import time

OUT = "runs/rotating_dynamics"


def fit_kohn_pair(t, z, omega, span=0.3, rounds=6):
    """Least-squares fit ζ(t) ≈ c + a·e^{−iω₊t} + b·e^{+iω₋t} (the exact
    rotating-frame Kohn form ζ = d·e^{−iΩt}cos t has a = b = d/2, c = 0):
    the inner problem is linear in (c, a, b), so alternate golden-section
    refinement of ω₊ then ω₋ on the LSQ residual — leakage-free, unlike a
    bare periodogram peak. Returns (ω₊, ω₋, |a|, |b|, rms)."""
    import numpy as np

    t = np.asarray(t, np.float64)
    z = np.asarray(z, np.complex128)

    def resid(wp, wm):
        M = np.stack([np.ones_like(t), np.exp(-1j * wp * t),
                      np.exp(1j * wm * t)], 1)
        coef, *_ = np.linalg.lstsq(M, z, rcond=None)
        r = z - M @ coef
        return float(np.real(np.conj(r) @ r)), coef

    def golden(f, a, b):
        gr = (np.sqrt(5.0) - 1.0) / 2.0
        c, d = b - gr * (b - a), a + gr * (b - a)
        fc, fd = f(c), f(d)
        for _ in range(60):
            if fc < fd:
                b, d, fd = d, c, fc
                c = b - gr * (b - a)
                fc = f(c)
            else:
                a, c, fc = c, d, fd
                d = a + gr * (b - a)
                fd = f(d)
        return 0.5 * (a + b)

    wp, wm = 1.0 + omega, 1.0 - omega
    for _ in range(rounds):
        wp = golden(lambda w: resid(w, wm)[0], wp - span, wp + span)
        wm = golden(lambda w: resid(wp, w)[0], wm - span, wm + span)
        span *= 0.5
    rss, coef = resid(wp, wm)
    return wp, wm, abs(coef[1]), abs(coef[2]), float(np.sqrt(rss / t.size))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--half", type=float, default=8.0)
    ap.add_argument("--gamma", type=float, default=50.0)
    ap.add_argument("--omega", type=float, default=0.9)
    ap.add_argument("--tau", type=float, default=2e-3)
    ap.add_argument("--spinup-steps", type=int, default=30000)
    ap.add_argument("--record-every", type=int, default=500)
    ap.add_argument("--rt-dt", type=float, default=1e-3)
    ap.add_argument("--rt-steps", type=int, default=12566,
                    help="default 2 trap periods at dt=1e-3")
    ap.add_argument("--kohn-steps", type=int, default=25133,
                    help="Kohn stage length (default 4 trap periods — the "
                         "splitting needs ≥2π/(ω₊−ω₋) of signal)")
    ap.add_argument("--displace", type=float, default=0.5)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args(argv)

    import jax
    # complex FFT path → CPU f64 (and never contend for the single TPU
    # claim); must be set before any device query (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    with jax.enable_x64(True):
        from gpe_tpu.dynamics import evolve_rotating, rotating_ground_state
        from gpe_tpu.dynamics.split_step import axis_coords
        from gpe_tpu.validate.rotating import vortex_count

        n, half = args.n, args.half
        lb = -half
        dx = 2.0 * half / (n - 1)
        x0, x1 = axis_coords((n, n), dx, lb, "periodic")
        X, Y = np.meshgrid(np.asarray(x0), np.asarray(x1), indexing="ij")
        V = np.asarray(0.5 * (X ** 2 + Y ** 2))

        # 1) Ω=0 ground state (zero circulation)
        mu0, psi0, lz0 = rotating_ground_state(
            V, dx, args.gamma, 0.0, tau=args.tau, steps=args.spinup_steps,
            tol=1e-13, lb=lb, seed_vortex=False)
        print(json.dumps({"stage": "omega0_ground", "mu": mu0, "lz": lz0,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

        # 2) spin-up: switch Ω on, deterministic symmetry-breaking seed
        # (a weak vortex-like phase tilt + noise, as the grid oracle uses),
        # record the nucleation pathway μ(τ), L_z(τ), n_vortices(τ)
        rng = np.random.default_rng(0)
        psi = np.asarray(psi0) * ((X - 0.3) + 1j * (Y + 0.2))
        psi += 0.01 * (rng.standard_normal(psi.shape)
                       + 1j * rng.standard_normal(psi.shape)
                       ) * np.abs(psi).max()
        psi /= np.sqrt(np.sum(np.abs(psi) ** 2) * dx * dx)

        path = {"tau_t": [], "mu": [], "lz": [], "n_vortices": []}
        chunks, rem = divmod(args.spinup_steps, args.record_every)
        for k in range(chunks):
            psi, obs = evolve_rotating(psi, V, dx, args.tau,
                                       args.record_every, args.gamma,
                                       args.omega, lb=lb, imaginary=True,
                                       record_every=args.record_every)
            path["tau_t"].append((k + 1) * args.record_every * args.tau)
            path["mu"].append(float(obs["mu"][-1]))
            path["lz"].append(float(obs["lz"][-1]))
            path["n_vortices"].append(vortex_count(np.asarray(psi)))
        if rem:
            psi, obs = evolve_rotating(psi, V, dx, args.tau, rem, args.gamma,
                                       args.omega, lb=lb, imaginary=True,
                                       record_every=rem)
            path["tau_t"].append(args.spinup_steps * args.tau)
            path["mu"].append(float(obs["mu"][-1]))
            path["lz"].append(float(obs["lz"][-1]))
            path["n_vortices"].append(vortex_count(np.asarray(psi)))
        mu_f, lz_f, nv_f = path["mu"][-1], path["lz"][-1], path["n_vortices"][-1]
        print(json.dumps({"stage": "spinup", "mu": mu_f, "lz": lz_f,
                          "n_vortices": nv_f,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

        # flagship cross-check: the grid oracle's n=128 rows at the same
        # (trap, γ, Ω) — config_oracle_table.json, when present
        oracle_rows = None
        table_path = "runs/gpe2d_vortex/config_oracle_table.json"
        if (os.path.exists(table_path) and args.gamma == 50.0
                and args.omega == 0.9 and args.half == 8.0):
            with open(table_path) as f:
                table = json.load(f)
            oracle_rows = {name: [r for r in cfg["rows"]
                                  if r["n"] == args.n]
                           for name, cfg in table.items()}

        # 3) stationarity: real-time evolution of the final state
        psi_rt, obs = evolve_rotating(np.asarray(psi), V, dx, args.rt_dt,
                                      args.rt_steps, args.gamma, args.omega,
                                      lb=lb, record_every=200)
        mus = np.asarray(obs["mu"])
        e = np.asarray(obs["energy"])
        stationarity = {
            "mu_drift_max": float(np.max(np.abs(mus - mu_f))),
            "lz_drift_max": float(np.max(np.abs(np.asarray(obs["lz"]) - lz_f))),
            "com_max": float(np.max(np.abs(np.asarray(obs["center"])))),
            "norm_drift": float(np.max(np.abs(np.asarray(obs["norm"]) - 1.0))),
            "energy_drift_rel": float(np.max(np.abs(e - e[0]))
                                      / max(abs(e[0]), 1e-30)),
        }
        print(json.dumps({"stage": "stationarity", **stationarity,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

        # 4) rotating Kohn splitting: rigid displacement of the vortex state
        d = args.displace
        shift = int(round(d / dx))
        d_eff = shift * dx          # rigid displacement on the grid, exact
        psi_k = np.roll(np.asarray(psi), shift, axis=0)
        psi_k, obs = evolve_rotating(psi_k, V, dx, args.rt_dt,
                                     args.kohn_steps,
                                     args.gamma, args.omega, lb=lb,
                                     record_every=20)
        t = np.asarray(obs["t"])
        cx = np.asarray(obs["center"])[:, 0]
        cy = np.asarray(obs["center"])[:, 1]
        x_pred = d_eff * np.cos(t) * np.cos(args.omega * t)
        y_pred = -d_eff * np.cos(t) * np.sin(args.omega * t)
        zeta = cx + 1j * cy
        wp, wm, ap_, am_, fit_rms = fit_kohn_pair(t, zeta, args.omega)
        kohn = {
            "displacement": d_eff,
            "pred_max_dev_x": float(np.max(np.abs(cx - x_pred))),
            "pred_max_dev_y": float(np.max(np.abs(cy - y_pred))),
            "omega_plus_fit": wp, "omega_plus_exact": 1 + args.omega,
            "omega_plus_abs_err": abs(wp - (1 + args.omega)),
            "omega_minus_fit": wm, "omega_minus_exact": 1 - args.omega,
            "omega_minus_abs_err": abs(wm - (1 - args.omega)),
            "weight_ratio": float(ap_ / am_), "weight_ratio_exact": 1.0,
            "fit_rms": fit_rms,
        }
        print(json.dumps({"stage": "kohn_splitting", **kohn,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

        summary = {
            "config": (f"rotating-frame TDGPE: n={n}² grid, γ={args.gamma}, "
                       f"Ω 0→{args.omega} spin-up quench "
                       f"({args.spinup_steps} imaginary steps τ={args.tau}) "
                       f"+ {args.rt_steps} real-time steps dt={args.rt_dt}"),
            "backend": jax.devices()[0].platform,
            "dtype": "complex128",
            "omega0_ground": {"mu": mu0, "lz": lz0},
            "spinup_final": {"mu": mu_f, "lz": lz_f, "n_vortices": nv_f},
            "nucleation_path": path,
            "flagship_oracle_n128_rows": oracle_rows,
            "stationarity": stationarity,
            "kohn_splitting": kohn,
            "wall_s": round(time.time() - t0, 1),
        }
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

        # nucleation-path + density/phase panel
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
            axes[0].plot(path["tau_t"], path["lz"], label="$L_z$")
            ax2 = axes[0].twinx()
            ax2.plot(path["tau_t"], path["n_vortices"], "C1.-",
                     label="vortices")
            axes[0].set_xlabel(r"imaginary time $\tau$")
            axes[0].set_ylabel(r"$\langle L_z\rangle$")
            ax2.set_ylabel("vortex count")
            axes[0].set_title(f"spin-up Ω=0→{args.omega}")
            axes[1].imshow(np.abs(np.asarray(psi)).T ** 2, origin="lower",
                           extent=[lb, -lb, lb, -lb])
            axes[1].set_title(f"|ψ|² final ({nv_f} vortices)")
            axes[2].plot(t, cx, label=r"$\langle x\rangle$")
            axes[2].plot(t, x_pred, "k--", lw=0.8, label="prediction")
            axes[2].set_xlabel("t")
            axes[2].set_title(r"Kohn splitting $\omega_\pm = 1\pm\Omega$")
            axes[2].legend()
            fig.savefig(os.path.join(args.out, "rotating_dynamics.png"),
                        dpi=130, bbox_inches="tight")
            plt.close(fig)
        except Exception as e:  # matplotlib is auxiliary
            print(f"plotting failed: {e}")

    print(json.dumps({"summary": "written", "wall_s": summary["wall_s"]}),
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
