"""TDGPE dynamics flagship — quench response of the interacting 2D gas.

Beyond-reference capability (the reference is entirely time-independent,
SURVEY.md §0): after finding a ground state, the physical follow-up
questions are dynamical. This experiment propagates the time-dependent GPE
(gpe_tpu/dynamics/split_step.py — one jitted lax.scan, spectral Strang
splitting on the TPU FFT) through two textbook-exact protocols whose answers
are known analytically even though the dynamics is fully nonlinear:

1. **Kohn dipole mode** — prepare the γ-interacting ground state in a trap
   displaced by d, release into the centered trap: the center of mass
   oscillates at the BARE trap frequency ω=1 with no damping, independent of
   γ (Kohn's theorem). Fitted ω_dipole vs 1 is the first oracle.
2. **2D breathing mode** — quench the interaction γ → λγ: the 2D
   contact-interacting gas in a harmonic trap has a hidden SO(2,1) symmetry
   (Pitaevskii–Rosch), making the monopole (width) oscillation EXACTLY 2ω at
   any γ and any quench amplitude. Fitted ω_breath vs 2 is the second — a
   sharp test of the nonlinear term, since a wrong |ψ|² coupling shifts it.

Also reported: norm drift (unitarity), post-quench energy drift
(conservation under the quenched Hamiltonian), and device throughput
(grid-point·steps/s — each step is 2 FFT pairs + elementwise, all on the
MXU/VPU inside one compiled scan with zero host round-trips).

Run (TPU): python -m gpe_tpu.experiments.gpe_dynamics
CPU smoke: ... --n 64 --steps 800 --gamma 10
"""
from __future__ import annotations

import argparse
import json
import os
import time

OUT = "runs/gpe_dynamics"


def fit_frequency(t, y):
    """Least-squares fit y ≈ C + A·cos(ωt) + B·sin(ωt): FFT peak seeds ω,
    golden-section refine on the linear-fit residual (no scipy dependence;
    the inner problem is linear so the 1-D search is smooth)."""
    import numpy as np

    t = np.asarray(t, np.float64)
    y = np.asarray(y, np.float64)
    yc = y - y.mean()
    dt = t[1] - t[0]
    freqs = np.fft.rfftfreq(t.size, d=dt) * 2.0 * np.pi
    spec = np.abs(np.fft.rfft(yc))
    k = int(np.argmax(spec[1:]) + 1)

    def resid(w):
        M = np.stack([np.ones_like(t), np.cos(w * t), np.sin(w * t)], 1)
        coef, *_ = np.linalg.lstsq(M, y, rcond=None)
        r = y - M @ coef
        return float(r @ r), coef

    lo = freqs[max(k - 2, 1)]
    hi = freqs[min(k + 2, freqs.size - 1)]
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = resid(c)[0], resid(d)[0]
    for _ in range(80):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = resid(c)[0]
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = resid(d)[0]
    w = 0.5 * (a + b)
    rss, coef = resid(w)
    amp = float(np.hypot(coef[1], coef[2]))
    return float(w), amp, float(np.sqrt(rss / t.size))


def breathing_sweep_1d(out_dir, gammas=(0.0, 1.0, 5.0, 20.0, 100.0, 500.0),
                       n=512, half=16.0, quench=1.05, periods=6.0,
                       gs_steps=30000):
    """1D monopole-frequency crossover vs interaction strength.

    Unlike 2D (hidden SO(2,1) symmetry pins ω=2 at every γ), the 1D
    breathing mode interpolates between two analytic limits: ω=2ω_trap at
    γ=0 (single particle) and ω=√3·ω_trap in the Thomas–Fermi limit
    (hydrodynamic sum rule, Menotti & Stringari PRA 66 043610). A small
    quench γ→1.05γ stays in the linear-response regime; the fitted width
    frequency must fall monotonically from 2 to √3 along the sweep — a
    quantitative nonlinear-dynamics oracle with no free parameters.

    dt is set BELOW the split-step parametric-resonance threshold
    π/(c·k_max²): Strang splitting is exactly unitary, so at larger dt the
    aliased kinetic phases dt·c·k² ≈ π resonate with the nonlinear term and
    pump energy into high-k modes without any norm drift (observed at
    γ=100, dt=6.3e-3: ⟨x²⟩ 5.6 → 177 within one trap period while the norm
    held 1 ± 2e-13)."""
    import numpy as np

    from gpe_tpu.dynamics import evolve, ground_state

    x = np.linspace(-half, half, n, endpoint=False)
    dx = float(x[1] - x[0])
    V = 0.5 * x * x
    t_end = periods * 2.0 * np.pi
    kmax2 = (np.pi / dx) ** 2
    dt = 0.8 * np.pi / (0.5 * kmax2)
    steps = int(np.ceil(t_end / dt))
    rec = max(1, steps // 600)
    rows = []
    for g in gammas:
        _, psi = ground_state(V, dx, float(g), tau=2e-3, steps=gs_steps,
                              tol=1e-12)
        _, obs = evolve(np.asarray(psi), V, dx, dt, steps, quench * float(g),
                        bc="periodic", lb=float(x[0]), record_every=rec)
        w2 = np.asarray(obs["width_sq"])[:, 0]
        w, amp, rms = fit_frequency(obs["t"], w2)
        rows.append({"gamma": float(g), "omega_fit": w,
                     "amplitude": amp, "fit_rms": rms})
        print(json.dumps(rows[-1]), flush=True)
    table = {"config": f"1D breathing-mode crossover, {n} pts, quench "
                       f"×{quench:g}, {periods:g} periods",
             "omega_gamma0_exact": 2.0,
             "omega_tf_exact": float(np.sqrt(3.0)),
             "rows": rows}
    with open(os.path.join(out_dir, "breathing_1d.json"), "w") as f:
        json.dump(table, f, indent=1)
    return table


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="grid side (n²)")
    ap.add_argument("--half", type=float, default=12.0)
    ap.add_argument("--gamma", type=float, default=100.0)
    ap.add_argument("--displace", type=float, default=0.5)
    ap.add_argument("--quench", type=float, default=1.3,
                    help="breathing quench factor λ: γ → λγ at t=0")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--periods", type=float, default=4.0,
                    help="evolution length in trap periods 2π/ω")
    ap.add_argument("--gs-steps", type=int, default=30000)
    ap.add_argument("--f32", action="store_true",
                    help="complex64 path (TPU-native dtype; conservation "
                         "floors at ~1e-4 instead of 1e-12)")
    ap.add_argument("--breathing-1d-sweep", action="store_true",
                    help="run ONLY the 1D monopole crossover sweep "
                         "(omega: 2 -> sqrt(3) with gamma)")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args(argv)

    import contextlib

    import numpy as np
    import jax

    from gpe_tpu.dynamics import evolve, ground_state

    os.makedirs(args.out, exist_ok=True)
    if args.breathing_1d_sweep:
        with (contextlib.nullcontext() if args.f32
              else jax.enable_x64(True)):
            breathing_sweep_1d(args.out)
        return 0
    n, half, gam = args.n, args.half, args.gamma
    with (contextlib.nullcontext() if args.f32 else jax.enable_x64(True)):
        x1 = np.linspace(-half, half, n, endpoint=False)
        dx = float(x1[1] - x1[0])
        X, Y = np.meshgrid(x1, x1, indexing="ij")
        V = 0.5 * (X ** 2 + Y ** 2)
        t_end = args.periods * 2.0 * np.pi
        dt = t_end / args.steps
        rec = max(1, args.steps // 400)

        # --- Kohn dipole: γ ground state in the displaced trap, released ---
        t0 = time.time()
        d = args.displace
        mu0, psi_d = ground_state(0.5 * ((X - d) ** 2 + Y ** 2), dx, gam,
                                  tau=2e-3, steps=args.gs_steps, tol=1e-12)
        wall_gs = time.time() - t0
        t0 = time.time()
        _, obs_k = evolve(np.asarray(psi_d), V, dx, dt, args.steps, gam,
                          bc="periodic", lb=float(x1[0]), record_every=rec)
        # force completion for honest timing (tunnel backend: block_until_ready
        # does not synchronize — a scalar fetch does, CLAUDE.md)
        norm_k = np.asarray(obs_k["norm"])
        wall_k = time.time() - t0
        cx = np.asarray(obs_k["center"])[:, 0]
        w_dip, amp_dip, rms_dip = fit_frequency(obs_k["t"], cx)

        # --- 2D breathing: interaction quench γ → λγ from the γ GS ---
        mu_c, psi_c = ground_state(V, dx, gam, tau=2e-3,
                                   steps=args.gs_steps, tol=1e-12,
                                   psi0=np.abs(np.asarray(psi_d)))
        _, obs_b = evolve(np.asarray(psi_c), V, dx, dt, args.steps,
                          args.quench * gam, bc="periodic", lb=float(x1[0]),
                          record_every=rec)
        w2 = np.asarray(obs_b["width_sq"]).sum(1)       # ⟨r²⟩ monopole
        w_br, amp_br, rms_br = fit_frequency(obs_b["t"], w2)

        e_b = np.asarray(obs_b["energy"])
        summary = {
            "config": f"2D TDGPE quench dynamics: {n}² grid, γ={gam:g}, "
                      f"dt={dt:.2e}, {args.steps} Strang steps "
                      f"({args.periods:g} trap periods)",
            "mu_ground": float(mu_c),
            "kohn_dipole": {
                "omega_fit": w_dip, "omega_exact": 1.0,
                "abs_err": abs(w_dip - 1.0),
                "amplitude_fit": amp_dip, "displacement": d,
                "fit_rms": rms_dip,
            },
            "breathing_2d": {
                "omega_fit": w_br, "omega_exact": 2.0,
                "abs_err": abs(w_br - 2.0),
                "quench_factor": args.quench, "amplitude_fit": amp_br,
                "fit_rms": rms_br,
            },
            "backend": jax.devices()[0].platform,
            "dtype": "complex64" if args.f32 else "complex128",
            "norm_drift": float(np.max(np.abs(norm_k - 1.0))),
            "energy_drift_rel": float(np.max(np.abs(e_b / e_b[0] - 1.0))),
            "throughput_grid_pt_steps_per_sec": float(
                n * n * args.steps / wall_k),
            "wall_ground_state_s": round(wall_gs, 1),
            "wall_evolve_s": round(wall_k, 1),
        }
    print(json.dumps(summary, indent=1), flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    try:                                   # plots must never fail a run
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from gpe_tpu.viz.plots import use_publication_style

        use_publication_style()
        fig, axes = plt.subplots(1, 2, figsize=(10, 3.4))
        axes[0].plot(obs_k["t"], cx, lw=1.2, label=r"$\langle x\rangle(t)$")
        axes[0].plot(obs_k["t"], d * np.cos(obs_k["t"]), "--", lw=1.0,
                     label=r"$d\cos(\omega t)$ (Kohn)")
        axes[0].set_xlabel("t")
        axes[0].set_title(f"dipole: $\\omega$={w_dip:.6f} (exact 1)")
        axes[0].legend()
        axes[1].plot(obs_b["t"], w2, lw=1.2, label=r"$\langle r^2\rangle(t)$")
        axes[1].set_xlabel("t")
        axes[1].set_title(f"breathing: $\\omega$={w_br:.6f} (exact 2)")
        axes[1].legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "quench_modes.png"), dpi=150)
    except Exception as e:
        print(f"plot skipped: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
