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


def timed_throughput(evolve_call, n_pts: int, steps: int):
    """Honest device throughput for a compiled evolution scan: the K2−K1
    regression of two scan lengths, each warmed once (compile excluded), each
    ending in a forced scalar fetch — dispatch/fetch latency cancels in the
    difference (this backend does not synchronize in block_until_ready,
    CLAUDE.md / bench.py timing-integrity note)."""
    import numpy as np

    k1, k2 = max(steps // 4, 1), steps

    def run(k):
        _, obs = evolve_call(k)
        return float(np.asarray(obs["norm"])[-1])

    run(k1), run(k2)                       # compile both scan lengths
    t0 = time.time(); run(k1); t1 = time.time() - t0
    t0 = time.time(); run(k2); t2 = time.time() - t0
    dt_step = max((t2 - t1) / (k2 - k1), 1e-12)
    return n_pts / dt_step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="grid side (n^dims)")
    ap.add_argument("--half", type=float, default=12.0)
    ap.add_argument("--dims", type=int, default=2, choices=(2, 3),
                    help="3: 3D Kohn dipole + monopole quench (the monopole "
                         "has no hidden symmetry in 3D — reported between "
                         "its exact limits 2 (γ=0) and √5 (TF))")
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
    ap.add_argument("--out-name", default=None,
                    help="summary filename (default summary[_3d].json, or "
                         "summary_tpu[_3d].json when --f32 runs on a device "
                         "backend); device artifacts embed the committed f64 "
                         "summary of the SAME dims for comparison")
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
    n, half, gam, dim = args.n, args.half, args.gamma, args.dims
    backend = jax.devices()[0].platform
    n_pts = n ** dim
    if backend != "cpu":
        # this TPU backend has NO complex lowering (jnp.fft AND complex64
        # arithmetic raise UNIMPLEMENTED) — route through the MXU GEMM
        # engine (dynamics/gemm_step.py, parity-tested vs the FFT engine)
        from gpe_tpu.dynamics import evolve_gemm as evolve
        from gpe_tpu.dynamics import ground_state_gemm as ground_state
    with (contextlib.nullcontext() if args.f32 else jax.enable_x64(True)):
        x1 = np.linspace(-half, half, n, endpoint=False)
        dx = float(x1[1] - x1[0])
        grids = np.meshgrid(*([x1] * dim), indexing="ij")
        X = grids[0]
        r2_rest = sum(g ** 2 for g in grids[1:])
        V = 0.5 * (X ** 2 + r2_rest)
        t_end = args.periods * 2.0 * np.pi
        steps = args.steps
        dt = t_end / steps
        # f32 parametric-resonance guard: modes whose per-step kinetic phase
        # dt·c·k² reaches π are parametrically pumped by the nonlinear term
        # (split_step.py docstring). In f64 the pumped corner modes start at
        # the 1e-16 noise floor and stay invisible over a few trap periods;
        # in f32 they start at ~1e-7 and explode (measured on-chip: energy
        # drift 58× at dt=1.5×π/(c·k²_corner); CPU complex64 dt-sweep
        # reproduces it and is clean at ≤1.0× — runs/probe_f32_breathing).
        # Keep every mode below π with 10% margin; minimal bump only (f32
        # rounding drift grows ∝ steps, so more steps is not free).
        resonance_guard = None
        kmax2_corner = dim * (np.pi / dx) ** 2
        dt_safe = 0.9 * np.pi / (0.5 * kmax2_corner)
        if args.f32 and dt > dt_safe:
            steps = int(np.ceil(t_end / dt_safe))
            resonance_guard = {"requested_steps": args.steps, "steps": steps,
                               "dt_threshold_pi_over_ck2": float(
                                   np.pi / (0.5 * kmax2_corner))}
            dt = t_end / steps
            print(f"f32 resonance guard: steps {args.steps} -> {steps} "
                  f"(dt {dt:.3e} <= 0.9*pi/(c*k2_corner))", flush=True)
        rec = max(1, steps // 400)

        # --- Kohn dipole: γ ground state in the displaced trap, released ---
        t0 = time.time()
        d = args.displace
        mu0, psi_d = ground_state(0.5 * ((X - d) ** 2 + r2_rest), dx, gam,
                                  tau=2e-3, steps=args.gs_steps, tol=1e-12)
        wall_gs = time.time() - t0
        t0 = time.time()
        _, obs_k = evolve(np.asarray(psi_d), V, dx, dt, steps, gam,
                          bc="periodic", lb=float(x1[0]), record_every=rec)
        # force completion for honest timing (tunnel backend: block_until_ready
        # does not synchronize — a scalar fetch does, CLAUDE.md)
        norm_k = np.asarray(obs_k["norm"])
        wall_k = time.time() - t0
        cx = np.asarray(obs_k["center"])[:, 0]
        w_dip, amp_dip, rms_dip = fit_frequency(obs_k["t"], cx)

        # --- breathing/monopole: interaction quench γ → λγ from the γ GS ---
        mu_c, psi_c = ground_state(V, dx, gam, tau=2e-3,
                                   steps=args.gs_steps, tol=1e-12,
                                   psi0=np.abs(np.asarray(psi_d)))
        _, obs_b = evolve(np.asarray(psi_c), V, dx, dt, steps,
                          args.quench * gam, bc="periodic", lb=float(x1[0]),
                          record_every=rec)
        w2 = np.asarray(obs_b["width_sq"]).sum(1)       # ⟨r²⟩ monopole
        w_br, amp_br, rms_br = fit_frequency(obs_b["t"], w2)

        if dim == 2:
            # hidden SO(2,1) symmetry (Pitaevskii–Rosch): EXACTLY 2ω at any γ
            breathing = {"omega_fit": w_br, "omega_exact": 2.0,
                         "abs_err": abs(w_br - 2.0)}
        else:
            # 3D has no hidden symmetry: exact only in the two limits —
            # 2ω at γ=0, √5·ω in the TF/hydrodynamic limit (Stringari '96)
            breathing = {"omega_fit": w_br,
                         "omega_limits_gamma0_tf": [2.0, float(np.sqrt(5.0))],
                         "in_limits": bool(2.0 - 0.02 <= w_br
                                           <= np.sqrt(5.0) + 0.02)}
        breathing.update({"quench_factor": args.quench,
                          "amplitude_fit": amp_br, "fit_rms": rms_br})

        # device throughput: compile-excluded K2−K1 regression on device
        # backends; the CPU wall clock is already synchronous
        if backend != "cpu":
            thr = timed_throughput(
                lambda k: evolve(np.asarray(psi_c), V, dx, dt, k, gam,
                                 bc="periodic", lb=float(x1[0]),
                                 record_every=k), n_pts, steps)
        else:
            thr = n_pts * steps / wall_k

        e_b = np.asarray(obs_b["energy"])
        summary = {
            "config": f"{dim}D TDGPE quench dynamics: {n}^{dim} grid, "
                      f"γ={gam:g}, dt={dt:.2e}, {steps} Strang steps "
                      f"({args.periods:g} trap periods)",
            "mu_ground": float(mu_c),
            "kohn_dipole": {
                "omega_fit": w_dip, "omega_exact": 1.0,
                "abs_err": abs(w_dip - 1.0),
                "amplitude_fit": amp_dip, "displacement": d,
                "fit_rms": rms_dip,
            },
            f"breathing_{dim}d": breathing,
            "backend": backend,
            "dtype": "complex64" if args.f32 else "complex128",
            "norm_drift": float(np.max(np.abs(norm_k - 1.0))),
            "energy_drift_rel": float(np.max(np.abs(e_b / e_b[0] - 1.0))),
            "throughput_grid_pt_steps_per_sec": float(thr),
            "wall_ground_state_s": round(wall_gs, 1),
            "wall_evolve_s": round(wall_k, 1),
        }
        if resonance_guard is not None:
            summary["f32_resonance_guard"] = resonance_guard

    suffix = "" if dim == 2 else f"_{dim}d"
    on_device = args.f32 and backend != "cpu"
    out_name = args.out_name or (
        f"summary_tpu{suffix}.json" if on_device else f"summary{suffix}.json")
    # embed the committed f64 CPU oracle values so the f32/TPU artifact
    # carries its own accuracy-vs-f64 bounds (VERDICT r4 #1)
    ref_path = os.path.join(args.out, f"summary{suffix}.json")
    if out_name != f"summary{suffix}.json" and os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                ref = json.load(f)
            if (ref.get("dtype") == "complex128"
                    and ref.get("config", "").startswith(f"{dim}D")):
                cmp = {"f64_config": ref.get("config"),
                       "kohn_omega_f64": ref["kohn_dipole"]["omega_fit"]}
                if f"breathing_{dim}d" in ref:
                    cmp["breathing_omega_f64"] = \
                        ref[f"breathing_{dim}d"]["omega_fit"]
                    cmp["breathing_omega_delta"] = abs(
                        w_br - ref[f"breathing_{dim}d"]["omega_fit"])
                cmp["kohn_omega_delta"] = abs(
                    w_dip - ref["kohn_dipole"]["omega_fit"])
                cmp["mu_ground_delta"] = abs(
                    float(mu_c) - ref.get("mu_ground", float(mu_c)))
                summary["vs_f64_reference"] = cmp
        except Exception as e:
            print(f"f64 reference embed skipped: {e}")
    print(json.dumps(summary, indent=1), flush=True)
    with open(os.path.join(args.out, out_name), "w") as f:
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
