"""Probe: why does the complex64 breathing (quench) trajectory blow up?

The on-chip f32 TDGPE run (runs/gpe_dynamics dyn2d stage, 2026-08-20) shows
the Kohn arm clean (ω err 6e-7) but the γ→1.3γ quench arm exploding
(energy drift 58×) at the flagship protocol dt=4.19e-3 — which sits at
0.75× the split-step parametric-resonance threshold π/(c·k_max²)
(dynamics/split_step.py docstring; breathing_sweep_1d note). Hypothesis:
the resonance pumps the HIGH-K NOISE FLOOR, which is 1e-16 in f64 (nothing
visible in 4 trap periods) but ~1e-7 in f32 — so the same dt that is safe
in f64 explodes in f32.

This probe reproduces the blowup on the CPU FFT engine in complex64 (same
physics, no TPU claim needed) and measures the energy-drift growth rate vs
dt/threshold: if the drift collapses by orders of magnitude once dt drops
below ~0.5× threshold, the fix is a steps bump (dt margin), not an engine
bug. Writes runs/probe_f32_breathing/summary.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "runs/probe_f32_breathing"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gpe_tpu.dynamics import evolve, ground_state

    n, half, gam, quench = 256, 12.0, 100.0, 1.3
    x1 = np.linspace(-half, half, n, endpoint=False)
    dx = float(x1[1] - x1[0])
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    V = 0.5 * (X ** 2 + Y ** 2)
    kmax2 = 2.0 * (np.pi / dx) ** 2          # 2D: k²_max = kx²+ky² corners
    dt_res_corner = np.pi / (0.5 * kmax2)
    dt_res_axis = np.pi / (0.5 * (np.pi / dx) ** 2)

    t0 = time.time()
    # complex64 ground state (matches the on-chip run's noise floor)
    mu_c, psi_c = ground_state(V, dx, gam, tau=2e-3, steps=12000, tol=1e-9)
    print(json.dumps({"stage": "gs", "mu": float(mu_c),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)

    t_end = 4.0 * 2.0 * np.pi
    rows = []
    for steps in (6000, 9000, 12000, 18000, 24000):
        dt = t_end / steps
        rec = max(1, steps // 400)
        t1 = time.time()
        _, obs = evolve(np.asarray(psi_c), V, dx, dt, steps, quench * gam,
                        bc="periodic", lb=float(x1[0]), record_every=rec)
        e = np.asarray(obs["energy"])
        w2 = np.asarray(obs["width_sq"]).sum(1)
        # crude ω fit to sidestep importing the experiment: FFT peak
        t = np.asarray(obs["t"])
        yc = w2 - w2.mean()
        freqs = np.fft.rfftfreq(t.size, d=t[1] - t[0]) * 2 * np.pi
        w_fit = float(freqs[np.argmax(np.abs(np.fft.rfft(yc))[1:]) + 1])
        rows.append({
            "steps": steps, "dt": dt,
            "dt_over_axis_threshold": dt / dt_res_axis,
            "dt_over_corner_threshold": dt / dt_res_corner,
            "energy_drift_rel": float(np.max(np.abs(e / e[0] - 1.0))),
            "norm_drift": float(np.max(np.abs(np.asarray(obs["norm"]) - 1))),
            "omega_fft_peak": w_fit,
            "wall_s": round(time.time() - t1, 1)})
        print(json.dumps(rows[-1]), flush=True)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump({"config": "complex64 CPU FFT engine, 256² γ=100 quench "
                             "×1.3, 4 trap periods, dt sweep",
                   "dt_res_axis": dt_res_axis,
                   "dt_res_corner": dt_res_corner,
                   "mu_ground_c64": float(mu_c),
                   "rows": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
