"""Seed-statistics machinery (experiments/seed_stats.py): the seed-packed
lane trick and the vmapped hard-BC fallback produce per-seed μ tables with
the documented layout and genuinely independent seeds."""
import numpy as np
import pytest

import jax

from gpe_tpu.experiments.paper_tables import _families
from gpe_tpu.experiments.seed_stats import _train_seeds_vmapped
from gpe_tpu.train.problem import GPESpec


@pytest.mark.slow
def test_vmapped_seed_ramp_pl_and_rebase():
    spec = GPESpec(n_points=512, layers=(1, 24, 24, 1),
                   use_perturbation=True)
    ramp = [0.0, 1.0]
    out = _train_seeds_vmapped(spec, ramp, mode=0, n_seeds=3, base_seed=7,
                               epochs=120, patience=10**9,
                               lr_mode="cosine", rebase=False)
    assert sorted(out) == ramp
    for g in ramp:
        assert len(out[g]) == 3 and np.all(np.isfinite(out[g]))
    # independent seeds → distinct trajectories (μ differs at finite budget)
    assert len({round(m, 8) for m in out[1.0]}) > 1
    # γ=0 harmonic mode 0: every seed lands near the exact μ=1
    assert max(abs(m - 1.0) for m in out[0.0]) < 0.1

    out_r = _train_seeds_vmapped(spec, ramp, mode=0, n_seeds=3, base_seed=7,
                                 epochs=120, patience=10**9,
                                 lr_mode="cosine", rebase=True)
    for g in ramp:
        assert len(out_r[g]) == 3 and np.all(np.isfinite(out_r[g]))


@pytest.mark.slow
def test_packed_seed_lanes_layout():
    # the packed seed trick: modes=[m]*N flattens lanes in ramp order —
    # chunks of N per γ, each lane a distinct seed (train/packed.py lane
    # seed = base_seed + 1000*lane)
    from gpe_tpu.train.packed import train_plpinn_modes_packed

    fam = _families()["p3_harmonic"]
    spec = fam["spec"]
    ramp = [0.0, 0.5]
    res = train_plpinn_modes_packed(spec, ramp, modes=[0, 0], epochs=60,
                                    tol=0.0, patience=10**9, seed=11,
                                    keep_params=False, lr_mode="cosine",
                                    interpret=True, verbose=False)
    flat = res.mu_table[0]
    assert len(flat) == len(ramp) * 2
    for gi, g in enumerate(ramp):
        chunk = flat[gi * 2:(gi + 1) * 2]
        assert all(abs(cg - g) < 1e-9 for cg, _ in chunk)
        assert all(np.isfinite(m) for _, m in chunk)
    # two lanes = two seeds: trajectories differ
    assert flat[0][1] != flat[1][1]
