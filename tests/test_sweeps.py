"""β-sweep (D8) and p-ramp (D12) continuation trainers + CLI smoke."""
import json
from dataclasses import replace

import numpy as np
import pytest

from gpe_tpu.train import GPESpec, train_beta_sweep, train_p_ramp


SMALL = GPESpec(lb=0.0, ub=1.0, n_points=512, layers=(1, 24, 24, 1),
                potential="gaussian", potential_kwargs=(("sigma", 1.0),),
                basis="box", hard_bc=True, kinetic=1.0,
                nonlinearity="abs_power")


def test_beta_sweep_box_gaussian():
    res = train_beta_sweep(SMALL, beta_values=(0.0, 5.0, 10.0), gamma=0.0,
                           modes=(0,), epochs=500, tol=1e-9, patience=10**9,
                           pretrain_epochs=800, check_every=250)
    mus = dict(res.mu_table[0])
    # β=0 is the pure box: μ0 = π² (−Δ convention, L=1 base (n+1)π sine)
    assert abs(mus[0.0] - np.pi**2) < 0.15
    # ramping the positive gaussian bump raises μ monotonically
    assert mus[5.0] > mus[0.0] and mus[10.0] > mus[5.0]
    assert set(res.epochs_history[0]) == {0.0, 5.0, 10.0}
    assert res.training_history[0][5.0]["loss"].size > 0


def test_p_ramp_warm_start():
    spec = GPESpec(lb=-8.0, ub=8.0, n_points=512, layers=(1, 24, 24, 1),
                   potential="harmonic", basis="hermite", kinetic=1.0,
                   nonlinearity="abs_power")
    res = train_p_ramp(spec, p_values=(2.0, 3.0), gamma=3.0, mode=0,
                       epochs=400, tol=1e-9, patience=10**9,
                       pretrain_epochs=800, check_every=200)
    mus = dict(res.mu_table)
    assert set(mus) == {2.0, 3.0}
    for mu in mus.values():
        assert np.isfinite(mu) and mu > 1.0   # repulsive shift above linear μ=1
    assert res.epochs_history[2.0] == 400


@pytest.mark.slow
def test_cli_beta_sweep_smoke(tmp_path, capsys):
    from gpe_tpu.experiments.run import main
    rc = main(["vary_beta_box_gaussian", "--epochs", "60",
               "--betas", "0.0", "0.5", "1.0", "--pretrain", "300",
               "--out", str(tmp_path), "--train"])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{") and "experiment" in l][-1]
    out = json.loads(line)
    assert out["experiment"] == "vary_beta_box_gaussian"
    assert (tmp_path / "vary_beta_box_gaussian" / "bundle.pkl").exists()
    assert (tmp_path / "vary_beta_box_gaussian" / "mu_vs_beta.png").exists()
    assert (tmp_path / "vary_beta_box_gaussian" / "epochs_vs_beta_heatmap.png").exists()


def test_cli_fit_self_adaptive_smoke(tmp_path, capsys):
    from gpe_tpu.experiments.run import main
    rc = main(["harmonic_self_adaptive", "--epochs", "60",
               "--gammas", "0.0", "--out", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert np.isfinite(out["mu"])


def test_cli_list(capsys):
    from gpe_tpu.experiments.run import main
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in ("harmonic_paper", "vary_beta_harmonic", "gpe2d_relobralo",
                 "riesz_mode0", "p_ramp_harmonic"):
        assert name in out


@pytest.mark.slow
def test_cli_helmholtz_smoke(tmp_path, capsys):
    # slow tier: at ~100 s (GN polish compile dominates) this is the default
    # tier's single largest test; the Helmholtz loss/trainer keep default-tier
    # coverage in tests/test_helmholtz.py — this one exercises CLI wiring only
    # --out MUST be a tmp dir: the default writes runs/<name>/summary.json and
    # a 200-epoch smoke would clobber the committed full-run artifact
    from gpe_tpu.experiments.run import main
    # tiny polish budgets: the test exercises CLI wiring, and the full
    # 100/120-step LBFGS+LM polish is ~35 min of CPU CG on its own
    rc = main(["helmholtz_square", "--epochs", "200", "--out", str(tmp_path),
               "--lbfgs-steps", "10", "--lm-steps", "5"])
    assert rc == 0
    out = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert out["experiment"] == "helmholtz_square"
    assert np.isfinite(out["test_mae"])
