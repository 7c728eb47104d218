"""Excited states via deflation/orthogonality (BASELINE config #5, part 1):
the eigenstate ladder recovered from PURE random init — no analytic bases."""
import numpy as np
import pytest

from gpe_tpu.train import GPESpec
from gpe_tpu.train.deflation import train_deflation


SPEC = GPESpec(lb=-8.0, ub=8.0, n_points=512, layers=(1, 32, 32, 1),
               potential="harmonic", kinetic=1.0, nonlinearity="abs_power",
               activation="tanh", bc_weight=10.0, norm_weight=20.0,
               objective="riesz")


@pytest.mark.slow
def test_deflation_linear_ladder():
    res = train_deflation(SPEC, 0.0, n_modes=3, epochs=6000, lr=1e-3,
                          orth_weight=500.0, polish_steps=60)
    mus = [m for _, m in res.mu_table]
    for n, mu in enumerate(mus):
        assert abs(mu - (2 * n + 1)) < 8e-3       # −Δ+x²: μₙ = 2n+1
    # converged states are mutually orthonormal on the quadrature grid
    S = res.states
    w = (16.0 / 511)
    G = S @ S.T * w
    np.testing.assert_allclose(G, np.eye(3), atol=5e-2)


@pytest.mark.slow
def test_deflation_interacting_vs_newton_oracle():
    from gpe_tpu.validate.fdm import solve_gpe_excited_1d
    res = train_deflation(SPEC, 10.0, n_modes=2, epochs=6000, lr=1e-3,
                          orth_weight=500.0, polish_steps=60)
    x = np.linspace(-8, 8, 2000)
    for n, (_, mu) in enumerate(res.mu_table):
        ref, _ = solve_gpe_excited_1d(x * x, x[1] - x[0], 10.0, n)
        assert abs(mu - ref) < 2e-3


@pytest.mark.slow
def test_deflation_2d_degenerate_doublet():
    # 2D −½Δ+½r²: spectrum 1, 2, 2 — deflation must resolve the DEGENERATE
    # first-excited doublet as two orthogonal states at the same μ
    spec = GPESpec(dim=2, lb=-6.0, ub=6.0, n_points=40, layers=(2, 32, 32, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, nonlinearity="abs_power", activation="tanh",
                   bc_weight=10.0, norm_weight=20.0, objective="riesz")
    res = train_deflation(spec, 0.0, n_modes=3, epochs=4000, lr=1e-3,
                          orth_weight=500.0, polish_steps=40)
    mus = [m for _, m in res.mu_table]
    assert abs(mus[0] - 1.0) < 2e-2
    assert abs(mus[1] - 2.0) < 5e-2
    assert abs(mus[2] - 2.0) < 5e-2
    # the doublet states stay approximately orthogonal (the LM polish has no
    # orthogonality constraint, and any rotation within a DEGENERATE subspace
    # is also a residual minimum, so modest mixing is expected)
    S = res.states
    w = (12.0 / 39) ** 2
    assert abs(float((S[1] * S[2]).sum()) * w) < 0.2
