"""Loss-layer unification: weighting strategies, Riesz objective, anti-trivial
regularizers, ReLoBRaLo — all reachable from GPESpec / trainers (C5, C9-C12)."""
import jax
import jax.numpy as jnp
import numpy as np
from dataclasses import replace

from gpe_tpu.train import GPESpec, fit, make_batch, make_loss_fn, make_optimizer
from gpe_tpu.train.balanced import fit_relobralo
from gpe_tpu.train.problem import init_params, make_terms_fn, net_params


SPEC = GPESpec(lb=-8.0, ub=8.0, n_points=512, layers=(1, 24, 24, 1),
               potential="harmonic", basis="hermite", kinetic=1.0,
               nonlinearity="abs_power", use_perturbation=True)


def _setup(spec, mode=0, seed=0):
    batch = make_batch(spec, mode)
    params = init_params(spec, jax.random.PRNGKey(seed))
    return batch, params


def test_fixed_weighting_total_matches_terms():
    spec = SPEC
    batch, params = _setup(spec)
    total, aux = make_loss_fn(spec)(params, batch, 1.0, 0.01)
    want = aux["pde"] + 10.0 * aux["boundary"] + 20.0 * aux["norm"]
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)


def test_riesz_equals_mu_for_linear_normalized():
    # at γ=0 the normalized Riesz energy IS the Rayleigh quotient of the
    # linear Hamiltonian: with the exact Hermite base (scale→0) both must
    # equal the analytic eigenvalue 2n+1 (−Δ+x² convention)
    spec = replace(SPEC, riesz_weight=1.0)
    batch, params = _setup(spec)
    _, aux = make_loss_fn(spec)(params, batch, 0.0, 0.0)
    assert abs(float(aux["riesz"]) - float(aux["mu"])) < 1e-4
    assert abs(float(aux["mu"]) - 1.0) < 1e-4


def test_riesz_objective_trains_mode0():
    spec = replace(SPEC, objective="riesz", bc_weight=10.0, norm_weight=20.0)
    batch, params = _setup(spec)
    loss_fn = make_loss_fn(spec)
    t0, aux0 = loss_fn(params, batch, 5.0, 0.01)
    assert "riesz" in aux0
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    res = fit(loss_fn, opt, params, batch, 5.0, 0.01, epochs=600, tol=-1.0,
              patience=10**9, check_every=200)
    assert res.best_loss < float(t0)
    # repulsive interaction raises μ above the linear value
    assert res.mu > 1.0


def test_anti_trivial_terms_active():
    spec = replace(SPEC, anti_trivial=True, anti_trivial_weight=0.5)
    batch, params = _setup(spec)
    total, aux = make_loss_fn(spec)(params, batch, 1.0, 0.01)
    for k in ("reg_f", "reg_lambda", "reg_drive"):
        assert k in aux and np.isfinite(float(aux[k]))
    base = aux["pde"] + 10 * aux["boundary"] + 20 * aux["norm"]
    want = base + 0.5 * (aux["reg_f"] + aux["reg_lambda"] + aux["reg_drive"])
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)


def test_self_adaptive_weights_ascend():
    spec = replace(SPEC, weighting="self_adaptive")
    batch, params = _setup(spec)
    assert "log_alpha" in params and "net" in params
    loss_fn = make_loss_fn(spec)
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    res = fit(loss_fn, opt, params, batch, 1.0, 0.01, epochs=400, tol=-1.0,
              patience=10**9, check_every=200)
    la = res.final_params["log_alpha"]
    moved = [abs(float(v)) for v in la.values()]
    assert max(moved) > 1e-3, "self-adaptive log-weights did not move"
    # ascent semantics: positive losses push weights UP, not to -inf
    assert all(float(v) > -0.5 for v in la.values())
    assert float(la["pde"]) > 0.0


def test_relobralo_balances_and_converges():
    spec = replace(SPEC, use_perturbation=False, bc_weight=10.0,
                   norm_weight=20.0)
    batch, params = _setup(spec)
    res = fit_relobralo(spec, params, batch, 0.0, scale=1.0, epochs=800,
                        lr=2e-3, seed=0)
    assert res.lambda_history.shape == (800, len(res.term_names))
    # λ must actually rebalance away from the all-ones init
    assert np.abs(res.lambda_history[-1] - 1.0).max() > 1e-3
    assert res.loss_history[-1] < res.loss_history[0]
    assert np.isfinite(res.mu)


def test_net_params_passthrough():
    spec = SPEC
    _, params = _setup(spec)
    assert net_params(params) is params
    spec_sa = replace(SPEC, weighting="self_adaptive")
    _, params_sa = _setup(spec_sa)
    assert net_params(params_sa) is params_sa["net"]


def test_l2_norm_style():
    spec = replace(SPEC, norm_style="l2")
    batch, params = _setup(spec)
    terms = make_terms_fn(spec)(net_params(params), batch, 0.0, 0.01)
    u = terms.u
    want = (jnp.sqrt(jnp.sum(u * u)) - 1.0) ** 2
    np.testing.assert_allclose(float(terms.losses["norm"]), float(want),
                               rtol=1e-6)


def test_symmetry_term_even_mode():
    spec = replace(SPEC, symmetry="even", sym_weight=5.0)
    batch, params = _setup(spec)
    total, aux = make_loss_fn(spec)(params, batch, 0.0, 0.01)
    assert "sym" in aux
    # mode 0 base is even; with a tiny perturbation the sym loss is small
    assert float(aux["sym"]) < 1e-2


def test_width_penalty_term():
    spec = replace(SPEC, width_weight=0.5)
    batch, params = _setup(spec)
    total, aux = make_loss_fn(spec)(params, batch, 2.0, 0.01)
    assert "width" in aux and float(aux["width"]) < 0.0   # reward, not cost
    base = aux["pde"] + 10 * aux["boundary"] + 20 * aux["norm"]
    np.testing.assert_allclose(float(total), float(base + 0.5 * aux["width"]),
                               rtol=1e-6)


def test_mu_report_shift_only_affects_reported_mu():
    """C3 old-notebook quirk: λ+mode is REPORTED while the residual uses the
    unshifted Rayleigh quotient (Gross_Pitaevskii_1D_Harmonic.ipynb cell 6)."""
    import jax
    import jax.numpy as jnp
    from gpe_tpu.models import mlp
    from gpe_tpu.train.problem import GPESpec, make_batch, make_loss_fn
    base = dict(lb=-8.0, ub=8.0, n_points=256, layers=(1, 16, 16, 1),
                activation="tanh", use_perturbation=False)
    s0 = GPESpec(**base)
    s2 = GPESpec(mu_report_shift=2.0, **base)
    batch = make_batch(s0, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), s0.layers)
    t0, a0 = make_loss_fn(s0)(params, batch, jnp.float32(1.0), jnp.float32(1.0))
    t2, a2 = make_loss_fn(s2)(params, batch, jnp.float32(1.0), jnp.float32(1.0))
    assert abs(float(a2["mu"]) - float(a0["mu"]) - 2.0) < 1e-6
    assert abs(float(t2) - float(t0)) < 1e-7   # loss itself unshifted
