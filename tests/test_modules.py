"""Coverage for previously-untested modules: gauss_newton LM, sobolev_ngd,
shampoo, io round-trips (pickle + orbax), viz plotters, metrics tables."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpe_tpu.models import mlp
from gpe_tpu.train import GPESpec, make_batch, make_optimizer
from gpe_tpu.train.gauss_newton import make_gpe_residual_fn, make_lm_solver
from gpe_tpu.train.shampoo import shampoo
import optax


SPEC = GPESpec(lb=-8.0, ub=8.0, n_points=256, layers=(1, 16, 16, 1),
               potential="harmonic", basis="hermite", kinetic=1.0,
               nonlinearity="abs_power", use_perturbation=True)


def test_lm_solver_beats_adam_floor():
    batch = make_batch(SPEC, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), SPEC.layers)
    residual_fn = make_gpe_residual_fn(SPEC)
    r0 = residual_fn(params, batch, 0.0, 0.01)
    loss0 = float(jnp.sum(r0 * r0))

    # Adam floor with the same budgetless quick run
    from gpe_tpu.train import fit, make_loss_fn
    loss_fn = make_loss_fn(SPEC)
    adam_res = fit(loss_fn, make_optimizer("adam", 1e-3), params, batch, 0.0,
                   0.01, epochs=60, tol=-1.0, patience=10**9, check_every=30)

    lm = make_lm_solver(residual_fn, params, steps=60, cg_iters=40)
    lmres = lm(params, batch, 0.0, 0.01)
    assert lmres.loss < loss0 * 1e-2
    assert lmres.loss < adam_res.best_loss
    assert np.all(np.isfinite(lmres.loss_history))


def test_sobolev_ngd_flows_to_ground_state():
    from gpe_tpu.train.sobolev_ngd import make_sngd_solver
    # explicit flow: stable only while η·(V−μ) < 2 at the domain edge
    # (sobolev_ngd.py docstring) — keep the domain/step inside that envelope
    spec = GPESpec(dim=1, n_points=128, layers=(1, 24, 24, 1), lb=-6.0,
                   ub=6.0, potential="harmonic", basis="hermite", kinetic=1.0,
                   use_perturbation=False, nonlinearity="abs_power")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    from gpe_tpu.train.problem import base_triple
    from gpe_tpu.train import pretrain_to_base
    base = base_triple(spec, 0, batch["x"])
    params, _ = pretrain_to_base(params, batch["x"], np.asarray(base.value),
                                 spec.activation, epochs=800, lbfgs_steps=30)
    solver = make_sngd_solver(spec, outer_steps=150, inner_steps=40, eta=0.05)
    res = solver(params, batch, 0.0)
    assert abs(res.mu - 1.0) < 0.05   # −Δ+x² ground state


def test_shampoo_preconditioner_refresh_and_descent():
    opt = shampoo(learning_rate=0.1, precondition_frequency=3)
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (8, 8))
    target = jax.random.normal(jax.random.PRNGKey(1), (8, 8))
    params = ((W, jnp.zeros(8)),)

    def loss(p):
        return jnp.mean((p[0][0] - target) ** 2) + jnp.mean(p[0][1] ** 2)

    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(40):   # crosses several preconditioner refreshes
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < 0.2 * l0


def test_bundle_roundtrip(tmp_path):
    from gpe_tpu.io import load_bundle, save_bundle
    from gpe_tpu.train.plpinn import PLPINNResult
    params = mlp.init_mlp(jax.random.PRNGKey(0), (1, 8, 1))
    res = PLPINNResult(
        params_by_mode={0: {0.0: params}},
        mu_table={0: [(0.0, 1.0)]},
        training_history={0: {0.0: {"loss": np.arange(3.0), "mu": np.ones(3)}}},
        constant_history={0: 0.5},
        epochs_history={0: {0.0: 3}})
    p = str(tmp_path / "bundle.pkl")
    save_bundle(p, res, SPEC)
    b = load_bundle(p)
    assert b["mu_table"][0][0] == (0.0, 1.0)
    assert b["spec"]["n_points"] == SPEC.n_points
    got = b["params_by_mode"][0][0.0]
    np.testing.assert_allclose(got[0][0], np.asarray(params[0][0]))


def test_params_roundtrip_pickle_and_orbax(tmp_path):
    from gpe_tpu.io import load_params, save_params
    params = mlp.init_mlp(jax.random.PRNGKey(2), (1, 8, 1))
    pkl = str(tmp_path / "p.pkl")
    save_params(pkl, params)
    got = load_params(pkl)
    np.testing.assert_allclose(got[0][0], np.asarray(params[0][0]))
    ckpt_dir = str(tmp_path / "orbax_ckpt")
    try:
        save_params(ckpt_dir, params)
        got2 = load_params(ckpt_dir)
    except Exception as e:   # orbax version quirks shouldn't fail the suite
        pytest.skip(f"orbax unavailable: {e}")
    leaves = jax.tree.leaves(got2)
    np.testing.assert_allclose(leaves[0], np.asarray(params[0][0]))


def test_train_or_load_switch(tmp_path):
    from gpe_tpu.io.checkpoint import train_or_load
    from gpe_tpu.train.plpinn import PLPINNResult
    calls = []

    def train_fn():
        calls.append(1)
        return PLPINNResult({0: {}}, {0: [(0.0, 2.0)]}, {0: {}}, {0: 1.0},
                            {0: {}}), SPEC

    p = str(tmp_path / "b.pkl")
    b1 = train_or_load(p, train_fn)
    b2 = train_or_load(p, train_fn)          # loads, does not retrain
    assert len(calls) == 1
    assert b1["mu_table"] == b2["mu_table"]


def test_viz_plotters_write_files(tmp_path):
    from gpe_tpu import viz
    viz.use_publication_style()
    out = str(tmp_path)
    x = np.linspace(-1, 1, 50)
    u_by = {0: {0.0: np.exp(-x**2), 1.0: np.exp(-2 * x**2)}}
    assert os.path.exists(viz.plot_wavefunctions(x, u_by, out))
    mu_table = {0: [(0.0, 1.0), (1.0, 1.5)], 1: [(0.0, 3.0), (1.0, 3.4)]}
    assert os.path.exists(viz.plot_mu_vs_gamma(mu_table, out, every=1))
    hist = {0: {0.0: {"loss": np.geomspace(1, 1e-5, 40), "mu": np.ones(40)}}}
    assert os.path.exists(viz.plot_loss_history(hist, out))
    eps = {0: {0.0: 100, 1.0: 250}, 1: {0.0: 80, 1.0: 300}}
    assert os.path.exists(viz.plot_epochs_heatmap(eps, out))
    m = {"pl_pinn": np.geomspace(1, 1e-6, 30), "vanilla": np.geomspace(1, 1e-2, 30)}
    assert os.path.exists(viz.plot_method_comparison(m, out))
    assert os.path.exists(viz.plot_mode0_cross_potential(
        {"harmonic": np.geomspace(1, 1e-4, 30), "box": np.geomspace(1, 1e-3, 30)}, out))
    xy = np.random.RandomState(0).uniform(-1, 1, (100, 2))
    u2 = np.exp(-np.sum(xy**2, -1))
    assert os.path.exists(viz.plot_solution_2d(xy, u2, out))


def test_write_error_table(tmp_path):
    from gpe_tpu.utils.metrics import write_error_table
    rows = [{"mode": 0, "method": "pl_pinn", "mu": 1.001, "mu_ref": 1.0},
            {"mode": 0, "method": "vanilla", "mu": 1.08, "mu_ref": 1.0}]
    csv_path, tex_path = write_error_table(rows, str(tmp_path))
    txt = open(csv_path).read()
    assert "abs_error" in txt and "pl_pinn" in txt
    tex = open(tex_path).read()
    assert "tabular" in tex
    # abs errors computed correctly
    import csv as _csv
    rows_read = list(_csv.DictReader(open(csv_path)))
    assert abs(float(rows_read[0]["abs_error"]) - 0.001) < 1e-9


def test_lm_solver_chunk_tail_exact_step_count():
    """steps % chunk != 0: the tail chunk must mask its extra iterations, so
    chunked and unchunked solvers produce IDENTICAL params (advisor r2 #1)."""
    batch = make_batch(SPEC, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(1), SPEC.layers)
    residual_fn = make_gpe_residual_fn(SPEC)
    a = make_lm_solver(residual_fn, params, steps=25, cg_iters=20,
                       chunk=20)(params, batch, 0.0, 0.01)
    b = make_lm_solver(residual_fn, params, steps=25, cg_iters=20,
                       chunk=25)(params, batch, 0.0, 0.01)
    assert a.loss_history.shape == b.loss_history.shape == (25,)
    np.testing.assert_allclose(a.loss, b.loss, rtol=1e-6)
    for (wa, ba_), (wb, bb_) in zip(a.params, b.params):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
        np.testing.assert_array_equal(np.asarray(ba_), np.asarray(bb_))
