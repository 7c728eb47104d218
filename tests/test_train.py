"""Training-stack tests: schedules, loop semantics, eigenvalue recovery."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.models import mlp
from gpe_tpu.train import (GPESpec, cosine_warm_restarts, fit, make_batch,
                           make_loss_fn, make_optimizer, pretrain_to_base,
                           train_plpinn)
from gpe_tpu.train.problem import base_triple


def test_cosine_warm_restarts_schedule():
    s = cosine_warm_restarts(1e-3, T_0=200, T_mult=2, eta_min=1e-6)
    assert float(s(jnp.asarray(0))) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(jnp.asarray(199))) == pytest.approx(1e-6, abs=1e-6)
    # restarts at 200 and 600 (T_mult=2)
    assert float(s(jnp.asarray(200))) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(jnp.asarray(600))) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(jnp.asarray(400))) < 6e-4


def test_optimizer_zoo_builds_and_steps():
    params = mlp.init_mlp(jax.random.PRNGKey(0), [1, 8, 1])
    x = jnp.linspace(-1, 1, 32)[:, None]

    def loss(p):
        return jnp.mean(mlp.mlp_apply(p, x) ** 2)

    for name in ["adam", "adamw", "adabelief", "rmsprop", "sgd", "shampoo"]:
        opt = make_optimizer(name, 1e-3, clip_norm=1.0)
        state = opt.init(params)
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        import optax
        new = optax.apply_updates(params, updates)
        assert np.isfinite(float(loss(new)))


def test_pretrain_fits_base():
    spec = GPESpec(n_points=512)
    batch = make_batch(spec, 0)
    target = np.asarray(base_triple(spec, 0, batch["x"]).value)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    params, mse = pretrain_to_base(params, batch["x"], target, spec.activation,
                                   epochs=600, lbfgs_steps=30)
    assert mse < 1e-4


def test_fit_early_stops_and_restores_best():
    spec = GPESpec(n_points=512, layers=(1, 32, 32, 1))
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    target = np.asarray(base_triple(spec, 0, batch["x"]).value)
    params, _ = pretrain_to_base(params, batch["x"], target, spec.activation,
                                 epochs=400, lbfgs_steps=20)
    scale = 0.01 / float(jnp.max(mlp.mlp_apply(params, batch["x"], spec.activation)))
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    res = fit(loss_fn, opt, params, batch, gamma=0.0, scale=scale,
              epochs=2000, tol=1e-4, patience=500, check_every=256)
    assert res.epochs_run <= 2000
    # best params achieve the reported best loss
    total, _ = loss_fn(res.params, batch, jnp.float32(0.0), jnp.float32(scale))
    assert float(total) <= res.best_loss * 1.01 + 1e-8
    assert res.loss_history.shape[0] == max(res.epochs_run, 1)


@pytest.mark.slow
def test_plpinn_linear_eigenvalue_recovery():
    """BASELINE config #1 oracle: γ=0 harmonic, μ must recover the exact linear
    eigenvalue 2n+1 (−Δ+x² convention) to ~1e-3."""
    spec = GPESpec(n_points=1500)
    res = train_plpinn(spec, gamma_values=[0.0], modes=[0], epochs=2500,
                       tol=1e-5, pretrain_epochs=1200, check_every=500)
    mu = res.mu_table[0][0][1]
    assert abs(mu - 1.0) < 2e-3


@pytest.mark.slow
def test_plpinn_continuation_two_steps():
    """γ continuation 0 → 1: μ must increase (repulsive interaction) and stay
    near the linear value for small γ."""
    spec = GPESpec(n_points=1024, layers=(1, 32, 32, 32, 1))
    res = train_plpinn(spec, gamma_values=[0.0, 1.0], modes=[0], epochs=1500,
                       tol=1e-5, pretrain_epochs=1000, check_every=500)
    mu0 = res.mu_table[0][0][1]
    mu1 = res.mu_table[0][1][1]
    assert abs(mu0 - 1.0) < 5e-3
    assert mu1 > mu0
    assert mu1 < 2.0


def test_scale_by_loss_as_step_matches_schedule_at_loss():
    """Bug-faithful scheduler.step(loss): the applied LR is the warm-restart
    schedule evaluated at the LOSS value, and with loss ~ 0 it pins at
    base_lr (the reference's effective behavior)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gpe_tpu.train.schedules import (cosine_warm_restarts,
                                         scale_by_loss_as_step)
    sched = cosine_warm_restarts(1e-3, T_0=200, T_mult=2, eta_min=1e-6)
    t = scale_by_loss_as_step(sched)
    state = t.init({"w": jnp.zeros(2)})
    g = {"w": jnp.ones(2)}
    for loss in (0.0, 1e-5, 50.0, 150.0):
        u, _ = t.update(g, state, value=jnp.float32(loss))
        lr_expect = float(sched(jnp.float32(loss)))
        np.testing.assert_allclose(float(-u["w"][0]), lr_expect, rtol=1e-6)
    # loss << T_0 -> effectively max LR
    u, _ = t.update(g, state, value=jnp.float32(1e-4))
    assert abs(float(-u["w"][0]) - 1e-3) < 1e-6


def test_pretrain_sobolev_improves_derivative_fit():
    """H1 distillation (value + analytic-jacobian supervision) must beat the
    value-only distill on derivative accuracy at equal budget — the lever
    behind the config-matched vortex rows (rotating/problem.py sobolev=)."""
    from gpe_tpu.train.pretrain import pretrain_sobolev, pretrain_to_base

    n = 32
    x1 = np.linspace(-3, 3, n)
    X, Y = np.meshgrid(x1, x1, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], -1).astype(np.float32)
    e = np.exp(-(X**2 + Y**2) / 4)
    tval = np.stack([(np.sin(X) * np.cos(Y)).ravel(),
                     (X * Y * e).ravel()], -1).astype(np.float32)
    tjac = np.empty((n * n, 2, 2), np.float32)
    tjac[:, 0, 0] = (np.cos(X) * np.cos(Y)).ravel()
    tjac[:, 1, 0] = (-np.sin(X) * np.sin(Y)).ravel()
    tjac[:, 0, 1] = (Y * e * (1 - X**2 / 2)).ravel()
    tjac[:, 1, 1] = (X * e * (1 - Y**2 / 2)).ravel()

    p0 = mlp.init_mlp(jax.random.PRNGKey(0), (2, 32, 32, 2))
    pS, lossS = pretrain_sobolev(p0, pts, tval, tjac, "tanh", epochs=800,
                                 lbfgs_steps=60)
    pV, _ = pretrain_to_base(p0, pts, tval, "tanh", epochs=800,
                             lbfgs_steps=60)

    def jac_mse(p):
        nn = mlp.mlp_vgl(p, jnp.asarray(pts), "tanh")
        return float(jnp.mean((nn.grad - tjac) ** 2))

    assert np.isfinite(lossS)
    assert jac_mse(pS) < 0.8 * jac_mse(pV), (jac_mse(pS), jac_mse(pV))
