"""Optimizer-zoo depth tests: true QHAdam, AdaHessian (Hutchinson hvp), and
the extra-args plumbing that lets second-order optimizers (sophia, lbfgs,
adahessian) run inside the compiled fit() loop.

Reference zoo: src/gross_pitaevskii_1D_Different_Optimizers.py:9-12,540-558.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gpe_tpu.models import mlp
from gpe_tpu.train import GPESpec, fit, make_batch, make_loss_fn, make_optimizer
from gpe_tpu.train.optimizers import adahessian, qhadam


def _quadratic(diag):
    d = jnp.asarray(diag)
    return lambda p: 0.5 * jnp.sum(d * p["w"] ** 2)


def test_qhadam_converges_on_quadratic():
    loss = _quadratic([1.0, 10.0, 100.0])
    params = {"w": jnp.asarray([1.0, 1.0, 1.0])}
    opt = qhadam(5e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(400):
        params, state = step(params, state)
    assert float(loss(params)) < 1e-5


def test_qhadam_nu1_recovers_adam_direction():
    # ν₁=ν₂=1 reduces QHAdam's update to Adam's m̂/(√v̂+ε)
    g = {"w": jnp.asarray([0.3, -0.7])}
    p = {"w": jnp.zeros(2)}
    qh = qhadam(1e-3, b1=0.9, b2=0.999, nu1=1.0, nu2=1.0)
    ad = optax.adam(1e-3, b1=0.9, b2=0.999)
    us, ss = qh.init(p), ad.init(p)
    u1, _ = qh.update(g, us, p)
    u2, _ = ad.update(g, ss, p)
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]),
                               rtol=1e-4, atol=1e-8)


def test_adahessian_hutchinson_exact_for_diagonal_hessian():
    # For a diagonal Hessian, z ⊙ (Hz) = diag · z² = diag exactly (z²=1),
    # so after one step v = (1-b2)·diag² regardless of the random key.
    diag = jnp.asarray([2.0, 5.0, 0.5])
    loss = _quadratic(diag)
    params = {"w": jnp.asarray([1.0, -1.0, 2.0])}
    opt = adahessian(1e-1, b2=0.9)
    state = opt.init(params)
    g = jax.grad(loss)(params)
    _, new_state = opt.update(g, state, params, obj_fn=loss,
                              key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(new_state.v["w"]),
                               np.asarray(0.1 * diag ** 2), rtol=1e-5)


def test_adahessian_converges_on_ill_conditioned_quadratic():
    loss = _quadratic([1.0, 1e3])
    params = {"w": jnp.asarray([1.0, 1.0])}
    opt = adahessian(0.3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p, obj_fn=loss, key=k)
        return optax.apply_updates(p, u), s

    key = jax.random.PRNGKey(0)
    for i in range(300):
        params, state = step(params, state, jax.random.fold_in(key, i))
    assert float(loss(params)) < 1e-4


@pytest.mark.parametrize("name", ["sophia", "adahessian", "qhadam"])
def test_second_order_optimizers_run_inside_fit(name):
    """Regression: fit() must supply obj_fn/key extra args — sophia previously
    crashed ('obj_fn must be provided to hutchinson update function')."""
    spec = GPESpec(n_points=256, layers=(1, 16, 16, 1))
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    lr = {"sophia": 1e-3, "adahessian": 1e-3, "qhadam": 1e-3}[name]
    opt = make_optimizer(name, lr, clip_norm=1.0)
    first = float(loss_fn(params, batch, jnp.float32(0.0), jnp.float32(1.0))[0])
    res = fit(loss_fn, opt, params, batch, 0.0, 1.0, epochs=200, tol=0.0,
              patience=10_000, check_every=100)
    assert np.isfinite(res.best_loss)
    assert res.best_loss < first


def test_adahessian_clip_order_preserves_newton_scaling():
    """Regression: clipping BEFORE adahessian shrank updates by the clip
    factor (numerator clipped, Hutchinson denominator not) — with a 1e4-scaled
    loss the update norm collapsed to ~1e-9 and the net froze.
    make_optimizer must clip the preconditioned update AFTER adahessian."""
    loss = lambda p: 1e4 * jnp.sum(p["w"] ** 2)
    params = {"w": jnp.asarray([1.0, -2.0])}
    opt = make_optimizer("adahessian", 1e-2, clip_norm=1.0)
    state = opt.init(params)
    g = jax.grad(loss)(params)   # norm ~4.5e4
    u, _ = opt.update(g, state, params, obj_fn=loss, key=jax.random.PRNGKey(0))
    norm = float(optax.global_norm(u))
    # Newton scaling: m̂/√v̂ ≈ g/|diag| = w (O(1)); scaled by lr, not by 1/4.5e4
    assert norm > 1e-3, f"update norm {norm:.2e} — pre-clip shrinkage is back"


def test_curriculum_accepts_optimizer_name():
    from gpe_tpu.train.curriculum import train_curriculum
    spec = GPESpec(lb=-10.0, ub=10.0, n_points=256, layers=(1, 16, 16, 1),
                   activation="tanh", use_perturbation=True)
    res = train_curriculum(spec, [0.0], epochs=150, check_every=150,
                           optimizer="qhadam")
    assert np.isfinite(res.mu_table[0][1])


def test_reduce_on_plateau_scales_updates_in_fit():
    """Reference D5 ReduceLROnPlateau: under a flat loss the plateau wrapper
    halves the update scale every `patience` steps (stepped on the per-epoch
    loss via fit()'s `value` extra arg)."""
    opt = make_optimizer("adam", 1e-3, plateau=dict(factor=0.5, patience=3))
    opt_x = optax.with_extra_args_support(opt)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    g = {"w": jnp.ones(3)}
    obj = lambda p: jnp.float32(1.0)
    for _ in range(10):
        u, state = opt_x.update(g, state, params, value=jnp.float32(1.0),
                                obj_fn=obj, key=jax.random.PRNGKey(0),
                                grad=g, value_fn=obj)
    # two plateau halvings in 10 flat steps: |update| ≈ lr/4
    assert float(jnp.abs(u["w"][0])) < 0.5 * 1e-3


def test_reduce_on_plateau_inside_fit_runs():
    from gpe_tpu.train.loop import fit
    from gpe_tpu.train.problem import GPESpec, make_batch, make_loss_fn
    from gpe_tpu.models import mlp
    spec = GPESpec(lb=-8.0, ub=8.0, n_points=256, layers=(1, 16, 16, 1),
                   activation="tanh", use_perturbation=False)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0,
                         plateau=dict(factor=0.5, patience=50))
    res = fit(loss_fn, opt, params, batch, 0.0, 1.0, epochs=200,
              check_every=100, tol=0.0, patience=10**9)
    assert np.isfinite(res.best_loss)


def test_lookahead_sync_semantics():
    """k=2, α=0.5 over plain SGD: after the sync step the params must land on
    slow + α·(fast − slow) with the slow copy moved there (hand-computed)."""
    from gpe_tpu.train.optimizers import lookahead
    lr = 0.1
    opt = optax.chain(optax.sgd(lr), lookahead(k=2, alpha=0.5))
    p = {"w": jnp.asarray([1.0])}
    state = opt.init(p)
    g = {"w": jnp.asarray([1.0])}       # constant gradient
    # step 1 (no sync): fast = 1 − 0.1 = 0.9
    u, state = opt.update(g, state, p)
    p = optax.apply_updates(p, u)
    assert np.allclose(p["w"], 0.9)
    # step 2 (sync): fast = 0.8; slow = 1 + 0.5·(0.8−1) = 0.9 → params = 0.9
    u, state = opt.update(g, state, p)
    p = optax.apply_updates(p, u)
    assert np.allclose(p["w"], 0.9)
    # step 3 (no sync): 0.9 − 0.1 = 0.8
    u, state = opt.update(g, state, p)
    p = optax.apply_updates(p, u)
    assert np.allclose(p["w"], 0.8)
    # step 4 (sync): fast 0.7, slow 0.9 + 0.5·(0.7−0.9) = 0.8
    u, state = opt.update(g, state, p)
    p = optax.apply_updates(p, u)
    assert np.allclose(p["w"], 0.8)


def test_pnm_converges_and_alternates_buffers():
    from gpe_tpu.train.optimizers import scale_by_pnm
    loss = _quadratic([1.0, 10.0, 100.0])
    params = {"w": jnp.asarray([1.0, 1.0, 1.0])}
    opt = optax.chain(scale_by_pnm(), optax.scale(-5e-2))
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    params, state = step(params, state)
    pnm_state = state[0]
    # step 1 (odd) touched only the odd buffer
    assert float(jnp.abs(pnm_state.m_odd["w"]).sum()) > 0
    assert float(jnp.abs(pnm_state.m_even["w"]).sum()) == 0.0
    for _ in range(400):
        params, state = step(params, state)
    assert float(loss(params)) < 1e-5


def test_ranger21_full_converges_on_quadratic():
    """Full Ranger21 (centralize→AGC→PNM→wd→warmup lr→lookahead) in one jit
    scan — the exact composition fit() would carry."""
    from gpe_tpu.train.optimizers import ranger21
    loss = _quadratic([1.0, 10.0, 100.0])
    params = {"w": jnp.asarray([1.0, 1.0, 1.0])}
    opt = ranger21(5e-2, warmup_steps=20, weight_decay=0.0, total_steps=600)
    state = opt.init(params)

    def body(c, _):
        p, s = c
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), None

    (params, _), _ = jax.lax.scan(body, (params, state), None, length=600)
    assert float(loss(params)) < 1e-4
