"""Sharded loss/step vs single-device reference on the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.models import mlp
from gpe_tpu.parallel import make_mesh, make_parallel_loss, make_parallel_step, shard_batch
from gpe_tpu.train import GPESpec, make_batch, make_loss_fn, make_optimizer


def _setup(n_points=512, dim=1):
    spec = GPESpec(n_points=n_points, dim=dim, layers=(dim, 16, 16, 1))
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    return spec, batch, loss_fn, params


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_parallel_loss_matches_single_device():
    spec, batch, loss_fn, params = _setup()
    mesh = make_mesh(8)
    sbatch = shard_batch(batch, mesh)
    ploss = make_parallel_loss(loss_fn, mesh, batch)

    t_ref, aux_ref = loss_fn(params, batch, jnp.float32(1.0), jnp.float32(0.01))
    t_par, aux_par = ploss(params, sbatch, jnp.float32(1.0), jnp.float32(0.01))
    np.testing.assert_allclose(float(t_par), float(t_ref), rtol=1e-5)
    np.testing.assert_allclose(float(aux_par["mu"]), float(aux_ref["mu"]), rtol=1e-5)


def test_parallel_step_matches_single_device():
    spec, batch, loss_fn, params = _setup()
    mesh = make_mesh(8)
    sbatch = shard_batch(batch, mesh)
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    pstep = make_parallel_step(loss_fn, opt, mesh, batch)

    import optax

    @jax.jit
    def ref_step(p, s, b, g, sc):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b, g, sc)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, total

    s0 = opt.init(params)
    p_par, _, t_par, _ = pstep(params, s0, sbatch, jnp.float32(0.5), jnp.float32(0.01))
    p_ref, _, t_ref = ref_step(params, s0, batch, jnp.float32(0.5), jnp.float32(0.01))
    np.testing.assert_allclose(float(t_par), float(t_ref), rtol=1e-5)
    for (wp, bp), (wr, br) in zip(p_par, p_ref):
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wr), rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_parallel_2d():
    spec, batch, loss_fn, params = _setup(n_points=24, dim=2)  # 576 pts, 576%8==0
    mesh = make_mesh(8)
    sbatch = shard_batch(batch, mesh)
    ploss = make_parallel_loss(loss_fn, mesh, batch)
    t_ref, _ = loss_fn(params, batch, jnp.float32(10.0), jnp.float32(0.01))
    t_par, _ = ploss(params, sbatch, jnp.float32(10.0), jnp.float32(0.01))
    np.testing.assert_allclose(float(t_par), float(t_ref), rtol=1e-5)


def test_initialize_multihost_single_process_noop():
    from gpe_tpu.parallel import initialize_multihost
    # no coordinator configured on this machine -> graceful single-host no-op
    assert initialize_multihost() is False


def test_ensemble_sharding_matches_vmap():
    """Device-sharded ensemble step == plain vmap step (8 runs on 8 devices)."""
    import jax.numpy as jnp
    import optax
    from gpe_tpu.models import mlp
    from gpe_tpu.parallel import make_ensemble_step, make_mesh, shard_ensemble
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn

    spec = GPESpec(lb=-6.0, ub=6.0, n_points=256, layers=(1, 8, 8, 1),
                   potential="harmonic", basis="hermite",
                   nonlinearity="abs_power", use_perturbation=False)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    R = 8
    params_list = [mlp.init_mlp(jax.random.PRNGKey(s), spec.layers)
                   for s in range(R)]
    params_b = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    opt = optax.adam(1e-3)
    opt_b = jax.vmap(opt.init)(params_b)
    scales = jnp.linspace(0.5, 1.2, R)
    gamma = jnp.float32(1.0)

    # reference: plain vmap on one device
    def one(p, s, sc):
        (t, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, gamma, sc)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, t, aux["mu"]
    ref_p, _, ref_t, ref_mu = jax.vmap(one, in_axes=(0, 0, 0))(params_b, opt_b, scales)

    mesh = make_mesh(8, axis="ens")
    step = make_ensemble_step(loss_fn, opt, mesh)
    sp = shard_ensemble(params_b, mesh)
    so = shard_ensemble(opt_b, mesh)
    got_p, _, got_t, got_mu = step(sp, so, batch, gamma,
                                   shard_ensemble(scales, mesh))
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mu), np.asarray(ref_mu), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(got_p)[0]),
                               np.asarray(jax.tree.leaves(ref_p)[0]), rtol=1e-5)


def test_full_fit_loop_under_collocation_sharding():
    """The ENTIRE production trainer (chunked scan, early stop, best-restore)
    runs with the loss under shard_map — fit() composes with
    make_parallel_loss unchanged, and matches the single-device run."""
    import jax.numpy as jnp
    from gpe_tpu.models import mlp
    from gpe_tpu.parallel import make_mesh, make_parallel_loss, shard_batch
    from gpe_tpu.train import GPESpec, fit, make_batch, make_loss_fn, make_optimizer

    spec = GPESpec(lb=-6.0, ub=6.0, n_points=512, layers=(1, 12, 12, 1),
                   potential="harmonic", basis="hermite",
                   nonlinearity="abs_power", use_perturbation=False)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    kw = dict(epochs=120, tol=-1.0, patience=10**9, check_every=60)

    ref = fit(loss_fn, opt, params, batch, 1.0, 1.0, **kw)

    mesh = make_mesh(8)
    sbatch = shard_batch(batch, mesh)
    sharded_loss = make_parallel_loss(loss_fn, mesh, batch)
    got = fit(sharded_loss, opt, params, sbatch, 1.0, 1.0, **kw)

    np.testing.assert_allclose(got.mu_best, ref.mu_best, rtol=1e-4)
    np.testing.assert_allclose(got.best_loss, ref.best_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(got.params)[0]),
                               np.asarray(jax.tree.leaves(ref.params)[0]),
                               rtol=2e-4, atol=1e-6)


def test_fit_mesh_option_matches_single_device():
    """fit(mesh=...) — the production trainer's own sharding switch — matches
    the single-device trajectory (loss, μ, params) on the 8-device mesh."""
    from gpe_tpu.models import mlp
    from gpe_tpu.parallel import make_mesh
    from gpe_tpu.train import GPESpec, fit, make_batch, make_loss_fn, make_optimizer

    spec = GPESpec(lb=-6.0, ub=6.0, n_points=512, layers=(1, 12, 12, 1),
                   potential="harmonic", basis="hermite",
                   nonlinearity="abs_power", use_perturbation=True)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    kw = dict(epochs=150, tol=-1.0, patience=10**9, check_every=64)

    ref = fit(loss_fn, opt, params, batch, 1.0, 0.01, **kw)
    got = fit(loss_fn, opt, params, batch, 1.0, 0.01, mesh=make_mesh(8), **kw)

    np.testing.assert_allclose(got.loss_history, ref.loss_history,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(got.mu_history, ref.mu_history, rtol=1e-4)
    np.testing.assert_allclose(got.mu_best, ref.mu_best, rtol=1e-4)
    for (wp, bp), (wr, br) in zip(got.params, ref.params):
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wr),
                                   rtol=2e-4, atol=1e-6)


def test_fit_mesh_early_stop_and_second_order_extra_args():
    """Early-stop carry and optimizer extra-args (sophia's obj_fn closure)
    both work when the loss — and hence the closure — runs under shard_map."""
    from gpe_tpu.models import mlp
    from gpe_tpu.parallel import make_mesh
    from gpe_tpu.train import GPESpec, fit, make_batch, make_loss_fn, make_optimizer

    spec = GPESpec(lb=-6.0, ub=6.0, n_points=512, layers=(1, 12, 12, 1),
                   potential="harmonic", basis="hermite",
                   nonlinearity="abs_power", use_perturbation=True)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    opt = make_optimizer("sophia", 1e-4)
    res = fit(loss_fn, opt, params, batch, 0.0, 0.01, epochs=400,
              tol=1e30, patience=10**9, check_every=100, mesh=make_mesh(8))
    # tol=1e30 -> stops in the first chunk with the early-stop machinery
    assert res.epochs_run <= 100
    assert np.isfinite(res.best_loss)


def test_fit_ensemble_mesh_matches_unsharded():
    from gpe_tpu.models import mlp
    from gpe_tpu.parallel import make_mesh
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn, make_optimizer
    from gpe_tpu.train.loop import fit_ensemble

    spec = GPESpec(lb=-6.0, ub=6.0, n_points=256, layers=(1, 8, 8, 1),
                   potential="harmonic", basis="hermite",
                   nonlinearity="abs_power", use_perturbation=False)
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    R = 8
    params_b = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[mlp.init_mlp(jax.random.PRNGKey(s), spec.layers) for s in range(R)])
    opt = make_optimizer("adam", 1e-3, clip_norm=1.0)
    kw = dict(epochs=120, tol=-1.0, patience=10**9, check_every=60)

    ref = fit_ensemble(loss_fn, opt, params_b, batch, 1.0, 1.0, **kw)
    got = fit_ensemble(loss_fn, opt, params_b, batch, 1.0, 1.0,
                       mesh=make_mesh(8, axis="ens"), **kw)
    # different GSPMD layouts reorder f32 reductions; tiny per-step noise
    # amplifies along the trajectory — tolerances sized accordingly
    np.testing.assert_allclose(got.loss_history, ref.loss_history,
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(got.mu, ref.mu, rtol=5e-3)


def test_train_plpinn_sharded_ramp():
    """The full PL-PINN continuation trainer (pretrain, q-scaling, warm start,
    early stop) over a 2-step γ ramp on the 8-device mesh ≈ single device."""
    from gpe_tpu.parallel import make_mesh
    from gpe_tpu.train import GPESpec, train_plpinn

    spec = GPESpec(lb=-8.0, ub=8.0, n_points=512, layers=(1, 16, 16, 1),
                   activation="tanh", potential="harmonic", basis="hermite",
                   nonlinearity="power", use_perturbation=True)
    kw = dict(gamma_values=[0.0, 1.0], modes=(0,), epochs=600, tol=1e-6,
              patience=10**9, pretrain_epochs=500, check_every=300, seed=3)
    ref = train_plpinn(spec, **kw)
    got = train_plpinn(spec, mesh=make_mesh(8), **kw)
    for (g_r, mu_r), (g_s, mu_s) in zip(ref.mu_table[0], got.mu_table[0]):
        assert g_r == g_s
        np.testing.assert_allclose(mu_s, mu_r, rtol=5e-4)
