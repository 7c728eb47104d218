"""Lane-packing (pallas/packing.py + n_runs kernels): packed ensembles must
be exactly M independent runs — per-run losses/μ/grads match the unpacked
kernels and the off-diagonal (cross-run) gradient blocks are exactly zero."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.models import mlp
from gpe_tpu.pallas.fused_grad import make_pallas_value_and_grad
from gpe_tpu.pallas.fused_residual import make_pallas_loss_eval
from gpe_tpu.pallas.packing import (block_masks, pack_params, packable_runs,
                                    packed_layers, unpack_params)

LAYERS = (1, 64, 64, 64, 1)
KW = dict(activation="shifted_tanh", p=3.0, nonlinearity="power",
          tile=256, sum_tile=256, interpret=True)


def _mk(R, layers=LAYERS, n=512, seed=0):
    pb = jax.vmap(lambda k: mlp.init_mlp(k, layers, "xavier_uniform"))(
        jax.random.split(jax.random.PRNGKey(seed), R))
    x = jnp.linspace(-5.0, 5.0, n).reshape(-1, 1)
    batch = dict(x=x, V=0.5 * x[:, 0] ** 2, w=jnp.full((n,), 10.0 / n),
                 bx=jnp.array([[-5.0], [5.0]]),
                 base_val=jnp.sin(x[:, 0]), base_lap=-jnp.sin(x[:, 0]),
                 base_bval=jnp.zeros(2))
    return pb, batch


def test_packable_runs():
    assert packable_runs((1, 64, 64, 64, 1)) == 2
    assert packable_runs((1, 32, 32, 1)) == 4
    assert packable_runs((2, 100, 100, 100, 1)) == 1   # 100-wide: no packing
    assert packable_runs((1, 64, 32, 1)) == 1          # non-uniform hidden
    assert packed_layers((1, 64, 64, 64, 1), 2) == (1, 128, 128, 128, 2)


def test_pack_unpack_roundtrip():
    pb, _ = _mk(4)
    rt = unpack_params(pack_params(pb, 2), LAYERS, 2)
    for (w, b), (w0, b0) in zip(rt, pb):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(w0))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(b0))


def test_packed_eval_matches_per_run():
    pb, batch = _mk(2)
    gammas = jnp.array([1.0, 2.5])
    scales = jnp.array([0.01, 0.02])
    ev1 = make_pallas_loss_eval(LAYERS, **{k: v for k, v in KW.items()
                                           if k != "sum_tile"})
    evM = make_pallas_loss_eval(LAYERS, n_runs=2,
                                **{k: v for k, v in KW.items()
                                   if k != "sum_tile"})
    p_u = jax.tree.map(lambda a: a[0], pack_params(pb, 2))
    tM, auxM = evM(p_u, batch, gammas, scales)
    for r in range(2):
        p_r = jax.tree.map(lambda a: a[r], pb)
        t, aux = ev1(p_r, batch, gammas[r], scales[r])
        np.testing.assert_allclose(float(tM[r]), float(t), rtol=1e-6)
        np.testing.assert_allclose(float(auxM["mu"][r]), float(aux["mu"]),
                                   rtol=1e-6)


def test_packed_grads_match_per_run_and_mask_off_diag():
    pb, batch = _mk(2)
    gammas = jnp.array([1.0, 2.5])
    scales = jnp.array([0.01, 0.02])
    vag1 = make_pallas_value_and_grad(LAYERS, **KW)
    vagM = make_pallas_value_and_grad(LAYERS, n_runs=2, **KW)
    p_u = jax.tree.map(lambda a: a[0], pack_params(pb, 2))
    (tM, auxM), gM = vagM(p_u, batch, gammas, scales)
    g_runs = unpack_params(jax.tree.map(lambda a: a[None], gM), LAYERS, 2)
    for r in range(2):
        p_r = jax.tree.map(lambda a: a[r], pb)
        (t, _), g = vag1(p_r, batch, gammas[r], scales[r])
        np.testing.assert_allclose(float(tM[r]), float(t), rtol=1e-6)
        for li in range(len(LAYERS) - 1):
            np.testing.assert_allclose(np.asarray(g_runs[li][0][r]),
                                       np.asarray(g[li][0]),
                                       rtol=1e-5, atol=1e-8)
            np.testing.assert_allclose(np.asarray(g_runs[li][1][r]),
                                       np.asarray(g[li][1]),
                                       rtol=1e-5, atol=1e-8)
    for (Wm, _), (gw, _) in zip(block_masks(LAYERS, 2), gM):
        off = np.asarray(gw) * (1.0 - np.asarray(Wm))
        assert np.all(off == 0.0)


def test_packed_relaxed_mode_m4():
    layers = (1, 32, 32, 1)
    pb, batch = _mk(4, layers=layers, n=256, seed=1)
    gammas = jnp.array([0.5, 1.0, 1.5, 2.0])
    scales = jnp.ones((4,))
    kw = dict(activation="tanh", p=3.0, nonlinearity="abs_power",
              tile=128, sum_tile=128, interpret=True, delayed=True)
    vag1 = make_pallas_value_and_grad(layers, **kw)
    vagM = make_pallas_value_and_grad(layers, n_runs=4, **kw)
    p_u = jax.tree.map(lambda a: a[0], pack_params(pb, 4))
    stM = vagM.init_state(p_u, batch, gammas, scales)
    # state = (S_{t-1}, S_{t-2}, step); packed sums are (4 sums, M runs)
    assert stM[0].shape == (4, 4) and stM[1].shape == (4, 4)
    (tM, _), _, stM2 = vagM(p_u, batch, gammas, scales, stM)
    for r in range(4):
        p_r = jax.tree.map(lambda a: a[r], pb)
        st = vag1.init_state(p_r, batch, gammas[r], scales[r])
        (t, _), _, st2 = vag1(p_r, batch, gammas[r], scales[r], st)
        np.testing.assert_allclose(float(tM[r]), float(t), rtol=1e-6)
        for sM, s1 in zip(stM2[:2], st2[:2]):
            np.testing.assert_allclose(np.asarray(sM[:, r]), np.asarray(s1),
                                       rtol=1e-6)
        assert int(stM2[2]) == int(st2[2])


@pytest.mark.slow
def test_packed_relaxed_fresh_extrap_per_run():
    """The round-4 default relaxed combination (delayed + fresh_values +
    extrapolate) on the PACKED path must be exactly M independent runs of the
    single-run combination — including per-run (N, M) bases, which exercise
    the 2-D branch of _value_sums (the fresh S₂/S₃ XLA forward). Verified
    per run after two steps of genuine state evolution (stale S₀/S₁ +
    extrapolation + fresh S₂/S₃ all active)."""
    layers = (1, 32, 32, 1)
    M, n = 4, 256
    pb, batch = _mk(M, layers=layers, n=n, seed=3)
    x = np.asarray(batch["x"])[:, 0]
    bx = np.asarray(batch["bx"])[:, 0]
    base_val = np.stack([np.sin((r + 1) * 0.5 * x) for r in range(M)], axis=1)
    base_lap = np.stack([-((r + 1) * 0.5) ** 2 * np.sin((r + 1) * 0.5 * x)
                         for r in range(M)], axis=1)
    base_bval = np.stack([np.sin((r + 1) * 0.5 * bx) for r in range(M)],
                         axis=1)
    batchM = dict(batch, base_val=jnp.asarray(base_val, jnp.float32),
                  base_lap=jnp.asarray(base_lap, jnp.float32),
                  base_bval=jnp.asarray(base_bval, jnp.float32))
    gammas = jnp.array([0.5, 1.0, 1.5, 2.0])
    scales = jnp.array([0.01, 0.02, 0.03, 0.04])
    kw = dict(activation="tanh", p=3.0, nonlinearity="abs_power",
              tile=128, sum_tile=128, interpret=True, delayed=True,
              fresh_values=True, extrapolate=True)
    vag1 = make_pallas_value_and_grad(layers, **kw)
    vagM = make_pallas_value_and_grad(layers, n_runs=M, **kw)
    p_u = jax.tree.map(lambda a: a[0], pack_params(pb, M))

    def advance(vag, p, batch_r, g, s):
        st = vag.init_state(p, batch_r, g, s)
        out = None
        for _ in range(3):      # 3 steps: S_{t-1} ≠ S_{t-2}, params moving
            out = vag(p, batch_r, g, s, st)
            (_, _), grads, st = out
            p = jax.tree.map(lambda a, d: a - 1e-3 * d, p, grads)
        return out

    (tM, auxM), gM, _ = advance(vagM, p_u, batchM, gammas, scales)
    g_runs = unpack_params(jax.tree.map(lambda a: a[None], gM), layers, M)
    for r in range(M):
        p_r = jax.tree.map(lambda a: a[r], pb)
        batch_r = dict(batch,
                       base_val=jnp.asarray(base_val[:, r], jnp.float32),
                       base_lap=jnp.asarray(base_lap[:, r], jnp.float32),
                       base_bval=jnp.asarray(base_bval[:, r], jnp.float32))
        (t, aux), g, _ = advance(vag1, p_r, batch_r, gammas[r], scales[r])
        np.testing.assert_allclose(float(tM[r]), float(t), rtol=1e-5)
        np.testing.assert_allclose(float(auxM["mu"][r]), float(aux["mu"]),
                                   rtol=1e-5)
        # rtol 1e-3: the packed kernel's 128-lane GEMMs accumulate in a
        # different order than the single-run ones, and 3 steps of trajectory
        # compound the f32 rounding (2/32 elements at ~2e-4 rel without it)
        for li in range(len(layers) - 1):
            np.testing.assert_allclose(np.asarray(g_runs[li][0][r]),
                                       np.asarray(g[li][0]),
                                       rtol=1e-3, atol=1e-6)
            np.testing.assert_allclose(np.asarray(g_runs[li][1][r]),
                                       np.asarray(g[li][1]),
                                       rtol=1e-3, atol=1e-6)


def test_fit_ensemble_packed_matches_vmapped():
    """Trajectory parity: the packed trainer must reproduce fit_ensemble +
    vmapped fused vag (per-run clip → adam → cosine-WR LR) run for run."""
    import optax

    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn
    from gpe_tpu.train.loop import fit_ensemble
    from gpe_tpu.train.packed import fit_ensemble_packed
    from gpe_tpu.train.schedules import cosine_warm_restarts

    spec = GPESpec(n_points=512, layers=(1, 32, 32, 1), activation="tanh")
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    R = 4
    pb = jax.vmap(lambda k: mlp.init_mlp(k, spec.layers, "xavier_uniform"))(
        jax.random.split(jax.random.PRNGKey(7), R))
    vag1 = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=256, sum_tile=256, interpret=True)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(cosine_warm_restarts(1e-3, 200, 2, 1e-6)))
    kw = dict(epochs=60, tol=0.0, patience=10**9, check_every=30)
    ens = fit_ensemble(loss_fn, opt, pb, batch, 1.0, 0.01,
                       value_and_grad_fn=vag1, **kw)
    ensP = fit_ensemble_packed(spec, pb, batch, 1.0, 0.01, lr=1e-3,
                               lr_mode="cosine", interpret=True, **kw)
    np.testing.assert_allclose(ensP.best_loss, ens.best_loss, rtol=1e-4)
    np.testing.assert_allclose(ensP.mu, ens.mu, rtol=1e-4)
    np.testing.assert_allclose(ensP.loss_history, ens.loss_history,
                               rtol=1e-3, atol=1e-6)


def test_fit_ensemble_packed_loss_faithful_lr():
    """Per-run loss-dependent LR (the reference's scheduler.step(loss) bug,
    lr_mode='loss_faithful') must match the unpacked ramp_optimizer path."""
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn
    from gpe_tpu.train.loop import fit_ensemble
    from gpe_tpu.train.packed import fit_ensemble_packed
    from gpe_tpu.train.plpinn import ramp_optimizer

    spec = GPESpec(n_points=512, layers=(1, 32, 32, 1), activation="tanh")
    batch = make_batch(spec, 0)
    loss_fn = make_loss_fn(spec)
    R = 2
    pb = jax.vmap(lambda k: mlp.init_mlp(k, spec.layers, "xavier_uniform"))(
        jax.random.split(jax.random.PRNGKey(9), R))
    vag1 = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=256, sum_tile=256, interpret=True)
    kw = dict(epochs=40, tol=0.0, patience=10**9, check_every=20)
    ens = fit_ensemble(loss_fn, ramp_optimizer(1e-3, "loss_faithful"), pb,
                       batch, 1.0, 0.01, value_and_grad_fn=vag1, **kw)
    ensP = fit_ensemble_packed(spec, pb, batch, 1.0, 0.01, lr=1e-3,
                               lr_mode="loss_faithful", interpret=True, **kw)
    np.testing.assert_allclose(ensP.best_loss, ens.best_loss, rtol=1e-4)
    np.testing.assert_allclose(ensP.loss_history, ens.loss_history,
                               rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_train_plpinn_modes_packed_physics():
    """Two modes advance in lane-packed kernels with per-run bases; the γ=0
    eigenvalues must recover 2m+1 and μ must grow with repulsive γ."""
    from gpe_tpu.train import GPESpec
    from gpe_tpu.train.packed import train_plpinn_modes_packed

    spec = GPESpec(n_points=512, layers=(1, 32, 32, 1), activation="tanh")
    res = train_plpinn_modes_packed(spec, [0.0, 1.0], modes=(0, 1),
                                    epochs=700, tol=1e-6, patience=10**9,
                                    pretrain_epochs=500, check_every=350,
                                    interpret=True, lr_mode="cosine")
    m0, m1 = dict(res.mu_table[0]), dict(res.mu_table[1])
    assert abs(m0[0.0] - 1.0) < 0.05
    assert abs(m1[0.0] - 3.0) < 0.15
    assert m0[1.0] > m0[0.0] and m1[1.0] > m1[0.0]


def test_grad_kernel_tile_cap_models_measured_vmem():
    # calibration anchors: width-128 / 3-hidden / d=2 measured 16.68 MiB at
    # tile=896 (tanh) and 16.18 MiB at tile=784 (shifted_tanh, 21642 B/pt) —
    # Mosaic scoped-VMEM failures on the 50k-pt flagship shapes. The cap must
    # stay strictly below both failing tiles and fit the worst measured
    # per-point footprint into the 16 MiB scope with headroom.
    from gpe_tpu.pallas.fused_grad import grad_kernel_tile_cap
    MIB16 = 16 * 2**20
    cap2d_16 = grad_kernel_tile_cap((2, 128, 128, 128, 1), budget_bytes=MIB16)
    assert cap2d_16 < 784
    assert cap2d_16 * 21642 <= MIB16            # shifted_tanh measured B/pt
    # 1-D width-64 (padded to 128) keeps the 4000-pt paper tile (800) legal
    # even at the conservative 16 MiB budget
    assert grad_kernel_tile_cap((1, 64, 64, 64, 1), budget_bytes=MIB16) >= 800
    # packed runs add per-run base lanes -> cap can only shrink
    assert grad_kernel_tile_cap((1, 64, 64, 64, 1), n_runs=8) <= \
        grad_kernel_tile_cap((1, 64, 64, 64, 1))
    # the default budget follows the kernels' requested Mosaic limit (64 MiB
    # via CompilerParams(vmem_limit_bytes), fused_residual) — caps scale up,
    # and the env override moves both together
    cap2d = grad_kernel_tile_cap((2, 128, 128, 128, 1))
    assert cap2d > cap2d_16
    import os
    os.environ["GPE_TPU_SCOPED_VMEM_KIB"] = "16384"
    try:
        assert grad_kernel_tile_cap((2, 128, 128, 128, 1)) == cap2d_16
        from gpe_tpu.pallas.fused_residual import kernel_vmem_limit_bytes
        assert kernel_vmem_limit_bytes() == MIB16
    finally:
        del os.environ["GPE_TPU_SCOPED_VMEM_KIB"]
