"""Helmholtz family: square manufactured solution, circle Bessel mode,
learnable-k inverse problem (SURVEY.md §4 item 4 oracles)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gpe_tpu.helmholtz import (HelmholtzSpec, circle_exact,
                               init_helmholtz_params, make_helmholtz_batch,
                               make_helmholtz_loss, square_exact,
                               train_helmholtz)


def test_batch_shapes_and_split():
    spec = HelmholtzSpec(n_interior=500, n_boundary=50)
    b = make_helmholtz_batch(spec)
    assert b["x"].shape == (500, 2)
    assert b["bx"].shape[0] + b["bx_test"].shape[0] == 200  # 4 sides × 50
    assert b["bx"].shape[0] == 160                          # 80/20 split


def test_circle_exact_is_helmholtz_solution():
    """Jₙ(kr)cos(nθ) satisfies Δu + k²u = 0: check via FD Laplacian (float64
    scipy evaluation — the jnp path is float32 and too coarse for h⁻² FD)."""
    from scipy.special import jn
    k, n = 3.0, 1
    def u64(xy):
        r = np.sqrt(xy[:, 0] ** 2 + xy[:, 1] ** 2)
        th = np.arctan2(xy[:, 1], xy[:, 0])
        return jn(n, k * r) * np.cos(n * th)
    h = 1e-4
    pts = np.array([[0.3, 0.2], [0.1, -0.4], [-0.25, 0.3]])
    for p in pts:
        stencil = np.array([p, p + [h, 0], p - [h, 0], p + [0, h], p - [0, h]])
        u = u64(stencil)
        lap = (u[1] + u[2] + u[3] + u[4] - 4 * u[0]) / h**2
        assert abs(lap + k**2 * u[0]) < 1e-4
    # jnp path agrees with the float64 oracle at value level
    spec = HelmholtzSpec(domain="circle", k=3.0, mode_n=1)
    np.testing.assert_allclose(np.asarray(circle_exact(spec, pts)), u64(pts),
                               atol=1e-6)


@pytest.mark.slow
def test_square_helmholtz_trains():
    spec = HelmholtzSpec(domain="square", k=2.0, layers=(2, 32, 32, 1),
                         n_interior=2048, n_boundary=128)
    r = train_helmholtz(spec, epochs=2500, check_every=1250)
    assert r.interior_mse < 2e-2
    assert np.isfinite(r.test_mae)


@pytest.mark.slow
def test_learnable_k_recovers_wavenumber():
    spec = HelmholtzSpec(domain="square", k=2.0, learnable_k=True,
                         layers=(2, 32, 32, 1), n_interior=2048)
    from gpe_tpu.train import make_optimizer
    from gpe_tpu.train.loop import fit

    p = init_helmholtz_params(spec)
    p["k_raw"] = jnp.float32(1.5)
    batch = make_helmholtz_batch(spec)
    loss = make_helmholtz_loss(spec)
    opt = make_optimizer("adam", 3e-3, clip_norm=1.0)
    res = fit(loss, opt, p, batch, 0.0, 1.0, epochs=4000, tol=0.0,
              patience=10**9, check_every=2000)
    _, aux = loss(res.params, batch, jnp.float32(0.0), jnp.float32(1.0))
    assert abs(abs(float(aux["k"])) - 2.0) < 0.1


def test_helmholtz_residual_sum_of_squares_matches_loss():
    """make_helmholtz_residual_fn contract: ‖r‖² equals the training total
    (fixed weights) — the LM polish then optimizes exactly the trained loss."""
    import jax.numpy as jnp
    import numpy as np

    from gpe_tpu.helmholtz.problem import (HelmholtzSpec,
                                           init_helmholtz_params,
                                           make_helmholtz_batch,
                                           make_helmholtz_loss,
                                           make_helmholtz_residual_fn)

    for spec in (HelmholtzSpec(domain="square", k=2.0, n_interior=256,
                               n_boundary=32),
                 HelmholtzSpec(domain="circle", k=3.0, mode_n=1,
                               n_interior=256, n_boundary=32),
                 HelmholtzSpec(domain="square", k=3.0, learnable_k=True,
                               n_interior=256, n_boundary=32)):
        batch = make_helmholtz_batch(spec, 0)
        params = init_helmholtz_params(spec, 0)
        total, _ = make_helmholtz_loss(spec)(params, batch,
                                             jnp.float32(spec.k),
                                             jnp.float32(1.0))
        r = make_helmholtz_residual_fn(spec)(params, batch,
                                             jnp.float32(spec.k),
                                             jnp.float32(1.0))
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(total),
                                   rtol=1e-5)


@pytest.mark.slow
def test_lm_polish_improves_short_helmholtz():
    """A short Adam fit followed by the LM polish must reduce test MAE."""
    from gpe_tpu.helmholtz.problem import HelmholtzSpec, train_helmholtz

    spec = HelmholtzSpec(domain="square", k=2.0, n_interior=512,
                         n_boundary=64)
    base = train_helmholtz(spec, epochs=300, lm_steps=0)
    polished = train_helmholtz(spec, epochs=300, lm_steps=25)
    assert polished.test_mae < base.test_mae
