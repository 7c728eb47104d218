"""Budget fidelity: fit() takes EXACTLY `epochs` gradient steps even when the
epoch budget is not a multiple of the compiled chunk length, and fit_ensemble
threads per-run perturbation scales (reference protocol: each seed gets its
own q/normal_const, plot_box_potential_at_ground_state_multiple_runs.py:987)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpe_tpu.train.loop import fit, fit_ensemble


def _counting_loss(params, batch, gamma, scale):
    # grad w.r.t. "w" is exactly 1 -> SGD(lr=1) decrements w by 1 per step
    total = jnp.sum(params["w"]) * 1.0 + 0.0 * gamma + 0.0 * scale
    return total, {"mu": total}


def test_fit_takes_exactly_epoch_budget_steps():
    params = {"w": jnp.zeros(())}
    opt = optax.sgd(1.0)
    # 13 epochs with chunk length 5 -> chunks of 5,5,5 raw steps; the tail
    # chunk must mask its last 2 steps
    res = fit(_counting_loss, opt, params, {}, 0.0, 1.0, epochs=13,
              tol=-1e18, patience=10_000, check_every=5)
    steps_taken = -float(res.final_params["w"])
    assert steps_taken == 13.0
    assert res.loss_history.shape[0] == 13


def test_fit_budget_smaller_than_chunk():
    params = {"w": jnp.zeros(())}
    opt = optax.sgd(1.0)
    res = fit(_counting_loss, opt, params, {}, 0.0, 1.0, epochs=3,
              tol=-1e18, patience=10_000, check_every=8)
    assert -float(res.final_params["w"]) == 3.0


def _scale_loss(params, batch, gamma, scale):
    # loss minimized at w = scale; mu reports the current scale so per-run
    # scales are observable in the output
    total = (params["w"] - scale) ** 2
    return total, {"mu": scale + 0.0 * total}


def test_fit_ensemble_per_run_scales():
    R = 4
    params_batch = {"w": jnp.zeros((R,))}
    scales = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    opt = optax.sgd(0.1)
    ens = fit_ensemble(_scale_loss, opt, params_batch, {}, 0.0, scales,
                       epochs=50, tol=-1e18, patience=10_000, check_every=16)
    np.testing.assert_allclose(ens.mu, np.asarray(scales), rtol=1e-6)
    # each run converged toward its own scale target
    w = np.asarray(ens.final_params["w"])
    assert np.all(np.abs(w - np.asarray(scales)) < 0.01)


def test_fit_ensemble_budget_fidelity():
    R = 3
    params_batch = {"w": jnp.zeros((R,))}
    opt = optax.sgd(1.0)
    ens = fit_ensemble(_counting_loss, opt, params_batch, {}, 0.0, 1.0,
                       epochs=7, tol=-1e18, patience=10_000, check_every=4)
    np.testing.assert_allclose(np.asarray(ens.final_params["w"]), -7.0)
