"""Fused Pallas value_and_grad vs jax.grad of the XLA loss (interpret mode).

The kernel reverses the forward-Laplacian recursion by hand (σ‴ chain rule,
transpose GEMMs, grid-accumulated weight gradients) — exact-gradient parity
with reverse-mode over make_loss_fn is the correctness contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpe_tpu.models import mlp
from gpe_tpu.pallas.fused_grad import make_pallas_value_and_grad
from gpe_tpu.train import GPESpec, make_batch, make_loss_fn


def _check_grads(spec, gamma, scale, tile, sum_tile, rtol=2e-4):
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    loss_fn = make_loss_fn(spec)
    (ref_total, ref_aux), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, batch, jnp.float32(gamma),
                               jnp.float32(scale))
    vag = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=tile, sum_tile=sum_tile, interpret=True)
    (total, aux), grads = vag(params, batch, jnp.float32(gamma),
                              jnp.float32(scale))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(aux["mu"]), float(ref_aux["mu"]), rtol=1e-5)
    for li, ((rw, rb), (gw, gb)) in enumerate(zip(ref_grads, grads)):
        scale_w = np.max(np.abs(np.asarray(rw))) + 1e-12
        scale_b = np.max(np.abs(np.asarray(rb))) + 1e-12
        np.testing.assert_allclose(np.asarray(gw) / scale_w,
                                   np.asarray(rw) / scale_w,
                                   atol=rtol, err_msg=f"W grad layer {li}")
        np.testing.assert_allclose(np.asarray(gb) / scale_b,
                                   np.asarray(rb) / scale_b,
                                   atol=rtol, err_msg=f"b grad layer {li}")


def test_fused_grad_matches_xla_2d():
    spec = GPESpec(dim=2, n_points=24, layers=(2, 100, 100, 100, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, lb=-6.0, ub=6.0, nonlinearity="abs_power",
                   use_perturbation=False, activation="tanh")
    _check_grads(spec, 10.0, 0.01, tile=144, sum_tile=288)


def test_fused_grad_matches_xla_1d_shifted_tanh_power():
    spec = GPESpec(dim=1, n_points=1024, layers=(1, 64, 64, 64, 1),
                   potential="harmonic", lb=-10.0, ub=10.0,
                   nonlinearity="power", use_perturbation=False,
                   activation="shifted_tanh")
    _check_grads(spec, 5.0, 1.0, tile=256, sum_tile=512)


def test_fused_grad_trains():
    # a few optimizer steps with the fused gradient reduce the loss
    import optax
    spec = GPESpec(dim=1, n_points=256, layers=(1, 32, 32, 1),
                   potential="harmonic", lb=-8.0, ub=8.0,
                   nonlinearity="abs_power", use_perturbation=False,
                   activation="tanh")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(1), spec.layers)
    vag = jax.jit(make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=128, sum_tile=256, interpret=True))
    opt = optax.adam(3e-3)
    st = opt.init(params)
    (first, _), grads = vag(params, batch, jnp.float32(1.0), jnp.float32(1.0))
    best = float(first)
    for _ in range(150):
        updates, st = opt.update(grads, st, params)
        params = optax.apply_updates(params, updates)
        (total, _), grads = vag(params, batch, jnp.float32(1.0),
                                jnp.float32(1.0))
        best = min(best, float(total))
    assert best < 0.5 * float(first)


def test_fused_grad_vmap_matches_per_run():
    # fit_ensemble vmaps the fused vag over a params batch (pallas batching
    # adds a grid dimension) — parity with per-run results is the contract
    # compare.py relies on (ADVICE r1 #4)
    spec = GPESpec(dim=1, n_points=256, layers=(1, 32, 32, 1),
                   potential="harmonic", lb=-8.0, ub=8.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="tanh")
    batch = make_batch(spec, 0)
    vag = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
        tile=128, sum_tile=256, interpret=True)
    params_list = [mlp.init_mlp(jax.random.PRNGKey(s), spec.layers)
                   for s in range(3)]
    pbatch = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    scales = jnp.asarray([0.01, 0.02, 0.05], jnp.float32)
    vv = jax.vmap(vag, in_axes=(0, None, None, 0))
    (tot_b, aux_b), grads_b = vv(pbatch, batch, jnp.float32(2.0), scales)
    for r, p in enumerate(params_list):
        (tot, aux), grads = vag(p, batch, jnp.float32(2.0), scales[r])
        np.testing.assert_allclose(float(tot_b[r]), float(tot), rtol=1e-6)
        np.testing.assert_allclose(float(aux_b["mu"][r]), float(aux["mu"]),
                                   rtol=1e-6)
        for (gw, gb), (bw, bb) in zip(grads, jax.tree.map(lambda a: a[r],
                                                          grads_b)):
            np.testing.assert_allclose(np.asarray(bw), np.asarray(gw),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(bb), np.asarray(gb),
                                       rtol=1e-5, atol=1e-7)


def test_fused_grad_zero_bc_weight_finite_aux():
    # bc_weight=0 must not NaN the boundary aux (ADVICE r1 #1)
    spec = GPESpec(dim=1, n_points=256, layers=(1, 32, 32, 1),
                   potential="harmonic", lb=-8.0, ub=8.0, bc_weight=0.0,
                   nonlinearity="power", use_perturbation=False,
                   activation="tanh")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    vag = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic, spec.nonlinearity,
        bc_weight=0.0, norm_weight=spec.norm_weight,
        tile=128, sum_tile=256, interpret=True)
    (total, aux), grads = vag(params, batch, jnp.float32(1.0), jnp.float32(1.0))
    assert np.isfinite(float(aux["boundary"]))
    loss_fn = make_loss_fn(spec)
    (ref_total, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jnp.float32(1.0), jnp.float32(1.0))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)


def test_fused_grad_matches_xla_perturbation_ansatz():
    # PL-PINN composition: u = base + scale·net, boundary base_bval + scale·net
    spec = GPESpec(dim=1, n_points=1024, layers=(1, 64, 64, 64, 1),
                   potential="harmonic", lb=-10.0, ub=10.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="shifted_tanh")
    _check_grads(spec, 3.0, 0.01, tile=256, sum_tile=512)


def test_delayed_mode_exact_loss_and_convergence():
    """One-step-relaxed cotangent mode: the reported loss/μ are EXACT for the
    current params, and training through fit() converges to the same place as
    the exact two-pass mode."""
    from gpe_tpu.train.loop import fit
    from gpe_tpu.train.optimizers import make_optimizer

    spec = GPESpec(dim=1, n_points=512, layers=(1, 32, 32, 1),
                   potential="harmonic", lb=-8.0, ub=8.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="tanh")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    kw = dict(bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
              tile=256, sum_tile=512, interpret=True)
    vag = make_pallas_value_and_grad(spec.layers, spec.activation, spec.p,
                                     spec.kinetic, spec.nonlinearity, **kw)
    vag_d = make_pallas_value_and_grad(spec.layers, spec.activation, spec.p,
                                       spec.kinetic, spec.nonlinearity,
                                       delayed=True, **kw)
    assert vag_d.stateful

    g, s = jnp.float32(2.0), jnp.float32(0.01)
    state = vag_d.init_state(params, batch, g, s)
    (tot_d, aux_d), grads_d, state2 = vag_d(params, batch, g, s, state)
    (tot_e, aux_e), grads_e = vag(params, batch, g, s)
    # loss/μ exact; with state = exact sums of the SAME params the relaxed
    # gradient equals the exact gradient too
    np.testing.assert_allclose(float(tot_d), float(tot_e), rtol=1e-6)
    np.testing.assert_allclose(float(aux_d["mu"]), float(aux_e["mu"]), rtol=1e-6)
    for (dw, db), (ew, eb) in zip(grads_d, grads_e):
        np.testing.assert_allclose(np.asarray(dw), np.asarray(ew), rtol=2e-5,
                                   atol=1e-8)

    # convergence parity through fit()
    loss_fn = make_loss_fn(spec)
    opt = make_optimizer("adam", 3e-3, clip_norm=1.0)
    kwf = dict(epochs=300, tol=-1.0, patience=10**9, check_every=150)
    r_e = fit(loss_fn, opt, params, batch, g, s, value_and_grad_fn=vag, **kwf)
    r_d = fit(loss_fn, opt, params, batch, g, s, value_and_grad_fn=vag_d, **kwf)
    np.testing.assert_allclose(r_d.best_loss, r_e.best_loss, rtol=5e-2)
    np.testing.assert_allclose(r_d.mu_history[-1], r_e.mu_history[-1],
                               rtol=5e-3)


def test_relaxed_refresh_and_extrapolate_modes():
    """Round-4 bias correctors for the relaxed mode (pallas/fused_grad.py):
    refresh_every=1 makes every step>0 the exact two-pass step (gradient
    equals the exact vag's), and extrapolate=True predicts the cotangent
    sums linearly — under uniform parameter motion its gradient error vs the
    exact gradient must be far below the plain one-step-stale mode's."""
    spec = GPESpec(dim=1, n_points=512, layers=(1, 32, 32, 1),
                   potential="harmonic", lb=-8.0, ub=8.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="tanh")
    batch = make_batch(spec, 0)
    p0 = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    g, s = jnp.float32(2.0), jnp.float32(0.05)
    kw = dict(bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
              tile=256, sum_tile=512, interpret=True, delayed=True)
    mk = lambda **extra: make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic,
        spec.nonlinearity, **kw, **extra)
    vag_r, vag_f, vag_x = mk(), mk(refresh_every=1), mk(extrapolate=True)
    vag_exact = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic,
        spec.nonlinearity, **{**kw, "delayed": False})

    # two uniform parameter steps so the linear sum prediction is near-exact
    # (step size in the optimizer-update regime, ~1e-4·grad: at 1e-2 the
    # quadratic term of S(θ) dominates and extrapolation overshoots — the
    # measured crossover is in RESULTS.md round 4)
    _, gr0 = vag_exact(p0, batch, g, s)
    p1 = jax.tree.map(lambda p, d: p - 1e-4 * d, p0, gr0)
    p2 = jax.tree.map(lambda a, b: 2.0 * a - b, p1, p0)  # p2−p1 = p1−p0

    def advance(vag):
        st = vag.init_state(p0, batch, g, s)
        _, _, st = vag(p0, batch, g, s, st)     # step 0 (exact state)
        _, _, st = vag(p1, batch, g, s, st)     # step 1
        return vag(p2, batch, g, s, st)         # step 2 — compare grads here

    _, g_exact = vag_exact(p2, batch, g, s)
    (_, _), g_r, _ = advance(vag_r)
    (_, _), g_f, _ = advance(vag_f)
    (_, _), g_x, _ = advance(vag_x)

    err = lambda gr: max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(g_exact)))
    # refresh_every=1: step 2 is the exact step
    assert err(g_f) < 1e-6 + 1e-5 * err(g_r), (err(g_f), err(g_r))
    # extrapolation kills the O(δ) bias: ≥5× closer than plain relaxed
    assert err(g_x) < 0.2 * err(g_r), (err(g_x), err(g_r))


def test_relaxed_fresh_values_mode():
    """fresh_values=True recomputes the value-only sums S₂/S₃ exactly every
    step (cheap XLA forward), so the cotangents depend on the state's stale
    sums ONLY through S₀/S₁ — corrupting the state's S₂/S₃ entries must not
    change the gradient, while corrupting S₀/S₁ must."""
    spec = GPESpec(dim=1, n_points=512, layers=(1, 32, 32, 1),
                   potential="harmonic", lb=-8.0, ub=8.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="tanh")
    batch = make_batch(spec, 0)
    p0 = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    g, s = jnp.float32(2.0), jnp.float32(0.05)
    kw = dict(bc_weight=spec.bc_weight, norm_weight=spec.norm_weight,
              tile=256, sum_tile=512, interpret=True, delayed=True)
    vag_fresh = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic,
        spec.nonlinearity, fresh_values=True, **kw)
    vag_exact = make_pallas_value_and_grad(
        spec.layers, spec.activation, spec.p, spec.kinetic,
        spec.nonlinearity, **{**kw, "delayed": False})

    st = vag_fresh.init_state(p0, batch, g, s)
    # with state = exact sums of the SAME params, relaxed+fresh == exact
    (_, _), g0, _ = vag_fresh(p0, batch, g, s, st)
    _, ge = vag_exact(p0, batch, g, s)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-8)

    sums, sums2, step = st
    corrupt23 = (sums.at[2].mul(7.0).at[3].add(3.0), sums2, step)
    corrupt01 = (sums.at[0].mul(7.0).at[1].add(3.0), sums2, step)
    (_, _), g23, _ = vag_fresh(p0, batch, g, s, corrupt23)
    (_, _), g01, _ = vag_fresh(p0, batch, g, s, corrupt01)
    for a, b in zip(jax.tree.leaves(g23), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    deltas = [float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree.leaves(g01), jax.tree.leaves(g0))]
    assert max(deltas) > 1e-4, deltas


def test_relaxed_default_resolution(monkeypatch):
    """Round-4 default flip: no explicit choice and no env → relaxed +
    fresh_values + extrapolate (the A/B-winning combination);
    GPE_TPU_NO_RELAXED=1 → exact; GPE_TPU_RELAXED_FUSED=1 keeps its old
    PLAIN-relaxed meaning; explicit kwargs always win."""
    from gpe_tpu.train.problem import _resolve_relaxed

    for var in ("GPE_TPU_RELAXED_FUSED", "GPE_TPU_NO_RELAXED",
                "GPE_TPU_RELAXED_FRESH", "GPE_TPU_RELAXED_EXTRAP"):
        monkeypatch.delenv(var, raising=False)

    assert _resolve_relaxed(None, None, None) == (True, True, True)
    assert _resolve_relaxed(False, None, None) == (False, False, False)
    assert _resolve_relaxed(True, False, None) == (True, False, False)

    monkeypatch.setenv("GPE_TPU_NO_RELAXED", "1")
    assert _resolve_relaxed(None, None, None) == (False, False, False)

    monkeypatch.setenv("GPE_TPU_RELAXED_FUSED", "1")  # forced plain wins
    assert _resolve_relaxed(None, None, None) == (True, False, False)
    monkeypatch.setenv("GPE_TPU_RELAXED_FRESH", "1")
    assert _resolve_relaxed(None, None, None) == (True, True, False)
