"""Fused Pallas loss-eval kernel vs the XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from gpe_tpu.models import mlp
from gpe_tpu.pallas.fused_residual import make_pallas_loss_eval
from gpe_tpu.train import GPESpec, make_batch, make_loss_fn


def _check(spec, gamma, scale, tile, rtol=2e-5):
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    ref_total, ref_aux = make_loss_fn(spec)(params, batch, gamma, scale)
    ev = make_pallas_loss_eval(spec.layers, spec.activation, spec.p,
                               spec.kinetic, spec.nonlinearity,
                               bc_weight=spec.bc_weight,
                               norm_weight=spec.norm_weight,
                               tile=tile, interpret=True)
    tot, aux = ev(params, batch, gamma, scale)
    np.testing.assert_allclose(float(tot), float(ref_total), rtol=rtol)
    np.testing.assert_allclose(float(aux["mu"]), float(ref_aux["mu"]), rtol=rtol)
    np.testing.assert_allclose(float(aux["pde"]), float(ref_aux["pde"]),
                               rtol=rtol, atol=1e-8)


def test_pallas_matches_xla_2d():
    spec = GPESpec(dim=2, n_points=32, layers=(2, 100, 100, 100, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, lb=-6.0, ub=6.0, nonlinearity="abs_power",
                   use_perturbation=False, activation="tanh")
    _check(spec, 10.0, 0.01, tile=256)


def test_pallas_matches_xla_1d_shifted_tanh_power():
    spec = GPESpec(dim=1, n_points=1024, layers=(1, 64, 64, 64, 1),
                   potential="harmonic", lb=-10.0, ub=10.0,
                   nonlinearity="power", use_perturbation=False,
                   activation="shifted_tanh")
    _check(spec, 5.0, 1.0, tile=512)


def test_pallas_bf16_compute_close_to_f32():
    # bf16 GEMM inputs with f32 accumulation: loose parity with the f32 loss
    spec = GPESpec(dim=2, n_points=32, layers=(2, 100, 100, 100, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, lb=-6.0, ub=6.0, nonlinearity="abs_power",
                   use_perturbation=False, activation="tanh")
    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    ref_total, ref_aux = make_loss_fn(spec)(params, batch, 10.0, 0.01)
    ev = make_pallas_loss_eval(spec.layers, spec.activation, spec.p,
                               spec.kinetic, spec.nonlinearity,
                               bc_weight=spec.bc_weight,
                               norm_weight=spec.norm_weight,
                               tile=256, interpret=True,
                               compute_dtype=jnp.bfloat16)
    tot, aux = ev(params, batch, 10.0, 0.01)
    np.testing.assert_allclose(float(tot), float(ref_total), rtol=3e-2)
    np.testing.assert_allclose(float(aux["mu"]), float(ref_aux["mu"]), rtol=3e-2)


def test_pallas_matches_xla_perturbation_ansatz():
    spec = GPESpec(dim=1, n_points=1024, layers=(1, 64, 64, 64, 1),
                   potential="harmonic", lb=-10.0, ub=10.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="shifted_tanh")
    _check(spec, 3.0, 0.01, tile=512)


def _check_rowcat(spec, gamma, scale, tile, rtol=2e-5, **kw):
    from gpe_tpu.pallas.rowcat_eval import make_rowcat_loss_eval

    batch = make_batch(spec, 0)
    params = mlp.init_mlp(jax.random.PRNGKey(0), spec.layers)
    ref_total, ref_aux = make_loss_fn(spec)(params, batch, gamma, scale)
    ev = make_rowcat_loss_eval(spec.layers, spec.activation, spec.p,
                               spec.kinetic, spec.nonlinearity,
                               bc_weight=spec.bc_weight,
                               norm_weight=spec.norm_weight,
                               tile=tile, interpret=True, **kw)
    tot, aux = ev(params, batch, gamma, scale)
    np.testing.assert_allclose(float(tot), float(ref_total), rtol=rtol)
    np.testing.assert_allclose(float(aux["mu"]), float(ref_aux["mu"]),
                               rtol=rtol)


def test_rowcat_matches_xla_2d():
    # channel-blocked variant kernel (rowcat_eval.py): same loss as the
    # XLA path on the bench headline shape class
    spec = GPESpec(dim=2, n_points=32, layers=(2, 100, 100, 100, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, lb=-6.0, ub=6.0, nonlinearity="abs_power",
                   use_perturbation=False, activation="tanh")
    _check_rowcat(spec, 10.0, 0.01, tile=256)


def test_rowcat_matches_xla_perturbation_1d():
    spec = GPESpec(dim=1, n_points=1024, layers=(1, 64, 64, 64, 1),
                   potential="harmonic", lb=-10.0, ub=10.0,
                   nonlinearity="power", use_perturbation=True,
                   basis="hermite", activation="shifted_tanh")
    _check_rowcat(spec, 3.0, 0.01, tile=512)


def test_rowcat_bf16_close_to_f32():
    spec = GPESpec(dim=2, n_points=32, layers=(2, 100, 100, 100, 1),
                   potential="harmonic", potential_kwargs=(("a", 0.5),),
                   kinetic=0.5, lb=-6.0, ub=6.0, nonlinearity="abs_power",
                   use_perturbation=False, activation="tanh")
    _check_rowcat(spec, 10.0, 0.01, tile=256, rtol=3e-2,
                  compute_dtype=jnp.bfloat16)
