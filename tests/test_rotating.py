"""Rotating-frame GPE (complex ψ, ΩL_z, vortex states) — BASELINE config #5."""
import numpy as np
import pytest

from gpe_tpu.validate.rotating import (angular_momentum,
                                       rotating_imaginary_time, rotating_mu,
                                       vortex_count)


def _grid(n=96, L=8.0):
    x = np.linspace(-L, L, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    return x, 0.5 * (X**2 + Y**2)


def test_rotating_oracle_omega0_matches_nonrotating():
    from gpe_tpu.validate.imaginary_time import imaginary_time_gpe
    x, V = _grid()
    mu, psi, lz = rotating_imaginary_time(V, x, 20.0, 0.0, tau=2e-3,
                                          steps=20000)
    mu_ref, _ = imaginary_time_gpe(V, x[1] - x[0], 20.0, kinetic=0.5,
                                   tau=1e-3, richardson=True)
    assert abs(mu - mu_ref) < 5e-3        # O(τ) bias of the unextrapolated ADI
    assert abs(lz) < 1e-6                 # no rotation → zero circulation
    assert vortex_count(psi) == 0


@pytest.mark.slow
def test_rotating_oracle_vortex_formation():
    x, V = _grid()
    mu0, _, _ = rotating_imaginary_time(V, x, 50.0, 0.0, tau=4e-3, steps=15000)
    mu, psi, lz = rotating_imaginary_time(V, x, 50.0, 0.7, tau=4e-3,
                                          steps=20000)
    assert mu < mu0                       # rotation lowers the frame energy
    assert lz > 0.9                       # one unit of circulation
    assert vortex_count(psi) >= 1
    # μ functional is consistent with the solver's own report
    assert abs(rotating_mu(psi, V, x, 50.0, 0.7) - mu) < 1e-10
    assert abs(angular_momentum(psi, x) - lz) < 1e-10


@pytest.mark.slow
def test_complex_pinn_distills_vortex_state():
    from gpe_tpu.rotating import RotatingSpec, train_rotating_vortex
    spec = RotatingSpec(n_points=64, layers=(2, 64, 64, 64, 2), gamma=10.0,
                        omega=0.7, lb=-7.0, ub=7.0)
    res = train_rotating_vortex(spec, fit_epochs=3000, lbfgs_steps=200,
                                polish_steps=40, oracle_steps=20000)
    assert res.n_vortices >= 1
    assert abs(res.mu - res.mu_grid) < 2e-2     # mesh-free μ tracks the oracle
    assert res.lz > 0.7                         # circulation carried by the net
    assert res.pde_loss < 5e-3


def test_rotating_loss_fn_consistency():
    # Ω = 0 complex loss must agree with the real GPE machinery when Im ψ = 0
    import jax
    import jax.numpy as jnp
    from gpe_tpu.models import mlp
    from gpe_tpu.rotating import (RotatingSpec, make_rotating_batch,
                                  make_rotating_loss_fn)
    from gpe_tpu.train import GPESpec, make_batch, make_loss_fn

    rspec = RotatingSpec(n_points=32, layers=(2, 16, 16, 2), gamma=5.0,
                         omega=0.0, lb=-6.0, ub=6.0)
    rbatch = make_rotating_batch(rspec)
    params = mlp.init_mlp(jax.random.PRNGKey(0), rspec.layers)
    # zero the imaginary output column
    w, b = params[-1]
    params = tuple(params[:-1]) + ((w.at[:, 1].set(0.0), b.at[1].set(0.0)),)
    _, aux = make_rotating_loss_fn(rspec)(params, rbatch, 5.0, 0.0)

    gspec = GPESpec(dim=2, n_points=32, layers=(2, 16, 16, 1), lb=-6.0,
                    ub=6.0, potential="harmonic", potential_kwargs=(("a", 0.5),),
                    kinetic=0.5, nonlinearity="abs_power",
                    use_perturbation=False, activation="tanh")
    gbatch = make_batch(gspec, 0)
    real_params = tuple((wi, bi) if i < len(params) - 1
                        else (wi[:, :1], bi[:1])
                        for i, (wi, bi) in enumerate(params))
    _, gaux = make_loss_fn(gspec)(real_params, gbatch, 5.0, 1.0)
    np.testing.assert_allclose(float(aux["mu"]), float(gaux["mu"]), rtol=1e-5)
    np.testing.assert_allclose(float(aux["pde"]), float(gaux["pde"]), rtol=1e-4)
    assert abs(float(aux["lz"])) < 1e-5
