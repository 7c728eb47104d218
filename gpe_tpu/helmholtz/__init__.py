from gpe_tpu.helmholtz.problem import (  # noqa: F401
    HelmholtzSpec, square_exact, circle_exact, make_helmholtz_batch,
    make_helmholtz_loss, init_helmholtz_params, train_helmholtz,
)
