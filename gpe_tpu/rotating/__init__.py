from gpe_tpu.rotating.problem import (  # noqa: F401
    RotatingSpec, make_rotating_batch, make_rotating_loss_fn,
    train_rotating_vortex, RotatingResult,
)
