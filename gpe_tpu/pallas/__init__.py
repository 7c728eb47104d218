from gpe_tpu.pallas.fused_residual import (  # noqa: F401
    make_pallas_loss_eval, pallas_supported,
)
