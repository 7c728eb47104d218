from gpe_tpu.pallas.fused_residual import (  # noqa: F401
    make_pallas_loss_eval, pallas_supported,
)
from gpe_tpu.pallas.fused_grad import (  # noqa: F401
    make_pallas_value_and_grad,
)
from gpe_tpu.pallas.rowcat_eval import (  # noqa: F401
    make_rowcat_loss_eval,
)
