from gpe_tpu.models.mlp import (  # noqa: F401
    init_mlp, mlp_apply, mlp_vgl,
)
from gpe_tpu.models.ansatz import (  # noqa: F401
    Ansatz, plain_ansatz, perturbation_ansatz, hard_bc_ansatz, box_sine_factor,
)
