from gpe_tpu.losses.gpe import GPETerms, TermsOutput, gpe_terms  # noqa: F401
from gpe_tpu.losses.balancing import (  # noqa: F401
    fixed_weights_total, self_adaptive_total, init_log_alpha,
    relobralo_init, relobralo_step,
)
