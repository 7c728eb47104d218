from gpe_tpu.validate.fdm import (  # noqa: F401
    linear_eigensolve_1d, solve_gpe_scf_1d, solve_gpe_scf_2d,
)
from gpe_tpu.validate.imaginary_time import imaginary_time_gpe  # noqa: F401
