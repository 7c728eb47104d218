from gpe_tpu.ops.laplacian import (  # noqa: F401
    fwdlap_mlp, laplacian_generic, value_grad_lap_generic,
)
from gpe_tpu.ops.quadrature import (  # noqa: F401
    uniform_grid, trapezoid_weights, riemann_weights, integrate, wmean,
)
from gpe_tpu.ops.rayleigh import (  # noqa: F401
    hamiltonian_apply, rayleigh_mu, gpe_residual, riesz_energy,
)
