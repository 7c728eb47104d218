from gpe_tpu.physics.potentials import (  # noqa: F401
    harmonic, gaussian, periodic, box, linear, double_well, step, sine,
    optical_lattice, get_potential, scaled, POTENTIALS,
)
from gpe_tpu.physics.bases import (  # noqa: F401
    hermite_basis, box_basis, airy_basis, hermite_product_2d, ValGradLap,
)
from gpe_tpu.physics.thomas_fermi import thomas_fermi  # noqa: F401
from gpe_tpu.physics.exact import (  # noqa: F401
    harmonic_eigenvalue, box_eigenvalue, gravity_well_eigenvalue,
)
