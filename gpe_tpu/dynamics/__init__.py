from gpe_tpu.dynamics.split_step import (axis_coords, evolve,  # noqa: F401
                                         ground_state)
from gpe_tpu.dynamics.rotating_step import (evolve_rotating,  # noqa: F401
                                            rotating_ground_state)
from gpe_tpu.dynamics.gemm_step import (evolve_gemm,  # noqa: F401
                                        ground_state_gemm)
