from gpe_tpu.dynamics.split_step import (axis_coords, evolve,  # noqa: F401
                                         ground_state)
