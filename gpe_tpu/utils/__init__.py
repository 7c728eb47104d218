from gpe_tpu.utils.metrics import MetricsLogger, write_error_table  # noqa: F401
from gpe_tpu.utils.profiling import Timer, throughput_meter, trace  # noqa: F401
from gpe_tpu.utils.debug import seed_everything, nan_guard  # noqa: F401
