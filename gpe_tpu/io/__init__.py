from gpe_tpu.io.checkpoint import (  # noqa: F401
    save_bundle, load_bundle, save_params, load_params, train_or_load,
)
