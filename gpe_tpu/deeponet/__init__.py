from gpe_tpu.deeponet.model import (  # noqa: F401
    DeepONetSpec, init_deeponet, deeponet_apply, deeponet_vgl,
    make_deeponet_loss, make_potential_family_batch, train_deeponet,
)
