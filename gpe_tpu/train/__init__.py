from gpe_tpu.train.schedules import cosine_warm_restarts  # noqa: F401
from gpe_tpu.train.optimizers import make_optimizer  # noqa: F401
from gpe_tpu.train.problem import GPESpec, make_batch, make_loss_fn  # noqa: F401
from gpe_tpu.train.loop import fit, FitResult  # noqa: F401
from gpe_tpu.train.pretrain import pretrain_to_base  # noqa: F401
from gpe_tpu.train.plpinn import train_plpinn, PLPINNResult  # noqa: F401
