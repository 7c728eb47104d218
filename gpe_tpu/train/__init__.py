from gpe_tpu.train.schedules import cosine_warm_restarts  # noqa: F401
from gpe_tpu.train.optimizers import make_optimizer  # noqa: F401
from gpe_tpu.train.problem import GPESpec, make_batch, make_loss_fn  # noqa: F401
from gpe_tpu.train.loop import fit, FitResult  # noqa: F401
from gpe_tpu.train.pretrain import pretrain_to_base  # noqa: F401
from gpe_tpu.train.plpinn import train_plpinn, PLPINNResult  # noqa: F401
from gpe_tpu.train.problem import make_terms_fn, init_params, net_params  # noqa: F401
from gpe_tpu.train.loop import fit_ensemble, EnsembleFitResult  # noqa: F401
from gpe_tpu.train.beta_sweep import train_beta_sweep, BetaSweepResult  # noqa: F401
from gpe_tpu.train.p_ramp import train_p_ramp, PRampResult  # noqa: F401
from gpe_tpu.train.balanced import fit_relobralo, BalancedFitResult  # noqa: F401
from gpe_tpu.train.deflation import train_deflation, DeflationResult, make_deflated_loss_fn  # noqa: F401
