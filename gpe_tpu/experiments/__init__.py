from gpe_tpu.experiments.configs import EXPERIMENTS, ExperimentConfig  # noqa: F401
