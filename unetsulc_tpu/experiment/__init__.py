"""Experiment layer: K-fold CV driver, results artifacts, tensorboard."""

from unetsulc_tpu.experiment.driver import run_experiment  # noqa: F401
from unetsulc_tpu.experiment.tensorboard import SummaryWriter  # noqa: F401
