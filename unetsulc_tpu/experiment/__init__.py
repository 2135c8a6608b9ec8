"""Experiment layer: K-fold CV driver, results artifacts, tensorboard."""

from unetsulc_tpu.experiment.tensorboard import SummaryWriter  # noqa: F401


def __getattr__(name):
    # lazy: driver imports the method layer, which imports this package's
    # tensorboard module — a direct import here would be circular
    if name == "run_experiment":
        from unetsulc_tpu.experiment.driver import run_experiment

        return run_experiment
    raise AttributeError(name)
