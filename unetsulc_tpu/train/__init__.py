"""Training layer: pjit train step, optimizer, epoch loop, controllers."""

from unetsulc_tpu.train.controllers import (  # noqa: F401
    DivideLr,
    EarlyStopping,
    FineTunning,
)
from unetsulc_tpu.train.step import TrainState, make_train_step, make_eval_step  # noqa: F401
