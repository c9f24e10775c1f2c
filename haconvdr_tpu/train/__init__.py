from haconvdr_tpu.train.loss import (  # noqa: F401
    ranking_loss,
    ranking_loss_prepos,
    kd_loss,
)
from haconvdr_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
