from ihmr_tpu.train import baseline, checkpoint, stats  # noqa: F401
from ihmr_tpu.train.baseline import (  # noqa: F401
    BaselineBatch,
    BaselineState,
    TrainConfig,
    create_state,
    eval_step,
    learning_rate_for_epoch,
    set_learning_rate,
    train_step,
)
