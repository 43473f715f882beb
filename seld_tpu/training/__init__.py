"""Training subsystem: loss, steps, schedule, checkpointing, trainer shell."""

from seld_tpu.training.loss import bce_loss, mse_loss, seld_loss  # noqa: F401
from seld_tpu.training.schedule import StepLRState, schedule_from_config  # noqa: F401
from seld_tpu.training.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    get_learning_rate,
    make_eval_step,
    make_infer_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from seld_tpu.training.checkpoint import (  # noqa: F401
    archive_checkpoints,
    load_checkpoint,
    save_checkpoint,
)
from seld_tpu.training.trainer import Trainer  # noqa: F401
