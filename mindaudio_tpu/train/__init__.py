"""Training substrate: train state/step, config, checkpointing, logging.

Supersedes the reference's ``TrainOneStepWithLossScaleCell`` stack
(reference utils/train_one_step.py:13, loss/loss_scale.py:79): bf16 compute
with f32 params removes the need for dynamic loss scaling; gradients are
averaged over the ``data`` mesh axis by GSPMD.
"""

from .checkpoint import (  # noqa: F401
    CheckpointManager,
    average_checkpoints,
    list_steps,
    restore_checkpoint,
    save_checkpoint,
)
from .config import Config, get_config, load_config  # noqa: F401
from .log import get_logger  # noqa: F401
from .profiler import StepTimer, annotate, trace  # noqa: F401
from .state import TrainState, make_train_step  # noqa: F401
