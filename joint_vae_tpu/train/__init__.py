"""Training stack: optimizer wrapper, TrainState, jitted train/eval steps,
and the epoch-loop Trainer."""

from .optimizers import OptimizerConfig, build_optimizer  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .steps import make_train_step, make_eval_step, warmup_weight  # noqa: F401
