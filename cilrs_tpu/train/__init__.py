"""Training: jitted train/eval steps, the epoch loop, Orbax checkpointing."""

from cilrs_tpu.train.state import CILRSTrainState, create_train_state  # noqa: F401
from cilrs_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
