"""Training driver: state, trainer host loop, checkpointing, metrics."""

from pytorch_asr_tpu.training.state import (
    TrainState, build_model, init_train_state, make_eval_step, make_train_step)
from pytorch_asr_tpu.training.trainer import Trainer

__all__ = ["TrainState", "Trainer", "build_model", "init_train_state",
           "make_eval_step", "make_train_step"]
