from gamer_tpu.train.state import TrainState, make_optimizer, OptimizerConfig
from gamer_tpu.train.loop import Trainer, TrainLoopConfig

__all__ = ["TrainState", "make_optimizer", "OptimizerConfig", "Trainer", "TrainLoopConfig"]
