from simplenerf_tpu.training.lr_decay import make_lr_schedule
from simplenerf_tpu.training.trainer import Trainer

__all__ = ["Trainer", "make_lr_schedule"]
