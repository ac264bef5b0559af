from simplenerf_tpu.losses.computer import LossComputer, LossContext

__all__ = ["LossComputer", "LossContext"]
