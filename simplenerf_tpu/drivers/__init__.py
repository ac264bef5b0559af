from simplenerf_tpu.drivers.presets import simplenerf_config

__all__ = ["simplenerf_config"]
