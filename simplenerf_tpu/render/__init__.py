from simplenerf_tpu.render import renderer, sampling, volume

__all__ = ["sampling", "volume", "renderer"]
