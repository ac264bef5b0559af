from simplenerf_tpu.geometry import poses, projection, rays

__all__ = ["poses", "rays", "projection"]
