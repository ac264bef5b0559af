from simplenerf_tpu.fields import encoding, mlp

__all__ = ["encoding", "mlp"]
