"""Pallas TPU kernels for the hot compute path."""

from simplenerf_tpu.ops import fused_mlp  # noqa: F401
