"""simplenerf_tpu: a TPU-native (JAX/XLA/Pallas) sparse-input NeRF framework.

A from-scratch re-design of the capabilities of SimpleNeRF
(NagabhushanSN95/SimpleNeRF, SIGGRAPH Asia 2023) for TPU hardware:

- hierarchical stratified + importance ray sampling, positional-encoded
  MLP sigma/color fields and alpha-compositing volume rendering run as a
  single fused, jitted render step (no host-side chunk loops);
- the paper's augmented simpler models (points-augmentation with reduced
  positional encoding for geometry, Lambertian views-augmentation) are
  trained jointly with patch-reprojection-arbitrated depth-consistency
  losses, coarse-fine consistency and COLMAP sparse-depth priors;
- ray batches shard across a `jax.sharding.Mesh` data axis (params
  replicated, gradients psum over ICI); the same train step runs on one
  chip or a multi-host slice.

Reference behavior is documented per-module with `/root/reference`
file:line citations; the implementation is an independent TPU-first
design, not a translation.
"""

__version__ = "0.1.0"
