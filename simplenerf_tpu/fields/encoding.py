"""Sinusoidal positional encoding (jnp, fused-friendly).

Channel layout intentionally matches the reference PositionalEncoder
(src/models/SimpleNeRF01.py:525-557): identity first, then per-frequency
[sin(x*2^0), cos(x*2^0), sin(x*2^1), ...], each applied to all input dims.
Frequencies ascend, so slicing the first (2*d+1)*3 channels yields exactly a
degree-d encoding — the property the points-augmentation "simpler model"
relies on (SimpleNeRF01.py:576-578,630-633).

The encode is a handful of VPU transcendentals feeding the first MLP matmul;
XLA fuses it into the matmul's producer, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax.numpy as jnp


def out_dim(degree: int, input_dims: int = 3) -> int:
    """Channels produced for `degree` frequency octaves (incl. identity)."""
    return (2 * degree + 1) * input_dims


def encode(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Positional-encode (..., d) -> (..., (2*degree+1)*d).

    degree == number of frequency octaves, 2^0 .. 2^(degree-1) (log-sampled,
    matching MLP.get_positional_encoder reference SimpleNeRF01.py:611-624).
    """
    if degree == 0:
        return x
    feats = [x]
    for i in range(degree):
        scaled = x * (2.0**i)
        feats.append(jnp.sin(scaled))
        feats.append(jnp.cos(scaled))
    return jnp.concatenate(feats, axis=-1)
