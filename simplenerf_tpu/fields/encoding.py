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


def frequency_matrix(degree: int, input_dims: int = 3) -> jnp.ndarray:
    """B (d, d*degree) with B[j, d*i + j] = 2^i: one matmul scales every
    input dim by every frequency."""
    b = jnp.zeros((input_dims, input_dims * degree), jnp.float32)
    for i in range(degree):
        for j in range(input_dims):
            b = b.at[j, input_dims * i + j].set(2.0**i)
    return b


def encode_parts(x: jnp.ndarray, degree: int):
    """(x, sin, cos) blocks, sin/cos shaped (..., 3*degree), frequency-major.

    TPU-friendly PE: one (N, 3) x (3, 3*degree) matmul builds all scaled
    coordinates, then a single sin and a single cos over a wide tensor —
    instead of 2*degree transcendentals + a 2*degree+1-piece concatenate on
    3-lane tensors. Semantically identical to `encode` up to the channel
    permutation given by `blocked_to_reference_perm`.
    """
    if degree == 0:
        return x, None, None
    z = x @ frequency_matrix(degree, x.shape[-1]).astype(x.dtype)
    return x, jnp.sin(z), jnp.cos(z)


def sincos_ladder(x: jnp.ndarray, degree: int, anchor_stride: int = 4):
    """(sin, cos) blocks like `encode_parts`, via angle-doubling recurrences.

    Library sin/cos are the PE's real cost on TPU (~30 VPU ops/element; the
    published fine pass evaluates 47M of them — measured ~2 ms/pass,
    scripts/kernel_lab5.py). Octave i+1 follows from octave i with 3 mults
    and an add:  sin 2a = 2 sin a cos a,  cos 2a = 1 - 2 sin^2 a.
    Every `anchor_stride`-th octave is recomputed with library sin/cos so
    absolute error stays ~2^anchor_stride ulp (~2e-6 f32 for stride 4, far
    below the bf16 cast these channels immediately undergo on the compute
    path). Output channel order matches `encode_parts` (octave-major).

    NOT used on the compute path: the recurrence chains octave i+1 on
    octave i, so XLA materializes 2*degree NARROW (N, 3) intermediates
    whose (8, 128) tile padding costs far more HBM than the saved
    transcendentals (full-step 66.7k -> 49.5k rays/s measured on v5e).
    Kept as the measured negative result + for hosts without fast sincos.
    """
    if degree == 0:
        return None, None
    ss, cs = [], []
    for i in range(degree):
        if i % anchor_stride == 0:
            zi = x * (2.0**i)
            ss.append(jnp.sin(zi))
            cs.append(jnp.cos(zi))
        else:
            s, c = ss[-1], cs[-1]
            ss.append(2.0 * s * c)
            cs.append(1.0 - 2.0 * s * s)
    return jnp.concatenate(ss, axis=-1), jnp.concatenate(cs, axis=-1)


def blocked_to_reference_perm(degree: int, input_dims: int = 3):
    """perm such that encode(x)[..., perm[k]] == blocked channel k, where the
    blocked layout is [x | sin(f0..f_{D-1}) | cos(f0..f_{D-1})].

    Used to re-slice weight ROWS initialized against the reference layout
    [x | sin f0 | cos f0 | sin f1 | ...] so the fast blocked evaluation
    computes exactly the same function.
    """
    d = input_dims
    perm = list(range(d))
    for i in range(degree):  # sin block
        perm.extend(d + 2 * d * i + j for j in range(d))
    for i in range(degree):  # cos block
        perm.extend(d + 2 * d * i + d + j for j in range(d))
    return perm


def reference_slice_to_blocked(channels, degree: int, input_dims: int = 3):
    """Map a list of reference-layout channel indices to positions in the
    blocked layout (inverse lookup of blocked_to_reference_perm)."""
    perm = blocked_to_reference_perm(degree, input_dims)
    inverse = {ref: blocked for blocked, ref in enumerate(perm)}
    return [inverse[c] for c in channels]
