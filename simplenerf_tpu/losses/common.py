"""Shared masked-reduction and patch-gather primitives for the loss stack.

Every loss runs on fixed-shape ray batches in which the NeRF rays and
sparse-depth rays are distinguished by boolean masks, never by dynamic
slicing — the reference's `indices_mask_nerf` / `indices_mask_sparse_depth`
design (src/data_preprocessors/DataPreprocessor01.py:568-585) maps directly
onto static TPU shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `values` over lanes where mask is True; 0 if mask is empty.

    Equivalent to the reference's `x[mask].mean()` pattern with its
    empty-selection guard (e.g. MSE01.compute_mse, reference
    src/loss_functions/MSE01.py:55-67).
    """
    mask = mask.astype(values.dtype)
    count = jnp.sum(mask)
    return jnp.where(count > 0, jnp.sum(values * mask) / jnp.maximum(count, 1.0), 0.0)


def mean_over_mask_count(values: jnp.ndarray, zero_mask: jnp.ndarray, count_mask: jnp.ndarray) -> jnp.ndarray:
    """sum(values * zero_mask) / count(count_mask).

    The arbitrated depth losses zero out unselected lanes but normalize by
    the full NeRF-ray count (compute_depth_mse over the filtered vector,
    reference src/loss_functions/PointsAugmentationDepthLoss02.py:194-212).
    """
    count = jnp.sum(count_mask.astype(values.dtype))
    total = jnp.sum(values * zero_mask.astype(values.dtype))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def gather_patches(
    images: jnp.ndarray,
    image_ids: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    patch_y: int,
    patch_x: int,
) -> jnp.ndarray:
    """Gather (py, px) image patches centred at integer pixel coords.

    images: (n, h, w, c); image_ids/x/y: (nr,) int32.
    Returns (nr, py, px, c). Coordinates are clamped to the image — border
    lanes produce edge-padded patches, which only ever feed don't-care lanes
    (the callers' validity masks exclude border rays, mirroring the reference
    loop gather at CoarseFineConsistencyLoss02.py:144-158).

    TPU note: a static 25-offset unrolled gather over a flat (n*h*w, c)
    array — XLA emits vectorized dynamic-gathers, no scatter/serial loop.
    Measured optimal (scripts/kernel_lab14.py shootout, round 4): 0.30
    ms/site vs 3.45 for vmapped (5,15) dynamic_slice spans (near-serial
    lowering), 0.36 for a single fused (nr*25, c) take. Keep as is.
    """
    n, h, w, c = images.shape
    flat = images.reshape(n * h * w, c)
    hy, hx = patch_y // 2, patch_x // 2
    rows = []
    for dy in range(-hy, hy + 1):
        cols = []
        yy = jnp.clip(y + dy, 0, h - 1)
        for dx in range(-hx, hx + 1):
            xx = jnp.clip(x + dx, 0, w - 1)
            idx = image_ids * (h * w) + yy * w + xx
            cols.append(jnp.take(flat, idx, axis=0))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (nr, py, px, c)


def patch_rmse(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """(nr, py, px, c) x2 -> (nr,) root-mean-square error per patch."""
    return jnp.sqrt(jnp.mean(jnp.square(p1 - p2), axis=(1, 2, 3)))


def closest_other_frame(poses: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest *other* camera for each frame.

    poses: (n, 4, 4) normalized poses whose [:3, 3] are camera origins.
    Second-smallest distance per row, as in the reference's
    `kthvalue(distances, 2)` (CoarseFineConsistencyLoss02.py:121-126); ties
    are don't-care.
    """
    origins = poses[:, :3, 3]
    d2 = jnp.sum(jnp.square(origins[:, None, :] - origins[None, :, :]), axis=-1)
    return jnp.argsort(d2, axis=1)[:, 1]
