"""Photometric (RGB MSE) losses for the main and augmented models.

Reference: MSE01/02/03 (src/loss_functions/MSE{01,02,03}.py) — per-ray RGB
MSE restricted to the NeRF rays (sparse-depth rays excluded via mask).
"""

from __future__ import annotations

import jax.numpy as jnp

from simplenerf_tpu.losses.common import masked_mean


def _rgb_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    per_ray = jnp.mean(jnp.square(pred - target), axis=-1)
    return masked_mean(per_ray, mask)


def make_photometric_loss(prefix: str = ""):
    """Build an RGB MSE loss over `{prefix}rgb_{coarse,fine}` outputs.

    prefix '' -> MSE01 (main), 'points_augmentation_' -> MSE02,
    'views_augmentation_' -> MSE03.
    """

    def loss_fn(batch: dict, outputs: dict) -> jnp.ndarray:
        total = 0.0
        mask = batch["indices_mask_nerf"]
        target = batch["target_rgb"]
        for level in ("coarse", "fine"):
            key = f"{prefix}rgb_{level}"
            if key in outputs:
                total += _rgb_mse(outputs[key], target, mask)
        return total

    return loss_fn
