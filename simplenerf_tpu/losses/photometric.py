"""Photometric (RGB MSE) losses for the main and augmented models.

Reference: MSE01/02/03 (src/loss_functions/MSE{01,02,03}.py) — per-ray RGB
MSE restricted to the NeRF rays (sparse-depth rays excluded via mask).

Loss maps (reference MSE01.compute_mse:55-67 + LossUtils01.update_loss_map_dict):
per-ray channel-mean squared error, keyed `MSE0X_{coarse,fine}`. The reference
emits the masked SUBSET vector; we emit the full-length (nr,) vector with
masked-out lanes zeroed — identical at validation where the mask is all-true
(static TPU shapes, see losses/common.py module docstring).
"""

from __future__ import annotations

import jax.numpy as jnp

from simplenerf_tpu.losses.common import masked_mean

_MAP_NAMES = {"": "MSE01", "points_augmentation_": "MSE02", "views_augmentation_": "MSE03"}


def _rgb_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    per_ray = jnp.mean(jnp.square(pred - target), axis=-1)
    return masked_mean(per_ray, mask), per_ray * mask.astype(per_ray.dtype)


def make_photometric_loss(prefix: str = ""):
    """Build an RGB MSE loss over `{prefix}rgb_{coarse,fine}` outputs.

    prefix '' -> MSE01 (main), 'points_augmentation_' -> MSE02,
    'views_augmentation_' -> MSE03.
    """
    map_name = _MAP_NAMES[prefix]

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        total = 0.0
        maps = {}
        mask = batch["indices_mask_nerf"]
        target = batch["target_rgb"]
        for level in ("coarse", "fine"):
            key = f"{prefix}rgb_{level}"
            if key in outputs:
                value, per_ray = _rgb_mse(outputs[key], target, mask)
                total += value
                maps[f"{map_name}_{level}"] = per_ray
        return (total, maps) if return_maps else total

    return loss_fn
