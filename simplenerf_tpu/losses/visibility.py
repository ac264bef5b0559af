"""Visibility-head losses (off in published configs; capability parity).

VisibilityLoss01: ties the MLP's predicted per-sample visibility to the
compositing transmittance via bidirectional detached MAE (reference
src/loss_functions/VisibilityLoss01.py:26-74).

VisibilityPriorLoss01: ViP-NeRF-style prior — penalizes predicted secondary-
view visibility where prior masks say the pixel is visible in other views
(reference src/loss_functions/VisibilityPriorLoss01.py:26-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simplenerf_tpu.losses.common import masked_mean


def make_visibility_loss():
    def loss_fn(batch: dict, outputs: dict) -> jnp.ndarray:
        total = 0.0
        for level in ("coarse", "fine"):
            pred_key, target_key = f"raw_visibility_{level}", f"visibility_{level}"
            if pred_key in outputs and target_key in outputs:
                pred = outputs[pred_key]  # (nr, ns) plane
                target = outputs[target_key]  # (nr, ns) transmittance
                mae1 = jnp.mean(jnp.abs(pred - jax.lax.stop_gradient(target)))
                mae2 = jnp.mean(jnp.abs(jax.lax.stop_gradient(pred) - target))
                total += mae1 + mae2
        return total

    return loss_fn


def make_visibility_prior_loss():
    def loss_fn(batch: dict, outputs: dict) -> jnp.ndarray:
        total = 0.0
        mask = batch["indices_mask_nerf"]
        for level in ("coarse", "fine"):
            key = f"visibility2_{level}"
            if key not in outputs:
                continue
            vis2 = outputs[key]  # (nr, nf-1)
            if "visibility_prior_masks" in batch:
                prior = batch["visibility_prior_masks"]
            elif "visibility_prior_weights" in batch:
                prior = batch["visibility_prior_weights"]
            else:
                prior = jnp.ones_like(vis2)
            per_ray = jnp.sum(prior * (1.0 - vis2), axis=-1)
            total += masked_mean(per_ray, mask)
        return total

    return loss_fn
