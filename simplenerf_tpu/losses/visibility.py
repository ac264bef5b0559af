"""Visibility-head losses (off in published configs; capability parity).

VisibilityLoss01: ties the MLP's predicted per-sample visibility to the
compositing transmittance via bidirectional detached MAE (reference
src/loss_functions/VisibilityLoss01.py:26-74). Loss map: the per-ray
sample-mean MAE, sum of both directions, keyed `VisibilityLoss01_{level}`
(reference :55-74).

VisibilityPriorLoss01: ViP-NeRF-style prior — penalizes predicted secondary-
view visibility where prior masks say the pixel is visible in other views
(reference src/loss_functions/VisibilityPriorLoss01.py:26-89). Loss map:
the per-ray view-sum masked penalty, keyed `VisibilityPriorLoss01_{level}`
(reference :64-89), full-length with masked-out lanes zeroed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simplenerf_tpu.losses.common import masked_mean


def make_visibility_loss():
    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        total = 0.0
        maps = {}
        for level in ("coarse", "fine"):
            pred_key, target_key = f"raw_visibility_{level}", f"visibility_{level}"
            if pred_key in outputs and target_key in outputs:
                pred = outputs[pred_key]  # (nr, ns) plane
                target = outputs[target_key]  # (nr, ns) transmittance
                map1 = jnp.mean(jnp.abs(pred - jax.lax.stop_gradient(target)), axis=1)
                map2 = jnp.mean(jnp.abs(jax.lax.stop_gradient(pred) - target), axis=1)
                total += jnp.mean(map1) + jnp.mean(map2)
                maps[f"VisibilityLoss01_{level}"] = map1 + map2
        return (total, maps) if return_maps else total

    return loss_fn


def make_visibility_prior_loss():
    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        total = 0.0
        maps = {}
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
            maps[f"VisibilityPriorLoss01_{level}"] = per_ray * mask.astype(per_ray.dtype)
        return (total, maps) if return_maps else total

    return loss_fn
