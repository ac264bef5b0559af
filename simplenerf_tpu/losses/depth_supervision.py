"""Depth-prior supervision losses (COLMAP sparse depth, dense depth).

Reference: SparseDepthMSE01/02/03 (src/loss_functions/SparseDepthMSE0*.py)
and DenseDepthMSE01 (src/loss_functions/DenseDepthMSE01.py). Depth targets
are metric (already scaled into the normalized frame by the preprocessor);
predicted depth is the compositor's metric expected depth.

Loss maps: the sparse-depth losses emit none (reference SparseDepthMSE01.py:
68-71 "No loss maps"); DenseDepthMSE01 emits the per-ray squared error keyed
`DenseDepthMSE01_{coarse,fine}` (reference DenseDepthMSE01.py:54-68), here as
full-length vectors with masked-out lanes zeroed.
"""

from __future__ import annotations

import jax.numpy as jnp

from simplenerf_tpu.losses.common import masked_mean


def make_sparse_depth_loss(prefix: str = "", aug_fine_present: bool = False):
    """Sparse-depth MSE on the model selected by the reference's fallback.

    Main model (prefix ''): supervises fine depth if a fine MLP exists, else
    coarse (SparseDepthMSE01.py:38-48). Augmented models: supervise the
    augmented *coarse* depth when no augmented fine MLP exists; when one
    exists, the reference falls back to the MAIN fine depth — a documented
    quirk we reproduce (SparseDepthMSE02.py:37-49, SparseDepthMSE03.py:43-48).
    """

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        if "indices_mask_sparse_depth" not in batch:
            return (jnp.asarray(0.0), {}) if return_maps else jnp.asarray(0.0)
        mask = batch["indices_mask_sparse_depth"]
        target = batch["sparse_depth_values"][:, 0]
        if prefix == "":
            pred = outputs["depth_fine"] if "depth_fine" in outputs else outputs["depth_coarse"]
        else:
            pred = outputs["depth_fine"] if aug_fine_present else outputs[f"{prefix}depth_coarse"]
        value = masked_mean(jnp.square(pred - target), mask)
        return (value, {}) if return_maps else value

    return loss_fn


def make_dense_depth_loss():
    """Dense-depth MSE on NeRF rays, coarse + fine (DenseDepthMSE01.py:26-68)."""

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        if "dense_depth_values" not in batch:
            return (jnp.asarray(0.0), {}) if return_maps else jnp.asarray(0.0)
        mask = batch["indices_mask_nerf"]
        target = batch["dense_depth_values"][:, 0]
        total = 0.0
        maps = {}
        for level in ("coarse", "fine"):
            key = f"depth_{level}"
            if key in outputs:
                sq = jnp.square(outputs[key] - target)
                total += masked_mean(sq, mask)
                maps[f"DenseDepthMSE01_{level}"] = sq * mask.astype(sq.dtype)
        return (total, maps) if return_maps else total

    return loss_fn
