"""Depth-prior supervision losses (COLMAP sparse depth, dense depth).

Reference: SparseDepthMSE01/02/03 (src/loss_functions/SparseDepthMSE0*.py)
and DenseDepthMSE01 (src/loss_functions/DenseDepthMSE01.py). Depth targets
are metric (already scaled into the normalized frame by the preprocessor);
predicted depth is the compositor's metric expected depth.
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

    def loss_fn(batch: dict, outputs: dict) -> jnp.ndarray:
        if "indices_mask_sparse_depth" not in batch:
            return jnp.asarray(0.0)
        mask = batch["indices_mask_sparse_depth"]
        target = batch["sparse_depth_values"][:, 0]
        if prefix == "":
            pred = outputs["depth_fine"] if "depth_fine" in outputs else outputs["depth_coarse"]
        else:
            pred = outputs["depth_fine"] if aug_fine_present else outputs[f"{prefix}depth_coarse"]
        return masked_mean(jnp.square(pred - target), mask)

    return loss_fn


def make_dense_depth_loss():
    """Dense-depth MSE on NeRF rays, coarse + fine (DenseDepthMSE01.py:26-68)."""

    def loss_fn(batch: dict, outputs: dict) -> jnp.ndarray:
        if "dense_depth_values" not in batch:
            return jnp.asarray(0.0)
        mask = batch["indices_mask_nerf"]
        target = batch["dense_depth_values"][:, 0]
        total = 0.0
        for level in ("coarse", "fine"):
            key = f"depth_{level}"
            if key in outputs:
                total += masked_mean(jnp.square(outputs[key] - target), mask)
        return total

    return loss_fn
