"""Loss dispatch with per-iteration weight schedules.

The reference's importlib-based LossComputer (src/loss_functions/
LossComputer01.py:12-69) becomes a static registry of pure loss builders:
the loss set and all structural flags are fixed at setup, so the weighted
sum traces into the one fused train step. Per-iteration weights (constant
or stepwise `iter_weights` schedules, LossComputer01.py:54-69) are computed
on the host and passed in as a small vector — no recompilation as schedules
cross thresholds.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.losses import consistency, depth_supervision, photometric, visibility

LossFn = Callable[[dict, dict], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class LossContext:
    """Static structural flags the loss builders need."""

    points_aug_fine: bool = False
    views_aug_fine: bool = False
    sparse_depth_enabled: bool = True


def build_loss(name: str, loss_cfg: dict, ctx: LossContext) -> LossFn:
    patch = tuple(loss_cfg.get("patch_size", (5, 5)))
    thr = float(loss_cfg.get("rmse_threshold", 0.1))
    # Optional consistency-depth clamp at depth_clip x the scene far plane
    # (TPU bf16 spike guard, see consistency.reliable_depth_consistency).
    clip = loss_cfg.get("depth_clip")
    clip = float(clip) if clip is not None else None
    # Optional Huberized teaching error at depth_huber x far (bounded
    # gradient instead of the clamp's zeroed one; consistency._teaching_sq).
    hub = loss_cfg.get("depth_huber")
    hub = float(hub) if hub is not None else None
    # Optional arbitration-only clamp at depth_arb_clip x far (bounds the
    # reprojection/mask inputs, keeps the raw teaching gradient;
    # consistency.reliable_depth_consistency).
    arb = loss_cfg.get("depth_arb_clip")
    arb = float(arb) if arb is not None else None
    builders = {
        "MSE01": lambda: photometric.make_photometric_loss(""),
        "MSE02": lambda: photometric.make_photometric_loss("points_augmentation_"),
        "MSE03": lambda: photometric.make_photometric_loss("views_augmentation_"),
        "SparseDepthMSE01": lambda: depth_supervision.make_sparse_depth_loss(""),
        "SparseDepthMSE02": lambda: depth_supervision.make_sparse_depth_loss(
            "points_augmentation_", ctx.points_aug_fine
        ),
        "SparseDepthMSE03": lambda: depth_supervision.make_sparse_depth_loss(
            "views_augmentation_", ctx.views_aug_fine
        ),
        "DenseDepthMSE01": lambda: depth_supervision.make_dense_depth_loss(),
        "PointsAugmentationDepthLoss01": lambda: consistency.make_plain_depth_consistency(
            "points_augmentation_", ctx.points_aug_fine
        ),
        "PointsAugmentationDepthLoss02": lambda: consistency.make_reliable_depth_consistency(
            "points_augmentation_", patch, thr, ctx.points_aug_fine, clip, hub, arb
        ),
        "ViewsAugmentationDepthLoss01": lambda: consistency.make_plain_depth_consistency(
            "views_augmentation_", ctx.views_aug_fine
        ),
        "ViewsAugmentationDepthLoss02": lambda: consistency.make_reliable_depth_consistency(
            "views_augmentation_", patch, thr, ctx.views_aug_fine, clip, hub, arb
        ),
        "CoarseFineConsistencyLoss01": lambda: consistency.make_plain_coarse_fine_consistency(),
        "CoarseFineConsistencyLoss02": lambda: consistency.make_reliable_coarse_fine_consistency(
            patch, thr, ctx.sparse_depth_enabled, clip, hub, arb
        ),
        "VisibilityLoss01": lambda: visibility.make_visibility_loss(),
        "VisibilityPriorLoss01": lambda: visibility.make_visibility_prior_loss(),
    }
    if name not in builders:
        raise ValueError(f"Unknown loss function: {name}")
    return builders[name]()


class LossComputer:
    """Holds the configured loss set; `compute` is pure and jit-safe."""

    def __init__(self, loss_specs: Sequence[dict], ctx: LossContext = LossContext()):
        self.specs = list(loss_specs)
        self.names = [spec["name"] for spec in self.specs]
        self.fns = [build_loss(spec["name"], spec, ctx) for spec in self.specs]

    def weight(self, spec: dict, iter_num: int) -> float:
        if "weight" in spec:
            return float(spec["weight"])
        if "iter_weights" in spec:
            thresholds = sorted(int(k) for k in spec["iter_weights"])
            w = None
            for t in thresholds:
                if iter_num >= t:
                    w = spec["iter_weights"][str(t)]
            if w is None:
                raise RuntimeError(f"no weight for {spec['name']} at iter {iter_num}")
            return float(w)
        raise RuntimeError(f"loss spec {spec['name']} has no weight")

    def weights_vector(self, iter_num: int) -> np.ndarray:
        """Host-side: the per-loss weights at this iteration."""
        return np.array([self.weight(s, iter_num) for s in self.specs], dtype=np.float32)

    def compute(self, batch: dict, outputs: dict, weights: jnp.ndarray,
                return_loss_maps: bool = False):
        """Weighted total + per-loss raw values. Trace-safe (static loss list).

        With `return_loss_maps` (the reference's LossComputer01.compute_losses
        flag, :33-52) also returns a flat {map_name: (nr,)} dict following the
        reference's `{LossFileStem}_{level}` key grammar (LossUtils01.py:7-10);
        map names are unique across losses so flattening loses nothing.
        """
        values = {}
        maps = {}
        total = 0.0
        for i, (name, fn) in enumerate(zip(self.names, self.fns)):
            if return_loss_maps:
                v, loss_maps = fn(batch, outputs, return_maps=True)
                maps.update(loss_maps)
            else:
                v = fn(batch, outputs)
            values[name] = v
            total = total + weights[i] * v
        values["TotalLoss"] = total
        if return_loss_maps:
            return total, values, maps
        return total, values
