"""Depth-consistency losses between model pairs.

The plain variants (…Loss01, CoarseFineConsistencyLoss01) are unmasked depth
MSEs. The reliable variants (…Loss02) arbitrate which model's depth is
trustworthy per ray by reprojecting the backprojected 3-D point into the
closest other training view and comparing 5x5 image patches: the model whose
patch matches the source view better (RMSE below threshold) becomes the
stop-gradient teacher for the other.

Reference: PointsAugmentationDepthLoss02 / ViewsAugmentationDepthLoss02 /
CoarseFineConsistencyLoss02 (identical arbitration core, reference
src/loss_functions/CoarseFineConsistencyLoss02.py:96-222); plus the
sparse-depth branch where fine (supervised by COLMAP) teaches coarse
(:174-189).

TPU design: everything is static-shaped masked math — the reference's
boolean-index filtering becomes multiply-by-mask with the NeRF-ray count as
denominator, and the 5x5 patch loop becomes an unrolled 25-offset gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simplenerf_tpu.geometry import projection
from simplenerf_tpu.losses.common import (
    closest_other_frame,
    gather_patches,
    mean_over_mask_count,
    patch_rmse,
)


_PLAIN_MAP_NAMES = {
    "points_augmentation_": "PointsAugmentationDepthLoss01",
    "views_augmentation_": "ViewsAugmentationDepthLoss01",
}
_RELIABLE_MAP_NAMES = {
    "points_augmentation_": "PointsAugmentationDepthLoss02",
    "views_augmentation_": "ViewsAugmentationDepthLoss02",
}


def make_plain_depth_consistency(prefix: str, aug_fine_present: bool = False):
    """Unmasked depth MSE main<->augmented (…Loss01 variants).

    Means over the WHOLE batch (including sparse-depth rays), as the
    reference does (PointsAugmentationDepthLoss01.py:57-74). Loss map:
    the per-ray squared error, keyed `{Stem}_{level}` (reference
    compute_depth_loss + update_loss_map_dict suffixing).
    """
    map_name = _PLAIN_MAP_NAMES[prefix]

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        total = 0.0
        maps = {}
        for level in ("coarse", "fine") if aug_fine_present else ("coarse",):
            main_key, aug_key = f"depth_{level}", f"{prefix}depth_{level}"
            if main_key in outputs and aug_key in outputs:
                sq = jnp.square(outputs[main_key] - outputs[aug_key])
                total += jnp.mean(sq)
                maps[f"{map_name}_{level}"] = sq
        return (total, maps) if return_maps else total

    return loss_fn


def make_plain_coarse_fine_consistency():
    """Unmasked coarse<->fine depth MSE (CoarseFineConsistencyLoss01.py:25-49).

    Loss map: per-ray squared error keyed `CoarseFineConsistencyLoss01`
    (unsuffixed — one map for the pair, reference :45-47)."""

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        if "depth_coarse" not in outputs or "depth_fine" not in outputs:
            return (jnp.asarray(0.0), {}) if return_maps else jnp.asarray(0.0)
        sq = jnp.square(outputs["depth_coarse"] - outputs["depth_fine"])
        value = jnp.mean(sq)
        if return_maps:
            return value, {"CoarseFineConsistencyLoss01": sq}
        return value

    return loss_fn


def _clip_depth(depth: jnp.ndarray, batch: dict, depth_clip):
    """Clamp metric depth at depth_clip x the scene far plane (see
    reliable_depth_consistency). Identity when depth_clip is None."""
    if depth_clip is None:
        return depth
    return jnp.minimum(depth, depth_clip * batch["far"][:, 0])


def _teaching_sq(diff: jnp.ndarray, batch: dict, depth_huber):
    """Per-ray teaching error: squared, or Huberized at depth_huber x far.

    depth_huber (TPU extension, default None = reference-exact squared
    error): beyond delta = depth_huber * far the loss grows LINEARLY, so
    its gradient is bounded at 2*delta but never zero. Rationale (studies
    6/7): the hard depth_clip buys pole-bounded stability by zeroing the
    teaching gradient exactly on the runaway rays (d min/dx = 0 where it
    binds), which costs far-field geometry in both dtypes; the Huber form
    bounds the pole's gradient without forfeiting the restoring force, so
    stability and depth teaching stop being the same knob.
    """
    sq = jnp.square(diff)
    if depth_huber is None:
        return sq
    delta = depth_huber * batch["far"][:, 0]
    a = jnp.abs(diff)
    return jnp.where(a <= delta, sq, delta * (2.0 * a - delta))


def reliable_depth_consistency(
    depth1: jnp.ndarray,
    depth2: jnp.ndarray,
    batch: dict,
    patch_size: tuple[int, int],
    rmse_threshold: float,
    depth_clip=None,
    depth_huber=None,
    depth_arb_clip=None,
):
    """Patch-reprojection-arbitrated bidirectional depth consistency.

    depth1/depth2: (nr,) metric depths of the two models. Applied on NeRF
    rays only. Returns (loss, map1, map2): the scalar loss (sum of both
    teaching directions) plus the per-ray squared-error maps — map1 is the
    loss ON depth1 (zeroed where model 2 is not the reliable teacher), map2
    the loss ON depth2 (reference compute_loss_nerf's depth_mse_map1/2,
    CoarseFineConsistencyLoss02.py:171-175, masked lanes set to 0 :216-224).

    depth_clip (TPU extension, default None = reference-exact): clamp both
    depths at depth_clip x the scene far plane before arbitration and MSE.
    The NDC->metric conversion 1/(1 - z + 1e-6) (reference SimpleNeRF01.py
    :486-501) is unbounded as z -> 1; rays whose sample weights drift past
    the far plane produce consistency errors quadratic in that pole, which
    bf16 trunk noise amplifies ~80x into loss spikes (RESULTS.md studies
    3-4). Clamping bounds the error where the reference's own value is
    extrapolation beyond the scene anyway, and zeroes the teaching gradient
    on clamped rays (d min/dx = 0 there).

    depth_arb_clip (TPU extension, default None): clamp at arb_clip x far
    ONLY where depth enters the ARBITRATION — the stop-gradient
    backprojection/reprojection that decides the reliability masks — while
    the teaching error keeps the RAW depths. Separates the clamp's two
    effects (studies 6/9 showed the hard clamp's stability costs far-field
    depth): reprojection coordinates stay bounded (no off-scene
    extrapolation, no int32 coordinate blow-up on pole rays), but the
    restoring gradient on a runaway ray is never zeroed.
    """
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    depth1 = _clip_depth(depth1, batch, depth_clip)
    depth2 = _clip_depth(depth2, batch, depth_clip)
    # Arbitration-only view of the depths (identity unless depth_arb_clip).
    depth1_arb = _clip_depth(depth1, batch, depth_arb_clip)
    depth2_arb = _clip_depth(depth2, batch, depth_arb_clip)
    nerf_mask = batch["indices_mask_nerf"]
    pixel_ids = batch["pixel_id"]
    scene = batch["common"]
    images, poses, intrinsics = scene["images"], scene["poses"], scene["intrinsics"]
    n, h, w, _ = images.shape
    py, px = patch_size
    hpy, hpx = py // 2, px // 2

    image_ids = pixel_ids[:, 0].astype(jnp.int32)
    x_a = pixel_ids[:, 1].astype(jnp.int32)
    y_a = pixel_ids[:, 2].astype(jnp.int32)

    closest = closest_other_frame(poses)  # (n,)
    image_ids_b = jnp.take(closest, image_ids)
    poses_b = jnp.take(poses, image_ids_b, axis=0)

    # Backproject at each model's (detached) depth and reproject into view b.
    pts1 = rays_o + rays_d * jax.lax.stop_gradient(depth1_arb)[..., None]
    pts2 = rays_o + rays_d * jax.lax.stop_gradient(depth2_arb)[..., None]
    pos1 = jnp.round(projection.reproject(pts1, poses_b, intrinsics[0])).astype(jnp.int32)
    pos2 = jnp.round(projection.reproject(pts2, poses_b, intrinsics[0])).astype(jnp.int32)
    x1b, y1b = pos1[:, 0], pos1[:, 1]
    x2b, y2b = pos2[:, 0], pos2[:, 1]

    def in_bounds(x, y):
        return (x >= hpx) & (x < w - hpx) & (y >= hpy) & (y < h - hpy)

    valid_a = in_bounds(x_a, y_a)
    valid_1b = in_bounds(x1b, y1b)
    valid_2b = in_bounds(x2b, y2b)

    patches_a = gather_patches(images, image_ids, x_a, y_a, py, px)
    patches_1b = gather_patches(images, image_ids_b, x1b, y1b, py, px)
    patches_2b = gather_patches(images, image_ids_b, x2b, y2b, py, px)

    rmse1 = patch_rmse(patches_a, patches_1b)
    rmse2 = patch_rmse(patches_a, patches_2b)

    # maskK true where model K is the more reliable one.
    mask1 = ((rmse1 < rmse2) | ~valid_2b) & (rmse1 < rmse_threshold) & valid_1b & valid_a
    mask2 = ((rmse2 < rmse1) | ~valid_1b) & (rmse2 < rmse_threshold) & valid_2b & valid_a

    sq12 = _teaching_sq(depth1 - jax.lax.stop_gradient(depth2), batch, depth_huber)
    sq21 = _teaching_sq(depth2 - jax.lax.stop_gradient(depth1), batch, depth_huber)
    # Model 2 reliable -> teach model 1 (and vice versa); normalize by the
    # NeRF-ray count like the reference's mean over the filtered vector.
    sel1 = (mask2 & nerf_mask).astype(sq12.dtype)
    sel2 = (mask1 & nerf_mask).astype(sq21.dtype)
    loss1 = mean_over_mask_count(sq12, mask2 & nerf_mask, nerf_mask)
    loss2 = mean_over_mask_count(sq21, mask1 & nerf_mask, nerf_mask)
    return loss1 + loss2, sq12 * sel1, sq21 * sel2


def make_reliable_depth_consistency(
    prefix: str,
    patch_size: tuple[int, int] = (5, 5),
    rmse_threshold: float = 0.1,
    aug_fine_present: bool = False,
    depth_clip=None,
    depth_huber=None,
    depth_arb_clip=None,
):
    """…AugmentationDepthLoss02 for `prefix` in {'points_augmentation_', 'views_augmentation_'}.

    Loss maps keyed `{Stem}_{level}_{main,augmented}` (reference
    PointsAugmentationDepthLoss02.py:69-75)."""
    map_name = _RELIABLE_MAP_NAMES[prefix]

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        total = 0.0
        maps = {}
        levels = ("coarse", "fine") if aug_fine_present else ("coarse",)
        for level in levels:
            main_key, aug_key = f"depth_{level}", f"{prefix}depth_{level}"
            if main_key in outputs and aug_key in outputs:
                value, map_main, map_aug = reliable_depth_consistency(
                    outputs[main_key], outputs[aug_key], batch, patch_size,
                    rmse_threshold, depth_clip, depth_huber, depth_arb_clip,
                )
                total += value
                maps[f"{map_name}_{level}_main"] = map_main
                maps[f"{map_name}_{level}_augmented"] = map_aug
        return (total, maps) if return_maps else total

    return loss_fn


def make_reliable_coarse_fine_consistency(
    patch_size: tuple[int, int] = (5, 5),
    rmse_threshold: float = 0.1,
    sparse_depth_enabled: bool = True,
    depth_clip=None,
    depth_huber=None,
    depth_arb_clip=None,
):
    """CoarseFineConsistencyLoss02: arbitrated coarse<->fine + the sparse-depth
    branch where detached fine depth teaches coarse (reference :174-189).

    Loss maps keyed `CoarseFineConsistencyLoss02_{coarse,fine}`; the sparse-
    depth branch's map is ADDED to the coarse map (reference :84-91)."""

    def loss_fn(batch: dict, outputs: dict, return_maps: bool = False):
        if "depth_coarse" not in outputs or "depth_fine" not in outputs:
            return (jnp.asarray(0.0), {}) if return_maps else jnp.asarray(0.0)
        dc = _clip_depth(outputs["depth_coarse"], batch, depth_clip)
        df = _clip_depth(outputs["depth_fine"], batch, depth_clip)
        total, map_coarse, map_fine = reliable_depth_consistency(
            dc, df, batch, patch_size, rmse_threshold,
            depth_huber=depth_huber, depth_arb_clip=depth_arb_clip,
        )
        if sparse_depth_enabled and "indices_mask_sparse_depth" in batch:
            sd_mask = batch["indices_mask_sparse_depth"]
            sq = _teaching_sq(dc - jax.lax.stop_gradient(df), batch, depth_huber)
            total += mean_over_mask_count(sq, sd_mask, sd_mask)
            map_coarse = map_coarse + sq * sd_mask.astype(sq.dtype)
        if return_maps:
            return total, {
                "CoarseFineConsistencyLoss02_coarse": map_coarse,
                "CoarseFineConsistencyLoss02_fine": map_fine,
            }
        return total

    return loss_fn
