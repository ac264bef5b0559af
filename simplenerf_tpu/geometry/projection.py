"""Reprojection and NDC<->metric depth conversions (device-side, jnp).

Used inside the fused train step by the patch-reprojection consistency
losses and the depth supervision path. All functions are shape-polymorphic
over leading ray dimensions and jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# Flips NeRF world axes back to the OpenCV camera convention before applying
# the intrinsic matrix (reference src/utils/CommonUtils01.py:62-66).
_REPROJECT_FLIP = jnp.diag(jnp.array([1.0, -1.0, -1.0], dtype=jnp.float32))


def reproject(points: jnp.ndarray, w2c_poses: jnp.ndarray, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Project world points into other cameras' pixel coordinates.

    points: (..., 3) world points; w2c_poses: (..., 4, 4) per-point target
    poses (in the normalized frame, stored as recentred transforms whose
    [:3,:3] is R_c2w and [:3,3] the camera origin); intrinsic: (3, 3).

    Mirrors CommonUtils01.reproject (reference src/utils/CommonUtils01.py:45-71)
    including its use of a single shared intrinsic for all rays.
    Returns (..., 2) pixel positions (x, y).
    """
    origins = w2c_poses[..., :3, 3]
    rotations = w2c_poses[..., :3, :3]
    dirs = points - origins
    cam = jnp.einsum("ij,...kj,...k->...i", _REPROJECT_FLIP.astype(points.dtype), rotations, dirs)
    pix = cam @ intrinsic.T
    return pix[..., :2] / pix[..., 2:3]


def depth_from_ndc(z_ndc: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray, near: float = 1.0) -> jnp.ndarray:
    """Convert NDC z values to metric depth along the original (world) ray.

    z_ndc: (..., s); rays_o/rays_d: (..., 3) un-projected rays. Matches
    SimpleNeRF01.convert_depth_from_ndc (reference
    src/models/SimpleNeRF01.py:485-502), including the 1e-3 guard at z=1.
    """
    oz = rays_o[..., 2:3]
    dz = rays_d[..., 2:3]
    tn = -(near + oz) / dz
    guard = jnp.where(z_ndc == 1.0, 1e-3, 0.0)
    return (oz + tn * dz) / dz * (1.0 / (1.0 - z_ndc + guard) - 1.0) + tn


def depth_to_ndc(depths: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray, near: float = 1.0) -> jnp.ndarray:
    """Convert metric depth (along-ray t in the normalized frame) to NDC z.

    Inverse of depth_from_ndc; matches DataPreprocessor01.convert_depth_to_ndc
    (reference src/data_preprocessors/DataPreprocessor01.py:455-463).
    depths: (..., 1); rays_o/rays_d: (..., 3).
    """
    oz = rays_o[..., 2:]
    dz = rays_d[..., 2:]
    tn = -(near + oz) / dz
    oz_shifted = oz + tn * dz
    return 1.0 - oz_shifted / (oz_shifted + (depths - tn) * dz)
