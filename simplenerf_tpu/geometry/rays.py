"""Ray generation and NDC projection (device-side, jnp).

TPU-first design: the per-pixel ray cache for a whole scene is computed in
one jitted call and lives in HBM, instead of the reference's host-numpy
per-image loops (src/data_preprocessors/DataPreprocessor01.py:284-349).

Conventions match the reference:
- pixel grid is integer-cornered (x right, y down), +0.5 offsets only for
  mip-NeRF mode (DataPreprocessor01.get_rays :351-368);
- camera dirs flip y,z after the K^-1 backprojection;
- NDC projection is the standard NeRF forward-facing transform after
  shifting origins to the near plane (DataPreprocessor01.get_ndc_rays
  :370-389).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_grid(h: int, w: int, half_pixel: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinate grids, shape (h, w) each, xy-indexed."""
    off = 0.5 if half_pixel else 0.0
    x = jnp.arange(w, dtype=jnp.float32) + off
    y = jnp.arange(h, dtype=jnp.float32) + off
    return jnp.meshgrid(x, y, indexing="xy")


def get_rays(
    h: int, w: int, intrinsic: jnp.ndarray, c2w: jnp.ndarray, half_pixel: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-space ray origins/directions for every pixel of one camera.

    intrinsic: (3, 3); c2w: (4, 4) camera-to-world (normalized frame).
    Returns rays_o, rays_d, each (h, w, 3). rays_d is unnormalized.
    """
    x, y = pixel_grid(h, w, half_pixel)
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # (h, w, 3)
    cam_dirs = pix @ jnp.linalg.inv(intrinsic).T
    cam_dirs = cam_dirs * jnp.array([1.0, -1.0, -1.0], dtype=cam_dirs.dtype)
    rays_d = cam_dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_view_dirs(rays_d: jnp.ndarray) -> jnp.ndarray:
    return rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def ndc_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    h: int,
    w: int,
    focal_x: jnp.ndarray,
    focal_y: jnp.ndarray,
    near: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project rays into NDC space for forward-facing scenes.

    Shapes (..., 3) -> (..., 3). Matches DataPreprocessor01.get_ndc_rays
    (:370-389): origins first slide to the z=-near plane, then the standard
    NeRF NDC mapping is applied.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (w / (2.0 * focal_x)) * ox / oz
    o1 = -1.0 / (h / (2.0 * focal_y)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = -1.0 / (w / (2.0 * focal_x)) * (dx / dz - ox / oz)
    d1 = -1.0 / (h / (2.0 * focal_y)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def get_radii(rays_d: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF pixel cone radii from x-neighbor direction deltas.

    rays_d: (n, h, w, 3) -> radii (n, h, w, 1). Reference:
    DataPreprocessor01.get_radii (:414-421).
    """
    dx = jnp.sqrt(jnp.sum((rays_d[:, :-1] - rays_d[:, 1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[:, -2:-1]], axis=1)
    return dx[..., None] * 2.0 / jnp.sqrt(12.0)


def get_radii_ndc(rays_o_ndc: jnp.ndarray) -> jnp.ndarray:
    """NDC-space cone radii from origin deltas (DataPreprocessor01.py:423-434)."""
    dx = jnp.sqrt(jnp.sum((rays_o_ndc[:, :-1] - rays_o_ndc[:, 1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[:, -2:-1]], axis=1)
    dy = jnp.sqrt(jnp.sum((rays_o_ndc[:, :, :-1] - rays_o_ndc[:, :, 1:]) ** 2, -1))
    dy = jnp.concatenate([dy, dy[:, :, -2:-1]], axis=2)
    return (0.5 * (dx + dy))[..., None] * 2.0 / jnp.sqrt(12.0)
