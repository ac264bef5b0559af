"""Alpha-compositing volume rendering (jnp, fused into the render step).

Pure elementwise/scan math on (num_rays, num_samples) blocks: alpha from
sigma*delta, exclusive cumprod transmittance, weighted sums for RGB, depth
and depth variance. XLA fuses the whole thing with the MLP epilogue; the
cumprod lowers to an efficient associative scan on the VPU.

Matches SimpleNeRF01.volume_rendering (reference src/models/SimpleNeRF01.py
:430-483) including its epsilons: 1e-10 inside the transmittance cumprod,
1e-6 in the depth normalization, infinite last bin 1e10 (metric) / 1.0 (NDC).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from simplenerf_tpu.geometry import projection


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """[1, x0, x0*x1, ...] along the last axis."""
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x], axis=-1), axis=-1)[..., :-1]


def composite(
    sigma: jnp.ndarray,
    rgb: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    ndc: bool = False,
    rays_o_world: Optional[jnp.ndarray] = None,
    rays_d_world: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
    vis2: Optional[jnp.ndarray] = None,
) -> dict:
    """Composite per-sample sigma/rgb into per-ray outputs.

    sigma: (nr, ns); rgb: (3, nr, ns) channel PLANES (samples on the lane
    axis — narrow (nr, ns, 3) arrays lane-pad 42x on TPU, see
    fields.mlp.to_planes); z_vals: (nr, ns) in the sampling space (NDC
    space when ndc=True); rays_d: (nr, 3) in the same space (its norm
    scales the z deltas). For NDC runs, rays_o_world/rays_d_world are the
    unprojected rays used to convert NDC z to metric depth.

    Returns the reference's output contract: rgb (nr, 3), acc, alpha,
    visibility (transmittance), weights, depth, depth_var
    (+ depth_ndc/depth_var_ndc for NDC runs, + visibility2 when `vis2`
    (nr, ns, k) is given).
    """
    inf_depth = 1.0 if ndc else 1e10
    z_ext = jnp.concatenate([z_vals, jnp.full_like(z_vals[..., :1], inf_depth)], axis=-1)
    deltas = (z_ext[..., 1:] - z_ext[..., :-1]) * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    alpha = 1.0 - jnp.exp(-sigma * deltas)
    transmittance = exclusive_cumprod(1.0 - alpha + 1e-10)
    weights = alpha * transmittance

    # Per-channel weighted sums on (nr, ns) planes; (nr, 3) only at the
    # per-ray boundary.
    rgb_map = jnp.sum(weights[None, :, :] * rgb, axis=-1).T
    acc = jnp.sum(weights, axis=-1)

    def expected_depth(z):
        d = jnp.sum(weights * z, axis=-1) / (acc + 1e-6)
        var = jnp.sum(weights * jnp.square(z - d[..., None]), axis=-1)
        return d, var

    out: dict = {}
    if ndc:
        depth_ndc, depth_var_ndc = expected_depth(z_vals)
        z_metric = projection.depth_from_ndc(z_vals, rays_o_world, rays_d_world)
        depth, depth_var = expected_depth(z_metric)
        out["depth_ndc"] = depth_ndc
        out["depth_var_ndc"] = depth_var_ndc
    else:
        depth, depth_var = expected_depth(z_vals)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])

    out.update(
        rgb=rgb_map,
        acc=acc,
        alpha=alpha,
        visibility=transmittance,
        weights=weights,
        depth=depth,
        depth_var=depth_var,
    )

    if vis2 is not None:
        # Expected secondary-view visibility per ray: weighted mean of the
        # per-sample MLP visibility predictions (SimpleNeRF01.py:479-482).
        out["visibility2"] = jnp.sum(weights[..., None] * vis2, axis=-2) / (acc[..., None] + 1e-6)
    return out
