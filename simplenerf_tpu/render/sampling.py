"""Ray sampling: stratified coarse z-values and inverse-CDF importance sampling.

Static shapes throughout — (num_rays, num_samples) — so XLA tiles cleanly.
The fine pass sorts the union of coarse and importance samples per ray; at
192 values this is a cheap per-ray bitonic sort that XLA vectorizes on the
VPU, negligible next to the MLP matmuls.

Reference behavior: SimpleNeRF01.get_z_vals_coarse (:272-302),
get_z_vals_fine (:304-315), sample_pdf (:327-361).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key: Optional[jax.Array],
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_samples: int,
    lindisp: bool = False,
    perturb: bool = True,
) -> jnp.ndarray:
    """Coarse z-values: uniform in depth (or disparity), with stratified jitter.

    near/far: (num_rays, 1). Returns (num_rays, num_samples). perturb=False
    (eval) yields the deterministic linspace; matching the reference's
    train-only jitter (SimpleNeRF01.py:279-301).
    """
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32)
    if not lindisp:
        z = near * (1.0 - t) + far * t
    else:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)

    if perturb and key is not None:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling of `num_samples` points per ray.

    bins: (num_rays, m) sorted bin edges; weights: (num_rays, m-1).
    Matches the reference sample_pdf edge handling: +1e-5 weight floor,
    right-sided searchsorted, degenerate-interval denominator guard
    (SimpleNeRF01.py:328-361). Output is NOT gradient-connected to weights
    (the caller stops gradients, as the reference detaches).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (nr, m)

    if deterministic or key is None:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], num_samples), dtype=cdf.dtype)

    # Vectorized right-sided CDF inversion. A per-row searchsorted (binary
    # search) serializes terribly on TPU; instead compare every sample
    # against every CDF entry — (nr, m, s) elementwise on the VPU — and
    # reduce. "below" = last bin with cdf <= u, "above" = first bin beyond;
    # min/max-with-mask reads the bracketing values without any gather.
    le = cdf[..., :, None] <= u[..., None, :]  # (nr, m, s)

    def last_true(vals):  # max over entries where le
        return jnp.max(jnp.where(le, vals[..., :, None], -jnp.inf), axis=-2)

    def first_false(vals):  # min over entries where ~le, clamped to the end
        m = jnp.min(jnp.where(le, jnp.inf, vals[..., :, None]), axis=-2)
        return jnp.minimum(m, vals[..., -1:])

    cdf_below = jnp.maximum(last_true(cdf), cdf[..., :1])
    cdf_above = first_false(cdf)
    bins_below = jnp.maximum(last_true(bins), jnp.min(bins, axis=-1, keepdims=True))
    bins_above = first_false(bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def fine_z_vals(
    key: Optional[jax.Array],
    z_vals_coarse: jnp.ndarray,
    weights_coarse: jnp.ndarray,
    num_samples_fine: int,
    perturb: bool = True,
) -> jnp.ndarray:
    """Importance samples from the coarse weights, unioned and sorted.

    Uses midpoint bins and drops the first/last coarse weights, as the
    reference does (SimpleNeRF01.py:310-314). Gradients are stopped: the
    fine sample positions are treated as constants.
    """
    z_mid = 0.5 * (z_vals_coarse[..., 1:] + z_vals_coarse[..., :-1])
    z_samples = sample_pdf(
        key, z_mid, weights_coarse[..., 1:-1], num_samples_fine, deterministic=not perturb
    )
    z_samples = jax.lax.stop_gradient(z_samples)
    return jnp.sort(jnp.concatenate([z_vals_coarse, z_samples], axis=-1), axis=-1)
