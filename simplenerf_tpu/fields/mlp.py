"""NeRF field MLP as pure init/apply functions over parameter pytrees.

Architecture matches the reference MLP (src/models/SimpleNeRF01.py:560-715):
points net of depth Dp/width Wp with a skip connection re-injecting the
encoded points after layer 4; heads for sigma (+ optional pre-ReLU Gaussian
noise at train time), view-independent RGB, or a views branch (depth Dv /
width Wv) consuming [feature, encoded view dirs] for view-dependent RGB and
an optional visibility head.

The points-augmentation "simpler model" trick: when `points_sigma_pe_degree`
is set, the points net sees only the low-frequency prefix of the positional
encoding and the remaining high-frequency channels are routed into the views
branch, so geometry is smoothed but color keeps full detail
(SimpleNeRF01.py:576-578,630-633).

TPU notes: each apply is two chains of large [N, W] x [W, W] matmuls — at
~0.8M points per render step these fill the MXU. `dtype` selects the matmul
input precision (bfloat16 by default on TPU) with float32 accumulation via
preferred_element_type; params stay float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from simplenerf_tpu.fields import encoding

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Static architecture config for one NeRF field MLP (hashable, jit-safe)."""

    points_net_depth: int = 8
    views_net_depth: int = 1
    points_net_width: int = 256
    views_net_width: int = 128
    points_pe_degree: int = 10
    views_pe_degree: int = 4
    # Reduced-degree PE for the sigma/points net (points-augmentation trick).
    points_sigma_pe_degree: Optional[int] = None
    use_view_dirs: bool = True
    view_dependent_rgb: bool = True
    predict_visibility: bool = False
    num_samples: int = 64
    skip_layers: tuple[int, ...] = (4,)

    @property
    def full_points_dim(self) -> int:
        return encoding.out_dim(self.points_pe_degree)

    @property
    def points_input_dim(self) -> int:
        if self.points_sigma_pe_degree is not None:
            return encoding.out_dim(self.points_sigma_pe_degree)
        return self.full_points_dim

    @property
    def views_input_dim(self) -> int:
        dim = encoding.out_dim(self.views_pe_degree) if self.use_view_dirs else 0
        if self.points_sigma_pe_degree is not None:
            dim += self.full_points_dim - self.points_input_dim
        return dim

    @property
    def view_dep_outputs(self) -> bool:
        return self.view_dependent_rgb or self.predict_visibility

    @property
    def points_output_dim(self) -> int:
        return 1 + (0 if self.view_dependent_rgb else 3)

    @property
    def views_output_dim(self) -> int:
        return (3 if self.view_dependent_rgb else 0) + (1 if self.predict_visibility else 0)


def _init_dense(key, fan_in: int, fan_out: int) -> dict:
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for weight and bias.

    Same distribution as torch.nn.Linear's default (the reference's init),
    so parity fixtures can share statistics.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def init(key, cfg: MLPConfig) -> Params:
    """Initialize the parameter pytree for one field MLP."""
    params: dict = {}
    keys = iter(jax.random.split(key, cfg.points_net_depth + cfg.views_net_depth + 4))

    pts_layers = []
    in_dim = cfg.points_input_dim
    for i in range(cfg.points_net_depth):
        pts_layers.append(_init_dense(next(keys), in_dim, cfg.points_net_width))
        # Layer i+1 sees [h, encoded_pts] when layer i is a skip layer.
        in_dim = cfg.points_net_width + (cfg.points_input_dim if i in cfg.skip_layers else 0)
    params["pts"] = pts_layers
    params["pts_out"] = _init_dense(next(keys), cfg.points_net_width, cfg.points_output_dim)

    if cfg.view_dep_outputs:
        params["feature"] = _init_dense(next(keys), cfg.points_net_width, cfg.points_net_width)
        views_layers = []
        in_dim = cfg.views_input_dim + cfg.points_net_width
        for _ in range(cfg.views_net_depth):
            views_layers.append(_init_dense(next(keys), in_dim, cfg.views_net_width))
            in_dim = cfg.views_net_width
        params["views"] = views_layers
        params["views_out"] = _init_dense(next(keys), cfg.views_net_width, cfg.views_output_dim)
    return params


def _dense(x: jnp.ndarray, p: dict, dtype) -> jnp.ndarray:
    """MXU matmul at `dtype` with float32 accumulation."""
    return (
        jnp.dot(x.astype(dtype), p["w"].astype(dtype), preferred_element_type=jnp.float32)
        + p["b"]
    )


def apply(
    params: Params,
    cfg: MLPConfig,
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray] = None,
    view_dirs2: Optional[jnp.ndarray] = None,
    noise_std: float = 0.0,
    noise_key=None,
    dtype=jnp.float32,
) -> dict:
    """Evaluate the field at flat points.

    pts: (n, 3); view_dirs: (n, 3) or None; view_dirs2: (n, k, 3) secondary
    view directions for expected-visibility prediction.

    Returns dict with 'sigma' (n, 1), 'rgb' (n, 3), and optionally
    'rgb_view_independent'/'rgb_view_dependent', 'visibility' (n, 1),
    'visibility2' (n, k, 1) — the reference MLP.forward output contract
    (SimpleNeRF01.py:626-654).
    """
    enc_pts = encoding.encode(pts, cfg.points_pe_degree)
    pts_in = enc_pts[..., : cfg.points_input_dim]

    # Trunk activations are stored at the compute dtype (bf16 halves the
    # HBM traffic between layers); matmuls still accumulate in float32 and
    # the output heads below stay float32.
    h = pts_in.astype(dtype)
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(_dense(h, layer, dtype)).astype(dtype)
        if i in cfg.skip_layers:
            h = jnp.concatenate([pts_in.astype(dtype), h], axis=-1)

    pts_out = _dense(h, params["pts_out"], dtype)
    sigma = pts_out[..., :1]
    if noise_std > 0.0 and noise_key is not None:
        sigma = sigma + noise_std * jax.random.normal(noise_key, sigma.shape, sigma.dtype)
    sigma = jax.nn.relu(sigma)
    out = {"sigma": sigma}

    if not cfg.view_dependent_rgb:
        rgb = jax.nn.sigmoid(pts_out[..., 1:4])
        out["rgb_view_independent"] = rgb
        out["rgb"] = rgb

    if cfg.view_dep_outputs:
        feature = _dense(h, params["feature"], dtype).astype(dtype)
        # High-frequency PE channels excluded from the points net feed the
        # views branch instead (points-augmentation routing).
        feature = jnp.concatenate(
            [feature, enc_pts[..., cfg.points_input_dim :].astype(dtype)], axis=-1
        )

        def views_branch(dirs_enc: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
            hv = jnp.concatenate([feat, dirs_enc.astype(dtype)], axis=-1)
            for layer in params["views"]:
                hv = jax.nn.relu(_dense(hv, layer, dtype)).astype(dtype)
            return _dense(hv, params["views_out"], dtype)

        enc_views = (
            encoding.encode(view_dirs, cfg.views_pe_degree) if cfg.use_view_dirs else None
        )
        views_out = views_branch(enc_views, feature)
        ch = 0
        if cfg.view_dependent_rgb:
            rgb = jax.nn.sigmoid(views_out[..., ch : ch + 3])
            out["rgb_view_dependent"] = rgb
            out["rgb"] = rgb
            ch += 3
        if cfg.predict_visibility:
            out["visibility"] = jax.nn.sigmoid(views_out[..., ch : ch + 1])

        if cfg.predict_visibility and view_dirs2 is not None:
            k = view_dirs2.shape[-2]
            enc_views2 = encoding.encode(view_dirs2, cfg.views_pe_degree)
            feat2 = jnp.broadcast_to(feature[..., None, :], (*feature.shape[:-1], k, feature.shape[-1]))
            views_out2 = views_branch(enc_views2, feat2)
            ch2 = 3 if cfg.view_dependent_rgb else 0
            out["visibility2"] = jax.nn.sigmoid(views_out2[..., ch2 : ch2 + 1])
    return out
