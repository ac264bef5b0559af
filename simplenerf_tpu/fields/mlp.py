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

TPU design. `apply` evaluates the network in a lane-friendly "blocked" form:
- the positional encoding is built from ONE (N,3)x(3,3D) matmul + one wide
  sin + one wide cos (encoding.encode_parts), not 2D+1 concatenated 3-lane
  pieces;
- the skip and views-branch concatenations become sums of matmuls over
  row-slices of the canonical weights, so no (N, 319)/(N, 325) concats are
  materialized;
- view directions are encoded once per RAY and tiled to samples
  (view_dirs_tile), instead of encoding the same direction at all 192
  samples.
Parameters stay in the canonical reference channel layout — the blocked
evaluation re-slices weight ROWS by static permutations, so `apply` and
`apply_reference` compute the same function (tested to 1e-5).

`dtype` selects matmul input precision (bfloat16 on TPU) with float32
accumulation; trunk activations are stored at that dtype, heads in float32.
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
    def sigma_pe_degree(self) -> int:
        return (
            self.points_sigma_pe_degree
            if self.points_sigma_pe_degree is not None
            else self.points_pe_degree
        )

    @property
    def points_input_dim(self) -> int:
        return encoding.out_dim(self.sigma_pe_degree)

    @property
    def extra_views_dim(self) -> int:
        return self.full_points_dim - self.points_input_dim

    @property
    def views_input_dim(self) -> int:
        dim = encoding.out_dim(self.views_pe_degree) if self.use_view_dirs else 0
        return dim + self.extra_views_dim

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
        # Layer i+1 sees [encoded_pts, h] when layer i is a skip layer.
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


def _mm(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    return jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)


def _extra_rows_perm(cfg: MLPConfig) -> list[int]:
    """Blocked order of the high-frequency channels within the reference's
    enc_pts[:, P:] row segment of the first views-branch weight."""
    ds, d = cfg.sigma_pe_degree, cfg.points_pe_degree
    p = cfg.points_input_dim
    rows = [3 + 6 * i + j - p for i in range(ds, d) for j in range(3)]  # sin
    rows += [3 + 6 * i + 3 + j - p for i in range(ds, d) for j in range(3)]  # cos
    return rows


def _finalize_heads(cfg, pts_out, h, params, enc_extra, enc_views, dtype,
                    noise_std, noise_key, view_dirs_tile, out):
    sigma = pts_out[..., :1]
    if noise_std > 0.0 and noise_key is not None:
        sigma = sigma + noise_std * jax.random.normal(noise_key, sigma.shape, sigma.dtype)
    out["sigma"] = jax.nn.relu(sigma)

    if not cfg.view_dependent_rgb:
        rgb = jax.nn.sigmoid(pts_out[..., 1:4])
        out["rgb_view_independent"] = rgb
        out["rgb"] = rgb

    if cfg.view_dep_outputs:
        wp = cfg.points_net_width
        e = cfg.extra_views_dim
        wv0 = params["views"][0]
        # Views join as matmul sum over canonical row slices: [feature rows,
        # high-freq extra rows (re-permuted to blocked order), view-dir rows].
        hv = _mm(_dense(h, params["feature"], dtype), wv0["w"][:wp], dtype)
        if e:
            hv = hv + _mm(enc_extra, wv0["w"][wp : wp + e][jnp.array(_extra_rows_perm(cfg))], dtype)
        if cfg.use_view_dirs:
            perm = jnp.array(encoding.blocked_to_reference_perm(cfg.views_pe_degree))
            contrib = _mm(enc_views, wv0["w"][wp + e :][perm], dtype)
            if view_dirs_tile > 1:
                contrib = jnp.broadcast_to(
                    contrib[:, None, :], (contrib.shape[0], view_dirs_tile, contrib.shape[-1])
                ).reshape(-1, contrib.shape[-1])
            hv = hv + contrib
        hv = jax.nn.relu(hv + wv0["b"]).astype(dtype)
        for layer in params["views"][1:]:
            hv = jax.nn.relu(_dense(hv, layer, dtype)).astype(dtype)
        views_out = _dense(hv, params["views_out"], dtype)
        if cfg.view_dependent_rgb:
            rgb = jax.nn.sigmoid(views_out[..., :3])
            out["rgb_view_dependent"] = rgb
            out["rgb"] = rgb
        if cfg.predict_visibility:
            ch = 3 if cfg.view_dependent_rgb else 0
            out["visibility"] = jax.nn.sigmoid(views_out[..., ch : ch + 1])
    return out


def apply(
    params: Params,
    cfg: MLPConfig,
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray] = None,
    view_dirs2: Optional[jnp.ndarray] = None,
    noise_std: float = 0.0,
    noise_key=None,
    dtype=jnp.float32,
    view_dirs_tile: int = 1,
) -> dict:
    """Evaluate the field at flat points (fast blocked path).

    pts: (n, 3); view_dirs: (n, 3), or (n / view_dirs_tile, 3) when
    view_dirs_tile > 1 (one direction per ray, tiled across samples).
    Secondary-view visibility (view_dirs2) routes through apply_reference.

    Returns dict with 'sigma' (n, 1), 'rgb' (n, 3) and the reference MLP
    output contract (SimpleNeRF01.py:626-654).
    """
    if view_dirs2 is not None:
        return apply_reference(
            params, cfg, pts,
            view_dirs=view_dirs, view_dirs2=view_dirs2,
            noise_std=noise_std, noise_key=noise_key, dtype=dtype,
        )

    ds, d = cfg.sigma_pe_degree, cfg.points_pe_degree
    x, s, c = encoding.encode_parts(pts, d)
    x = x.astype(dtype)
    s = s.astype(dtype) if s is not None else None
    c = c.astype(dtype) if c is not None else None
    # Blocked low-frequency input [x | sin f<ds | cos f<ds].
    if d == 0:
        pts_in = x
    else:
        pts_in = jnp.concatenate([x, s[..., : 3 * ds], c[..., : 3 * ds]], axis=-1)
    enc_extra = (
        jnp.concatenate([s[..., 3 * ds :], c[..., 3 * ds :]], axis=-1)
        if cfg.extra_views_dim
        else None
    )

    w0_perm = jnp.array(encoding.blocked_to_reference_perm(ds))
    layer0 = params["pts"][0]
    h = jax.nn.relu(_mm(pts_in, layer0["w"][w0_perm], dtype) + layer0["b"]).astype(dtype)
    for i, layer in enumerate(params["pts"][1:], start=1):
        if (i - 1) in cfg.skip_layers:
            # Skip join as matmul sum: encoded-points rows + hidden rows.
            p = cfg.points_input_dim
            pre = (
                _mm(pts_in, layer["w"][:p][w0_perm], dtype)
                + _mm(h, layer["w"][p:], dtype)
                + layer["b"]
            )
        else:
            pre = _dense(h, layer, dtype)
        h = jax.nn.relu(pre).astype(dtype)

    pts_out = _dense(h, params["pts_out"], dtype)

    enc_views = None
    if cfg.use_view_dirs and cfg.view_dep_outputs:
        xv, sv, cv = encoding.encode_parts(view_dirs, cfg.views_pe_degree)
        enc_views = jnp.concatenate([xv, sv, cv], axis=-1).astype(dtype)

    return _finalize_heads(
        cfg, pts_out, h, params, enc_extra, enc_views, dtype,
        noise_std, noise_key, view_dirs_tile, {},
    )


def to_planes(out: dict, nr: int, ns: int) -> dict:
    """Flat (n, ch) MLP outputs -> the TPU plane layout.

    {"sigma": (nr, ns), "rgb": (3, nr, ns), "visibility": (nr, ns),
     "visibility2": (nr, ns, k)}. Planes keep samples on the 128-lane axis;
    narrow (n, 1)/(n, 3) arrays tile to (8, 128) in HBM — a 128x physical
    blow-up — so per-sample quantities never travel in that shape on TPU.
    """
    planes = {"sigma": out["sigma"].reshape(nr, ns)}
    if "rgb" in out:
        planes["rgb"] = out["rgb"].reshape(nr, ns, 3).transpose(2, 0, 1)
    if "visibility" in out:
        planes["visibility"] = out["visibility"].reshape(nr, ns)
    if "visibility2" in out:
        k = out["visibility2"].shape[-2]
        planes["visibility2"] = out["visibility2"].reshape(nr, ns, k)
    return planes


def apply_fused(
    params: Params,
    cfg: MLPConfig,
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray] = None,
    noise_std: float = 0.0,
    noise_key=None,
    dtype=jnp.float32,
    view_dirs_tile: int = 1,
) -> dict:
    """Evaluate the field through the fully-fused Pallas kernel.

    Same function as `apply` (minus view_dirs2, which stays on the XLA
    path) but returns the PLANE layout of `to_planes`: pts (n, 3) grouped
    as nr = n / view_dirs_tile rays x ns = view_dirs_tile samples;
    view_dirs (nr, 3). The kernel emits raw linear head planes; noise and
    activations are applied here on wide (nr, ns) arrays so semantics
    (incl. noise-before-ReLU sigma, SimpleNeRF01.py:668-672) are identical
    to `to_planes(apply(...))`.
    """
    from simplenerf_tpu.ops import fused_mlp

    n = pts.shape[0]
    ns = view_dirs_tile
    nr = n // ns
    assert nr * ns == n, (n, ns)

    spec = fused_mlp.make_spec(cfg, ns, dtype)
    pad_rays = (-nr) % spec.tile_rays
    pts_in = pts if pad_rays == 0 else jnp.pad(pts, ((0, pad_rays * ns), (0, 0)))

    hvx = None
    if spec.has_hvx:
        xv, sv, cv = encoding.encode_parts(view_dirs, cfg.views_pe_degree)
        enc_views = jnp.concatenate([xv, sv, cv], axis=-1)
        hvx = _mm(enc_views, fused_mlp.dirs_w(params, cfg), dtype)
        if pad_rays:
            hvx = jnp.pad(hvx, ((0, pad_rays), (0, 0)))

    kp = fused_mlp.kernel_params(params, cfg)
    lo, hi = _trunk_inputs(cfg, pts_in, spec.cdtype)
    planes = fused_mlp.fused_apply(spec, kp, lo, hi, hvx)
    if pad_rays:
        planes = tuple(p[:nr] for p in planes)
    return _fused_epilogue(cfg, spec.out_p, planes, noise_std, noise_key)


def _trunk_inputs(cfg: MLPConfig, pts: jnp.ndarray, cdtype):
    """XLA-side blocked PE for the fused kernels: (lo, hi|None).

    lo = [x | sin f<ds | cos f<ds] (N, 3+6ds); hi = [sin f>=ds | cos f>=ds]
    (N, 6(d-ds)) when the points-augmentation sigma-PE split routes
    high-frequency channels to the views branch. The kernels used to encode
    in-VMEM; measured on v5e the narrow-lane sincos/concat relayouts cost
    +52% forward time (scripts/kernel_lab2.py), while XLA fuses this into
    the points producer and streams wide rows to the kernel. Library sincos
    on the WIDE (N, 3d) z beats the cheaper-in-FLOPs angle-doubling ladder
    (`encoding.sincos_ladder`): the ladder's sequential recurrence makes
    XLA materialize 2d narrow (N, 3) intermediates — the (8,128)-tile
    blow-up costs far more than the transcendentals save (measured 66.7k ->
    49.5k rays/s on the full step).
    """
    x, s, c = encoding.encode_parts(pts, cfg.points_pe_degree)
    x = x.astype(cdtype)
    if cfg.points_pe_degree == 0:
        return x, None
    ds, d = cfg.sigma_pe_degree, cfg.points_pe_degree
    lo = jnp.concatenate(
        [x, s[:, : 3 * ds].astype(cdtype), c[:, : 3 * ds].astype(cdtype)], axis=-1
    )
    hi = None
    if cfg.extra_views_dim:
        hi = jnp.concatenate(
            [s[:, 3 * ds : 3 * d].astype(cdtype), c[:, 3 * ds : 3 * d].astype(cdtype)],
            axis=-1,
        )
    return lo, hi


def _fused_epilogue(cfg: MLPConfig, out_p: int, planes, noise_std, noise_key) -> dict:
    """Raw linear head planes -> activated plane-layout outputs.

    Applies noise-before-ReLU sigma (SimpleNeRF01.py:668-672) and the head
    sigmoids on wide (nr, ns) planes; shared by the single-model and
    stacked-ensemble fused paths."""
    out: dict = {}
    sigma = planes[0]
    if noise_std > 0.0 and noise_key is not None:
        sigma = sigma + noise_std * jax.random.normal(noise_key, sigma.shape, sigma.dtype)
    out["sigma"] = jax.nn.relu(sigma)
    if not cfg.view_dependent_rgb:
        out["rgb"] = jax.nn.sigmoid(jnp.stack(planes[1:4], axis=0))
    if cfg.view_dep_outputs:
        vp = planes[out_p:]
        if cfg.view_dependent_rgb:
            out["rgb"] = jax.nn.sigmoid(jnp.stack(vp[:3], axis=0))
        if cfg.predict_visibility:
            ch = 3 if cfg.view_dependent_rgb else 0
            out["visibility"] = jax.nn.sigmoid(vp[ch])
    return out


def apply_fused_ensemble(
    members: list,
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray] = None,
    noise_std: float = 0.0,
    noise_keys=None,
    dtype=jnp.float32,
    view_dirs_tile: int = 1,
    tile_rays: int = 32,
) -> list:
    """Evaluate several field MLPs at the SAME points in one fused kernel.

    The TPU-native form of the reference's repeated coarse evaluations at
    identical sample points (src/models/SimpleNeRF01.py:170-199): one
    pallas_call encodes the points once and runs every member's trunk as an
    interleaved chain (ops.fused_mlp.fused_apply_ensemble).

    members: list of (params, cfg) pairs; pts (n, 3) grouped as
    nr = n / view_dirs_tile rays x ns samples; view_dirs (nr, 3) shared;
    noise_keys: per-member sigma-noise keys (or None). Returns one
    plane-layout output dict per member, identical to running `apply_fused`
    on each member separately.
    """
    from simplenerf_tpu.ops import fused_mlp

    n = pts.shape[0]
    ns = view_dirs_tile
    nr = n // ns
    assert nr * ns == n, (n, ns)
    if noise_keys is None:
        noise_keys = [None] * len(members)

    cfgs = tuple(cfg for _, cfg in members)
    ens = fused_mlp.make_ensemble_spec(cfgs, ns, dtype, tile_rays=tile_rays)
    pad_rays = (-nr) % ens.tile_rays
    pts_in = pts if pad_rays == 0 else jnp.pad(pts, ((0, pad_rays * ns), (0, 0)))

    hvxs = []
    for (params, cfg), m in zip(members, ens.members):
        if m.has_hvx:
            xv, sv, cv = encoding.encode_parts(view_dirs, cfg.views_pe_degree)
            enc_views = jnp.concatenate([xv, sv, cv], axis=-1)
            hvx = _mm(enc_views, fused_mlp.dirs_w(params, cfg), dtype)
            if pad_rays:
                hvx = jnp.pad(hvx, ((0, pad_rays), (0, 0)))
            hvxs.append(hvx)

    # Shared PE: ONE full-degree lo block for every member — the members'
    # input joins are zero-row padded to the shared layout inside
    # kernel_params, so no per-member lo stream or lane slicing exists.
    d_max = max(cfg.points_pe_degree for _, cfg in members)
    kps = tuple(fused_mlp.kernel_params(p, c, shared_degree=d_max) for p, c in members)
    cd = ens.members[0].cdtype
    x_all, s_all, c_all = encoding.encode_parts(pts_in, d_max)
    if d_max == 0:
        lo = x_all.astype(cd)
    else:
        lo = jnp.concatenate(
            [x_all.astype(cd), s_all.astype(cd), c_all.astype(cd)], axis=-1
        )
    planes = fused_mlp.fused_apply_ensemble(ens, kps, lo, tuple(hvxs))

    outs = []
    pos = 0
    for (params, cfg), m, nkey in zip(members, ens.members, noise_keys):
        member_planes = planes[pos : pos + m.n_planes]
        pos += m.n_planes
        if pad_rays:
            member_planes = tuple(p[:nr] for p in member_planes)
        outs.append(_fused_epilogue(cfg, m.out_p, member_planes, noise_std, nkey))
    return outs


def apply_reference(
    params: Params,
    cfg: MLPConfig,
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray] = None,
    view_dirs2: Optional[jnp.ndarray] = None,
    noise_std: float = 0.0,
    noise_key=None,
    dtype=jnp.float32,
) -> dict:
    """Direct transcription of the reference forward (concat-based layout).

    Used by the visibility2 path and as the equivalence oracle for `apply`.
    view_dirs: (n, 3); view_dirs2: (n, k, 3).
    """
    enc_pts = encoding.encode(pts, cfg.points_pe_degree)
    pts_in = enc_pts[..., : cfg.points_input_dim]

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
            feat2 = jnp.broadcast_to(
                feature[..., None, :], (*feature.shape[:-1], k, feature.shape[-1])
            )
            views_out2 = views_branch(enc_views2, feat2)
            ch2 = 3 if cfg.view_dependent_rgb else 0
            out["visibility2"] = jax.nn.sigmoid(views_out2[..., ch2 : ch2 + 1])
    return out
