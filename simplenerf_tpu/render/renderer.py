"""The fused SimpleNeRF render step.

One function renders a whole ray batch through the full hierarchy — coarse
stratified sampling, main/points-aug/views-aug coarse MLPs, inverse-CDF
importance sampling, fine MLP, compositing — with no host-side chunk loops.
Under `jax.jit` this is a single XLA program: the reference's `chunk`/
`netchunk` serial batching (src/models/SimpleNeRF01.py:81-106,394-428) is
replaced by static-shaped batches sized to HBM, and the per-MLP evaluations
become back-to-back MXU matmul chains that XLA pipelines.

Output dict follows the reference key grammar
`{prefix}{quantity}_{coarse|fine}` with `raw_*` per-sample outputs in train
mode (SimpleNeRF01.render_rays :108-270), so losses and QA read identically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from simplenerf_tpu.fields import mlp as mlp_lib
from simplenerf_tpu.render import sampling, volume

Params = Any


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (hashable; safe to close over in jit)."""

    coarse_mlp: Optional[mlp_lib.MLPConfig]
    fine_mlp: Optional[mlp_lib.MLPConfig] = None
    points_aug_coarse_mlp: Optional[mlp_lib.MLPConfig] = None
    points_aug_fine_mlp: Optional[mlp_lib.MLPConfig] = None
    views_aug_coarse_mlp: Optional[mlp_lib.MLPConfig] = None
    views_aug_fine_mlp: Optional[mlp_lib.MLPConfig] = None
    ndc: bool = True
    lindisp: bool = False
    perturb: bool = True
    raw_noise_std: float = 1.0
    white_bkgd: bool = False
    # Matmul input precision for the MLPs ("float32" | "bfloat16").
    compute_dtype: str = "float32"
    # Fully-fused Pallas MLP kernel: "auto" (on for TPU backends, off on
    # CPU), "on", or "off". The visibility2 path always uses the XLA MLP.
    fused_mlp: str = "auto"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def predict_visibility(self) -> bool:
        return bool(
            (self.coarse_mlp and self.coarse_mlp.predict_visibility)
            or (self.fine_mlp and self.fine_mlp.predict_visibility)
        )

    def mlp_items(self) -> list[tuple[str, mlp_lib.MLPConfig]]:
        """(param_key, cfg) for every MLP present."""
        items = []
        for name in (
            "coarse_mlp",
            "fine_mlp",
            "points_aug_coarse_mlp",
            "points_aug_fine_mlp",
            "views_aug_coarse_mlp",
            "views_aug_fine_mlp",
        ):
            cfg = getattr(self, name)
            if cfg is not None:
                items.append((name.replace("_mlp", ""), cfg))
        return items


def init(key, cfg: RenderConfig) -> Params:
    """Initialize parameters for every MLP in the ensemble."""
    names_cfgs = cfg.mlp_items()
    keys = jax.random.split(key, len(names_cfgs))
    return {name: mlp_lib.init(k, c) for k, (name, c) in zip(keys, names_cfgs)}


def _eval_mlp(
    params,
    mcfg: mlp_lib.MLPConfig,
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray],
    view_dirs2: Optional[jnp.ndarray],
    noise_std: float,
    noise_key,
    dtype,
    use_fused: bool = False,
) -> dict:
    """Flatten (nr, ns, 3) points into one big batch, eval, return PLANES.

    Output is the TPU plane layout (`mlp.to_planes`): sigma (nr, ns), rgb
    (3, nr, ns), visibility (nr, ns), visibility2 (nr, ns, k) — per-sample
    quantities keep samples on the lane axis so no narrow arrays travel
    between the MLP and the compositor.

    View directions stay per-ray (nr, 3); the MLP encodes them once and
    tiles the encoded contribution across samples (view_dirs_tile) — except
    on the visibility2 path, which needs genuinely per-sample directions."""
    nr, ns = pts.shape[:2]
    flat_pts = pts.reshape(nr * ns, 3)
    if view_dirs2 is not None:
        k = view_dirs2.shape[-2]
        flat_dirs = None
        if mcfg.use_view_dirs:
            dirs = jnp.broadcast_to(view_dirs[:, None, :], pts.shape)
            flat_dirs = dirs.reshape(nr * ns, 3)
        raw = mlp_lib.apply(
            params, mcfg, flat_pts,
            view_dirs=flat_dirs,
            view_dirs2=view_dirs2.reshape(nr * ns, k, 3),
            noise_std=noise_std, noise_key=noise_key, dtype=dtype,
        )
        return mlp_lib.to_planes(raw, nr, ns)
    if use_fused:
        return mlp_lib.apply_fused(
            params, mcfg, flat_pts,
            view_dirs=view_dirs if mcfg.use_view_dirs else None,
            noise_std=noise_std, noise_key=noise_key, dtype=dtype,
            view_dirs_tile=ns,
        )
    raw = mlp_lib.apply(
        params, mcfg, flat_pts,
        view_dirs=view_dirs if mcfg.use_view_dirs else None,
        noise_std=noise_std, noise_key=noise_key, dtype=dtype,
        view_dirs_tile=ns,
    )
    return mlp_lib.to_planes(raw, nr, ns)


def _other_view_dirs(cfg: RenderConfig, z_vals, rays_o, rays_d, rays_o2) -> jnp.ndarray:
    """Unit vectors from secondary camera origins to each sample point.

    For NDC runs the z values are first mapped back to metric along-ray
    distances (SimpleNeRF01.compute_other_view_dirs :317-325).
    """
    if cfg.ndc:
        near = 1.0
        tn = -(near + rays_o[..., 2]) / rays_d[..., 2]
        z_vals = (
            (rays_o[..., None, 2] + tn[..., None] * rays_d[..., None, 2]) / (1.0 - z_vals + 1e-6)
            - rays_o[..., None, 2]
        ) / rays_d[..., None, 2]
    pts = rays_o[..., None, :] + z_vals[..., None] * rays_d[..., None, :]
    d = pts[:, :, None] - rays_o2[..., None, :, :]  # (nr, ns, k, 3)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _use_fused(cfg: RenderConfig) -> bool:
    return cfg.fused_mlp == "on" or (
        cfg.fused_mlp == "auto" and jax.default_backend() != "cpu"
    )


def _composite_level(cfg: RenderConfig, net_out: dict, z_vals, rays: dict) -> dict:
    d_key = "rays_d_ndc" if cfg.ndc else "rays_d"
    return volume.composite(
        net_out["sigma"],
        net_out["rgb"],
        z_vals,
        rays[d_key],
        ndc=cfg.ndc,
        rays_o_world=rays["rays_o"] if cfg.ndc else None,
        rays_d_world=rays["rays_d"] if cfg.ndc else None,
        white_bkgd=cfg.white_bkgd,
        vis2=net_out.get("visibility2"),
    )


def _run_level_ensemble(
    cfg: RenderConfig,
    params: Params,
    members: list,
    z_vals: jnp.ndarray,
    rays: dict,
    train: bool,
) -> list:
    """Evaluate ALL level MLPs at shared z values in one stacked kernel.

    The reference evaluates main/points-aug/views-aug at identical sample
    points as separate forward passes (SimpleNeRF01.py:170-199); here they
    are one pallas_call sharing the positional encoding
    (mlp.apply_fused_ensemble). Compositing stays per-member XLA.
    """
    o_key = "rays_o_ndc" if cfg.ndc else "rays_o"
    d_key = "rays_d_ndc" if cfg.ndc else "rays_d"
    pts = rays[o_key][..., None, :] + rays[d_key][..., None, :] * z_vals[..., :, None]
    nr, ns = pts.shape[:2]

    nets = mlp_lib.apply_fused_ensemble(
        [(params[name], mcfg) for name, _, mcfg, _ in members],
        pts.reshape(nr * ns, 3),
        view_dirs=rays.get("view_dirs"),
        noise_std=cfg.raw_noise_std if train else 0.0,
        noise_keys=[nkey for _, _, _, nkey in members],
        dtype=cfg.dtype,
        view_dirs_tile=ns,
    )
    return [(_composite_level(cfg, net_out, z_vals, rays), net_out) for net_out in nets]


def _run_level(
    cfg: RenderConfig,
    params: Params,
    model_name: str,
    mcfg: mlp_lib.MLPConfig,
    z_vals: jnp.ndarray,
    rays: dict,
    noise_key,
    train: bool,
    sec_views_vis: bool,
) -> tuple[dict, dict]:
    """Evaluate one MLP at the given z values and composite."""
    o_key = "rays_o_ndc" if cfg.ndc else "rays_o"
    d_key = "rays_d_ndc" if cfg.ndc else "rays_d"
    pts = rays[o_key][..., None, :] + rays[d_key][..., None, :] * z_vals[..., :, None]

    view_dirs2 = None
    if mcfg.predict_visibility and sec_views_vis and "rays_o2" in rays:
        view_dirs2 = _other_view_dirs(cfg, z_vals, rays["rays_o"], rays["rays_d"], rays["rays_o2"])

    use_fused = _use_fused(cfg)
    net_out = _eval_mlp(
        params[model_name],
        mcfg,
        pts,
        rays.get("view_dirs"),
        view_dirs2,
        cfg.raw_noise_std if train else 0.0,
        noise_key,
        cfg.dtype,
        use_fused=use_fused,
    )
    return _composite_level(cfg, net_out, z_vals, rays), net_out


def render_rays(
    params: Params,
    cfg: RenderConfig,
    rays: dict,
    key: Optional[jax.Array] = None,
    train: bool = False,
    sec_views_vis: bool = False,
    retraw: Optional[bool] = None,
    keep_per_sample: bool = True,
) -> dict:
    """Render a batch of rays through the full SimpleNeRF hierarchy.

    rays: dict with 'rays_o', 'rays_d', 'view_dirs', 'near', 'far' (nr, 1)
    (+ '_ndc' variants when cfg.ndc, + optional 'rays_o2' (nr, k, 3)).
    `train` enables stratified jitter, sigma noise, stochastic importance
    sampling, and the augmented-model evaluations — the reference's
    `self.training` graph (SimpleNeRF01.py:170,186,234,249).

    Returns the reference-keyed output dict. With keep_per_sample=False,
    per-sample tensors (alpha/weights/visibility/z_vals/raw) are dropped to
    keep full-image eval renders lean.
    """
    if retraw is None:
        retraw = train
    keys = jax.random.split(key, 8) if key is not None else [None] * 8
    out: dict = {}

    near = rays["near_ndc"] if cfg.ndc else rays["near"]
    far = rays["far_ndc"] if cfg.ndc else rays["far"]

    def emit(prefix: str, level: str, composited: dict, net_out: dict):
        for k, v in composited.items():
            out[f"{prefix}{k}_{level}"] = v
        if retraw:
            # Per-sample MLP outputs: sigma/visibility as (nr, ns) planes,
            # rgb back to (nr, ns, 3) for the reference contract (unused
            # raw keys are dead code XLA removes from the train step).
            for k, v in net_out.items():
                out[f"{prefix}raw_{k}_{level}"] = (
                    v.transpose(1, 2, 0) if k == "rgb" else v
                )

    weights_coarse = None
    z_coarse = None
    if cfg.coarse_mlp is not None:
        z_coarse = sampling.stratified_z_vals(
            keys[0], near, far, cfg.coarse_mlp.num_samples, cfg.lindisp, cfg.perturb and train
        )
        out["z_vals_coarse"] = z_coarse

        members = [("coarse", "", cfg.coarse_mlp, keys[1])]
        if train and cfg.points_aug_coarse_mlp is not None:
            members.append(
                ("points_aug_coarse", "points_augmentation_", cfg.points_aug_coarse_mlp, keys[2])
            )
        if train and cfg.views_aug_coarse_mlp is not None:
            members.append(
                ("views_aug_coarse", "views_augmentation_", cfg.views_aug_coarse_mlp, keys[3])
            )

        needs_vis2 = (
            sec_views_vis
            and "rays_o2" in rays
            and any(mcfg.predict_visibility for _, _, mcfg, _ in members)
        )
        if _use_fused(cfg) and len(members) > 1 and not needs_vis2:
            results = _run_level_ensemble(cfg, params, members, z_coarse, rays, train)
        else:
            results = [
                _run_level(cfg, params, name, mcfg, z_coarse, rays, nkey, train, sec_views_vis)
                for name, _, mcfg, nkey in members
            ]
        for (name, prefix, _, _), (comp, net) in zip(members, results):
            if name == "coarse":
                weights_coarse = comp["weights"]
            emit(prefix, "coarse", comp, net)

    if cfg.fine_mlp is not None:
        z_fine = sampling.fine_z_vals(
            keys[4], z_coarse, weights_coarse, cfg.fine_mlp.num_samples, cfg.perturb and train
        )
        out["z_vals_fine"] = z_fine

        members = [("fine", "", cfg.fine_mlp, keys[5])]
        if train and cfg.points_aug_fine_mlp is not None:
            members.append(
                ("points_aug_fine", "points_augmentation_", cfg.points_aug_fine_mlp, keys[6])
            )
        if train and cfg.views_aug_fine_mlp is not None:
            members.append(
                ("views_aug_fine", "views_augmentation_", cfg.views_aug_fine_mlp, keys[7])
            )

        needs_vis2 = (
            sec_views_vis
            and "rays_o2" in rays
            and any(mcfg.predict_visibility for _, _, mcfg, _ in members)
        )
        if _use_fused(cfg) and len(members) > 1 and not needs_vis2:
            # 6-MLP configs (points_augmentation.fine_mlp etc.): the fine
            # trio runs as ONE stacked pallas_call too, sharing the PE block.
            results = _run_level_ensemble(cfg, params, members, z_fine, rays, train)
        else:
            results = [
                _run_level(cfg, params, name, mcfg, z_fine, rays, nkey, train, sec_views_vis)
                for name, _, mcfg, nkey in members
            ]
        for (_, prefix, _, _), (comp, net) in zip(members, results):
            emit(prefix, "fine", comp, net)

    if not keep_per_sample:
        drop = [
            k
            for k in out
            if k.startswith("z_vals")
            or "alpha" in k
            or "weights" in k
            or k.startswith("raw_")
            or ("visibility_" in k)
        ]
        for k in drop:
            del out[k]
    return out
