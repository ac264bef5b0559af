"""Differential parity of the FULL 9-loss training objective vs PyTorch.

Extends the renderer-level oracle (test_torch_parity.py) through the loss
stack: an independent torch implementation of the reference's published
9-loss objective (MSE01-03, SparseDepthMSE01-03 with the aug->main-fine
fallback quirk, PointsAugmentationDepthLoss02 / ViewsAugmentationDepthLoss02
/ CoarseFineConsistencyLoss02 patch-reprojection arbitration — reference
src/loss_functions/*.py, weights from src/NerfLlffTrainerTester01.py:351-428)
is evaluated on the SAME parameters and the SAME real preprocessor batch as
the JAX train-step objective, at an iteration where the consistency ramp is
active. Per-loss values AND the parameter gradients of the weighted total
(through all four MLPs) must agree to fp32 tolerance.

The torch side re-renders from scratch (its own PE/MLP/compositing in the
reference's concat layout, with reference-style dynamic boolean-mask
filtering in the losses, vs the repo's static masked math) — the only value
imported from the JAX render is `z_vals_fine`: the inverse-CDF sampler is
chaotic at CDF-bin boundaries (see test_torch_parity.py) and its positions
are gradient-stopped constants in BOTH frameworks (reference
SimpleNeRF01.py:310-314 `.detach()`, repo render/sampling.py:117), so
sharing them isolates this test to the loss math it exists to pin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from simplenerf_tpu import config as config_lib
from simplenerf_tpu.data import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor, gather_batch
from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers.presets import tiny_synthetic_config
from simplenerf_tpu.losses import LossComputer
from simplenerf_tpu.render import renderer
from simplenerf_tpu.training.trainer import loss_context_from_configs

LOSS_ITER = 150  # tiny preset ramps consistency in at 100 -> weight 0.1 here


def t_pe(x, degree):
    feats = [x]
    for i in range(degree):
        feats.append(torch.sin(x * (2.0 ** i)))
        feats.append(torch.cos(x * (2.0 ** i)))
    return torch.cat(feats, dim=-1)


def to_torch_params(jp):
    def t(a):
        return torch.tensor(np.asarray(a)).float().requires_grad_(True)

    tp = {"pts": [(t(l["w"]), t(l["b"])) for l in jp["pts"]],
          "pts_out": (t(jp["pts_out"]["w"]), t(jp["pts_out"]["b"]))}
    if "feature" in jp:
        tp["feature"] = (t(jp["feature"]["w"]), t(jp["feature"]["b"]))
        tp["views"] = [(t(l["w"]), t(l["b"])) for l in jp["views"]]
        tp["views_out"] = (t(jp["views_out"]["w"]), t(jp["views_out"]["b"]))
    return tp


def param_leaves(tp, jp):
    """Aligned (torch_tensor, jax_leaf) pairs for one model's params."""
    pairs = [(w, l["w"]) for w, l in zip((p[0] for p in tp["pts"]), jp["pts"])]
    pairs += [(b, l["b"]) for b, l in zip((p[1] for p in tp["pts"]), jp["pts"])]
    pairs += [(tp["pts_out"][0], jp["pts_out"]["w"]), (tp["pts_out"][1], jp["pts_out"]["b"])]
    if "feature" in tp:
        pairs += [(tp["feature"][0], jp["feature"]["w"]), (tp["feature"][1], jp["feature"]["b"])]
        pairs += [(w, l["w"]) for w, l in zip((p[0] for p in tp["views"]), jp["views"])]
        pairs += [(b, l["b"]) for b, l in zip((p[1] for p in tp["views"]), jp["views"])]
        pairs += [(tp["views_out"][0], jp["views_out"]["w"]), (tp["views_out"][1], jp["views_out"]["b"])]
    return pairs


def t_field(tp, pts, view_dirs, *, pe_pts, pe_views, sigma_pe=None,
            use_view_dirs=True, view_dep_rgb=True, skip=()):
    """Reference MLP forward (SimpleNeRF01.py:560-715), concat layout.

    Views-branch input order matches the reference: [feature,
    high-frequency PE channels (points-aug routing), encoded view dirs]."""
    enc = t_pe(pts, pe_pts)
    p_lo = enc.shape[-1] if sigma_pe is None else (2 * sigma_pe + 1) * 3
    enc_lo, enc_hi = enc[..., :p_lo], enc[..., p_lo:]
    h = enc_lo
    for i, (w, b) in enumerate(tp["pts"]):
        h = torch.relu(h @ w + b)
        if i in skip:
            h = torch.cat([enc_lo, h], dim=-1)
    po = h @ tp["pts_out"][0] + tp["pts_out"][1]
    sigma = torch.relu(po[..., :1])
    if not view_dep_rgb:
        return sigma, torch.sigmoid(po[..., 1:4])
    feat = h @ tp["feature"][0] + tp["feature"][1]
    pieces = [feat]
    if enc_hi.shape[-1]:
        pieces.append(enc_hi)
    if use_view_dirs:
        pieces.append(t_pe(view_dirs, pe_views))
    hv = torch.cat(pieces, dim=-1)
    for w, b in tp["views"]:
        hv = torch.relu(hv @ w + b)
    rgb = torch.sigmoid((hv @ tp["views_out"][0] + tp["views_out"][1])[..., :3])
    return sigma, rgb


def t_composite(sigma, rgb, z, rays_d):
    inf = torch.full_like(z[..., :1], 1e10)
    deltas = (torch.cat([z, inf], -1)[..., 1:] - z) * rays_d.norm(dim=-1, keepdim=True)
    alpha = 1.0 - torch.exp(-sigma[..., 0] * deltas)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    acc = weights.sum(-1)
    depth = (weights * z).sum(-1) / (acc + 1e-6)
    return rgb_map, depth


def t_render_train(tps, dims, rays, z_fine):
    """Train-mode hierarchy: main coarse+fine, points-aug coarse (reduced
    sigma PE), Lambertian views-aug coarse — all at shared coarse z."""
    o, d, vd = rays["rays_o"], rays["rays_d"], rays["view_dirs"]
    nr = o.shape[0]
    nsc = dims["nsc"]
    t = torch.linspace(0.0, 1.0, nsc)
    z_c = rays["near"] * (1.0 - t) + rays["far"] * t

    def level(tp, z, **kw):
        ns = z.shape[-1]
        pts = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
        dirs = vd[:, None, :].expand(-1, ns, -1).reshape(-1, 3)
        sigma, rgb = t_field(tp, pts, dirs, pe_pts=dims["pe_pts"],
                             pe_views=dims["pe_views"], skip=dims["skip"], **kw)
        return t_composite(sigma.view(nr, ns, 1), rgb.view(nr, ns, 3), z, d)

    out = {}
    out["rgb_coarse"], out["depth_coarse"] = level(tps["coarse"], z_c)
    out["points_augmentation_rgb_coarse"], out["points_augmentation_depth_coarse"] = level(
        tps["points_aug_coarse"], z_c, sigma_pe=dims["sigma_pe"]
    )
    out["views_augmentation_rgb_coarse"], out["views_augmentation_depth_coarse"] = level(
        tps["views_aug_coarse"], z_c, use_view_dirs=False, view_dep_rgb=False
    )
    out["rgb_fine"], out["depth_fine"] = level(tps["fine"], z_fine)
    return out


# --------------------------------------------------------------------------
# Reference-faithful torch losses (dynamic boolean filtering, unlike the
# repo's static masked math — an independent formulation of the same spec).
# --------------------------------------------------------------------------


def t_mse(pred, target, mask):
    p, tt = pred[mask], target[mask]
    return ((p - tt) ** 2).mean(dim=1).mean() if p.numel() else torch.tensor(0.0)


def t_sparse_depth(outputs, batch, prefix, aug_fine_present=False):
    mask = batch["indices_mask_sparse_depth"]
    target = batch["sparse_depth_values"][:, 0]
    if prefix == "":
        pred = outputs["depth_fine"]
    elif aug_fine_present:
        pred = outputs["depth_fine"]  # reference quirk: falls back to MAIN fine
    else:
        pred = outputs[f"{prefix}depth_coarse"]
    p, tt = pred[mask], target[mask]
    return ((p - tt) ** 2).mean() if p.numel() else torch.tensor(0.0)


def t_arbitrated(depth1, depth2, batch, patch=5, thr=0.1):
    """compute_loss_nerf (reference CoarseFineConsistencyLoss02.py:96-175):
    filter to NeRF rays, reproject each model's backprojected point into the
    closest other view, pick the patch-RMSE winner below threshold as the
    stop-gradient teacher. Border patches gather clamped (don't-care: the
    valid masks exclude them from every comparison that uses them)."""
    scene = batch["common"]
    images = scene["images"]
    poses = scene["poses"]
    intrinsic = scene["intrinsics"][0]
    n, h, w, _ = images.shape
    hp = patch // 2
    m = batch["indices_mask_nerf"]

    rays_o, rays_d = batch["rays_o"][m], batch["rays_d"][m]
    d1, d2 = depth1[m], depth2[m]
    pix = batch["pixel_id"][m]
    image_ids, x_a, y_a = pix[:, 0], pix[:, 1], pix[:, 2]

    origins = poses[:, :3, 3]
    dist = torch.cdist(origins, origins)
    closest = torch.kthvalue(dist, 2, dim=1)[1]
    ids_b = closest[image_ids]
    poses_b = poses[ids_b]

    flip = torch.diag(torch.tensor([1.0, -1.0, -1.0]))

    def reproject(depth):
        pts = rays_o + rays_d * depth.detach()[:, None]
        cam = torch.einsum("ij,nkj,nk->ni", flip, poses_b[:, :3, :3], pts - poses_b[:, :3, 3])
        uv = cam @ intrinsic.T
        return torch.round(uv[:, :2] / uv[:, 2:]).long()

    pos1, pos2 = reproject(d1), reproject(d2)
    x1b, y1b = pos1[:, 0], pos1[:, 1]
    x2b, y2b = pos2[:, 0], pos2[:, 1]

    def valid(x, y):
        return (x >= hp) & (x < w - hp) & (y >= hp) & (y < h - hp)

    valid_a, valid_1b, valid_2b = valid(x_a, y_a), valid(x1b, y1b), valid(x2b, y2b)

    def patches(ids, x, y):
        cols = []
        for dy in range(-hp, hp + 1):
            yy = (y + dy).clamp(0, h - 1)
            for dx in range(-hp, hp + 1):
                xx = (x + dx).clamp(0, w - 1)
                cols.append(images[ids, yy, xx])
        return torch.stack(cols, dim=1)  # (nr, patch*patch, 3)

    pa = patches(image_ids, x_a, y_a)
    rmse1 = ((pa - patches(ids_b, x1b, y1b)) ** 2).mean(dim=(1, 2)).sqrt()
    rmse2 = ((pa - patches(ids_b, x2b, y2b)) ** 2).mean(dim=(1, 2)).sqrt()

    mask1 = ((rmse1 < rmse2) | ~valid_2b) & (rmse1 < thr) & valid_1b & valid_a
    mask2 = ((rmse2 < rmse1) | ~valid_1b) & (rmse2 < thr) & valid_2b & valid_a

    def depth_mse(pred, teacher, sel):
        sq = (pred - teacher.detach()) ** 2 * sel.float()
        return sq.mean() if pred.numel() else torch.tensor(0.0)

    return depth_mse(d1, d2, mask2) + depth_mse(d2, d1, mask1), mask1, mask2


def t_cfc02(outputs, batch):
    loss, m1, m2 = t_arbitrated(outputs["depth_coarse"], outputs["depth_fine"], batch)
    sd = batch["indices_mask_sparse_depth"]
    dc, df = outputs["depth_coarse"][sd], outputs["depth_fine"][sd]
    if dc.numel():
        loss = loss + ((dc - df.detach()) ** 2).mean()
    return loss, m1, m2


class TestTorchLossParity:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("db")
        generate_scene(root, num_frames=5, h=24, w=32, num_train=3, seed=3)
        cfg = tiny_synthetic_config(ndc=False, raw_noise_std=0.0)
        cfg["model"]["perturb"] = False
        raw = get_data_loader(cfg, root, "train").load_data()
        pp = ScenePreprocessor(cfg, "train", raw, seed=0)
        indices, mask_nerf, mask_sd = pp.next_indices(0)
        batch = gather_batch(
            pp.cache, pp.common, pp.batch_constants(),
            jnp.asarray(indices), jnp.asarray(mask_nerf), jnp.asarray(mask_sd),
        )
        render_cfg = config_lib.render_config_from_dict(cfg)
        params = renderer.init(jax.random.PRNGKey(3), render_cfg)
        lc = LossComputer(cfg["losses"], loss_context_from_configs(cfg))
        weights = jnp.asarray(lc.weights_vector(LOSS_ITER))

        def jloss(p):
            out = renderer.render_rays(p, render_cfg, batch, key=None, train=True)
            total, values = lc.compute(batch, out, weights)
            return total, values

        (jtotal, jvalues), jgrads = jax.value_and_grad(jloss, has_aux=True)(params)
        out_j = renderer.render_rays(params, render_cfg, batch, key=None, train=True)

        # ---- torch replay on the same params/batch ----
        tb = {
            k: torch.tensor(np.asarray(v))
            for k, v in batch.items()
            if k not in ("common", "indices_mask_nerf", "indices_mask_sparse_depth")
        }
        tb["indices_mask_nerf"] = torch.tensor(np.asarray(batch["indices_mask_nerf"]))
        tb["indices_mask_sparse_depth"] = torch.tensor(
            np.asarray(batch["indices_mask_sparse_depth"])
        )
        tb["common"] = {k: torch.tensor(np.asarray(v)) for k, v in batch["common"].items()}
        tps = {name: to_torch_params(params[name]) for name in params}
        mc = render_cfg.coarse_mlp
        dims = dict(
            nsc=mc.num_samples, pe_pts=mc.points_pe_degree, pe_views=mc.views_pe_degree,
            skip=tuple(s for s in mc.skip_layers if s < mc.points_net_depth - 1),
            sigma_pe=render_cfg.points_aug_coarse_mlp.points_sigma_pe_degree,
        )
        z_fine = torch.tensor(np.asarray(out_j["z_vals_fine"]))
        out_t = t_render_train(tps, dims, tb, z_fine)

        nerf_m = tb["indices_mask_nerf"]
        values_t = {
            "MSE01": t_mse(out_t["rgb_coarse"], tb["target_rgb"], nerf_m)
            + t_mse(out_t["rgb_fine"], tb["target_rgb"], nerf_m),
            "SparseDepthMSE01": t_sparse_depth(out_t, tb, ""),
            "MSE02": t_mse(out_t["points_augmentation_rgb_coarse"], tb["target_rgb"], nerf_m),
            "MSE03": t_mse(out_t["views_augmentation_rgb_coarse"], tb["target_rgb"], nerf_m),
            "SparseDepthMSE02": t_sparse_depth(out_t, tb, "points_augmentation_"),
            "SparseDepthMSE03": t_sparse_depth(out_t, tb, "views_augmentation_"),
        }
        values_t["PointsAugmentationDepthLoss02"], pa_m1, pa_m2 = t_arbitrated(
            out_t["depth_coarse"], out_t["points_augmentation_depth_coarse"], tb
        )
        values_t["ViewsAugmentationDepthLoss02"], va_m1, va_m2 = t_arbitrated(
            out_t["depth_coarse"], out_t["views_augmentation_depth_coarse"], tb
        )
        values_t["CoarseFineConsistencyLoss02"], cf_m1, cf_m2 = t_cfc02(out_t, tb)

        w_np = np.asarray(weights)
        total_t = sum(float(w) * values_t[n] for w, n in zip(w_np, lc.names))
        total_t.backward()

        return dict(
            params=params, jgrads=jgrads, jvalues=jvalues, jtotal=jtotal,
            tps=tps, values_t=values_t, total_t=total_t, lc=lc,
            masks=dict(pa=(pa_m1, pa_m2), va=(va_m1, va_m2), cf=(cf_m1, cf_m2)),
        )

    def test_arbitration_masks_nontrivial(self, setup):
        """The fixture batch must actually exercise the arbitration: at
        least one teacher selected, and not every ray selected, in the
        coarse-fine pair (otherwise the parity below proves nothing)."""
        m1, m2 = setup["masks"]["cf"]
        chosen = (m1 | m2).sum().item()
        assert 0 < chosen < m1.numel(), (chosen, m1.numel())

    def test_each_loss_value_matches(self, setup):
        for name in setup["lc"].names:
            jv = float(setup["jvalues"][name])
            tv = float(setup["values_t"][name].detach())
            np.testing.assert_allclose(jv, tv, rtol=2e-4, atol=2e-6, err_msg=name)

    def test_total_matches(self, setup):
        np.testing.assert_allclose(
            float(setup["jtotal"]), float(setup["total_t"]), rtol=2e-4
        )

    def test_full_objective_gradients_match(self, setup):
        """Parameter gradients of the weighted 9-loss total agree for every
        leaf of all four MLPs (catches any wrong mask/epsilon/stop-gradient/
        normalization in the losses that decide final quality)."""
        for model in setup["params"]:
            pairs = param_leaves(setup["tps"][model], setup["jgrads"][model])
            for i, (tw, gj) in enumerate(pairs):
                gt = tw.grad.numpy() if tw.grad is not None else np.zeros(tw.shape, np.float32)
                gj = np.asarray(gj)
                scale = max(np.abs(gt).max(), np.abs(gj).max(), 1e-8)
                np.testing.assert_allclose(
                    gj / scale, gt / scale, atol=5e-5, err_msg=f"{model} leaf {i}"
                )
