"""Differential parity vs an independent PyTorch implementation.

BASELINE.json requires rendered images AND parameter gradients allclose to
the reference PyTorch implementation. The torch model here re-implements
the reference pipeline formulas from scratch (positional encoding
src/models/SimpleNeRF01.py:525-557, MLP :560-715, volume rendering
:430-483 with its 1e-10/1e-6 epsilons and infinite last bin, sample_pdf
:328-361 with the +1e-5 floor and right-sided searchsorted, hierarchical
union-sort :304-315), shares one set of parameters with the JAX renderer,
and both run the identical deterministic two-level render. Outputs and
per-parameter gradients must agree to fp32 tolerance — this is the
cross-framework oracle, independent of the in-repo JAX transcription.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from simplenerf_tpu.fields.mlp import MLPConfig
from simplenerf_tpu.render import renderer

NR = 64
NSC, NSF = 16, 32
DEPTH, WIDTH, VWIDTH = 4, 32, 16
PE_PTS, PE_VIEWS = 4, 2
SKIP = (2,)


def make_cfg():
    mlp_kw = dict(
        points_net_depth=DEPTH, views_net_depth=1, points_net_width=WIDTH,
        views_net_width=VWIDTH, points_pe_degree=PE_PTS, views_pe_degree=PE_VIEWS,
        skip_layers=SKIP,
    )
    return renderer.RenderConfig(
        coarse_mlp=MLPConfig(num_samples=NSC, **mlp_kw),
        fine_mlp=MLPConfig(num_samples=NSF, **mlp_kw),
        ndc=False, perturb=False, raw_noise_std=0.0, compute_dtype="float32",
        fused_mlp="off",
    )


def make_rays(nr=NR):
    key = jax.random.PRNGKey(11)
    d = jax.random.normal(key, (nr, 3))
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.5)
    vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.zeros((nr, 3)), "rays_d": d, "view_dirs": vd,
        "near": jnp.full((nr, 1), 1.0), "far": jnp.full((nr, 1), 6.0),
    }


# ---------------------------------------------------------------------------
# Independent torch implementation of the reference math.
# ---------------------------------------------------------------------------


def t_pe(x, degree):
    """Reference PositionalEncoder: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]."""
    feats = [x]
    for i in range(degree):
        feats.append(torch.sin(x * (2.0 ** i)))
        feats.append(torch.cos(x * (2.0 ** i)))
    return torch.cat(feats, dim=-1)


def t_mlp(tp, pts, view_dirs):
    """Reference MLP forward: trunk with skip re-injection, sigma head,
    feature -> [feature, enc_dirs] -> views net -> rgb sigmoid."""
    enc = t_pe(pts, PE_PTS)
    h = enc
    for i, (w, b) in enumerate(tp["pts"]):
        h = torch.relu(h @ w + b)
        if i in SKIP:
            h = torch.cat([enc, h], dim=-1)
    w, b = tp["pts_out"]
    sigma = torch.relu((h @ w + b)[..., :1])
    w, b = tp["feature"]
    feat = h @ w + b
    enc_d = t_pe(view_dirs, PE_VIEWS)
    hv = torch.cat([feat, enc_d], dim=-1)
    w, b = tp["views0"]
    hv = torch.relu(hv @ w + b)
    w, b = tp["views_out"]
    rgb = torch.sigmoid((hv @ w + b)[..., :3])
    return sigma, rgb


def t_volume_render(sigma, rgb, z, rays_d):
    """Reference volume_rendering: alpha/cumprod/weights with the 1e10
    infinite last bin and 1e-10/1e-6 epsilons."""
    inf = torch.full_like(z[..., :1], 1e10)
    z_ext = torch.cat([z, inf], dim=-1)
    deltas = (z_ext[..., 1:] - z_ext[..., :-1]) * rays_d.norm(dim=-1, keepdim=True)
    alpha = 1.0 - torch.exp(-sigma[..., 0] * deltas)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], dim=-1), dim=-1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(dim=-2)
    acc = weights.sum(dim=-1)
    depth = (weights * z).sum(dim=-1) / (acc + 1e-6)
    depth_var = (weights * (z - depth[..., None]) ** 2).sum(dim=-1)
    return rgb_map, depth, depth_var, weights, acc


def t_sample_pdf(bins, weights, n):
    """Reference sample_pdf with deterministic u (linspace), +1e-5 floor,
    right-sided searchsorted and the <1e-5 denominator guard."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(dim=-1, keepdim=True)
    cdf = torch.cumsum(pdf, dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], dim=-1)
    u = torch.linspace(0.0, 1.0, n, dtype=cdf.dtype).expand(cdf.shape[0], n).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = (inds - 1).clamp(0, cdf.shape[-1] - 1)
    above = inds.clamp(0, cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bins_b = torch.gather(bins, -1, below)
    bins_a = torch.gather(bins, -1, above)
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def t_render(tp_coarse, tp_fine, rays_o, rays_d, view_dirs, near, far):
    """Deterministic hierarchical render (perturb off, noise off)."""
    t = torch.linspace(0.0, 1.0, NSC)
    z_c = near * (1.0 - t) + far * t
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_c[..., None]
    dirs = view_dirs[:, None, :].expand(-1, NSC, -1)
    sigma, rgb = t_mlp(tp_coarse, pts.reshape(-1, 3), dirs.reshape(-1, 3))
    sigma, rgb = sigma.view(NR, NSC, 1), rgb.view(NR, NSC, 3)
    rgb_c, depth_c, dv_c, w_c, acc_c = t_volume_render(sigma, rgb, z_c, rays_d)

    z_mid = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
    z_s = t_sample_pdf(z_mid, w_c[..., 1:-1], NSF).detach()
    z_f, _ = torch.sort(torch.cat([z_c, z_s], dim=-1), dim=-1)
    nsu = NSC + NSF
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_f[..., None]
    dirs = view_dirs[:, None, :].expand(-1, nsu, -1)
    sigma, rgb = t_mlp(tp_fine, pts.reshape(-1, 3), dirs.reshape(-1, 3))
    sigma, rgb = sigma.view(NR, nsu, 1), rgb.view(NR, nsu, 3)
    rgb_f, depth_f, dv_f, _, acc_f = t_volume_render(sigma, rgb, z_f, rays_d)
    return {
        "rgb_coarse": rgb_c, "depth_coarse": depth_c, "depth_var_coarse": dv_c,
        "acc_coarse": acc_c, "rgb_fine": rgb_f, "depth_fine": depth_f,
        "depth_var_fine": dv_f, "acc_fine": acc_f, "z_vals_fine": z_f,
    }


def to_torch_params(jp):
    """Canonical JAX param pytree -> torch tensors (requires_grad)."""

    def t(a):
        return torch.tensor(np.asarray(a), dtype=torch.float64).float().requires_grad_(True)

    return {
        "pts": [(t(l["w"]), t(l["b"])) for l in jp["pts"]],
        "pts_out": (t(jp["pts_out"]["w"]), t(jp["pts_out"]["b"])),
        "feature": (t(jp["feature"]["w"]), t(jp["feature"]["b"])),
        "views0": (t(jp["views"][0]["w"]), t(jp["views"][0]["b"])),
        "views_out": (t(jp["views_out"]["w"]), t(jp["views_out"]["b"])),
    }


def torch_leaves(tp):
    for w, b in tp["pts"]:
        yield w
        yield b
    for k in ("pts_out", "feature", "views0", "views_out"):
        yield tp[k][0]
        yield tp[k][1]


def jax_leaves(jp):
    for l in jp["pts"]:
        yield l["w"]
        yield l["b"]
    for k in ("pts_out", "feature"):
        yield jp[k]["w"]
        yield jp[k]["b"]
    yield jp["views"][0]["w"]
    yield jp["views"][0]["b"]
    yield jp["views_out"]["w"]
    yield jp["views_out"]["b"]


def t_mlp_aug(tp, pts, ds=None, view_dirs=None, lambertian=False):
    """Reference MLP, augmented variants.

    points-augmentation (ds set): the trunk sees only the low-frequency
    enc[:, :p_lo]; the high-freq channels route into the views-branch input
    (SimpleNeRF01.py:576-578,630-633). views-augmentation (lambertian):
    use_view_dirs False, view_dependent_rgb False — rgb comes from the
    points head and there is no views branch."""
    enc = t_pe(pts, PE_PTS)
    if ds is None:
        enc_lo, enc_hi = enc, None
    else:
        p_lo = (2 * ds + 1) * 3
        enc_lo, enc_hi = enc[..., :p_lo], enc[..., p_lo:]
    h = enc_lo
    for i, (w, b) in enumerate(tp["pts"]):
        h = torch.relu(h @ w + b)
        if i in SKIP:
            h = torch.cat([enc_lo, h], dim=-1)
    w, b = tp["pts_out"]
    po = h @ w + b
    sigma = torch.relu(po[..., :1])
    if lambertian:
        return sigma, torch.sigmoid(po[..., 1:4])
    w, b = tp["feature"]
    feat = h @ w + b
    pieces = [feat]
    if enc_hi is not None:
        pieces.append(enc_hi)
    if view_dirs is not None:
        pieces.append(t_pe(view_dirs, PE_VIEWS))
    w, b = tp["views0"]
    hv = torch.relu(torch.cat(pieces, dim=-1) @ w + b)
    w, b = tp["views_out"]
    rgb = torch.sigmoid((hv @ w + b)[..., :3])
    return sigma, rgb


def t_volume_render_ndc(sigma, rgb, z, rays_d_ndc, rays_o_w, rays_d_w):
    """NDC compositing: infinite last bin 1.0, depth converted to metric via
    the reference convert_depth_from_ndc (SimpleNeRF01.py:485-502)."""
    inf = torch.full_like(z[..., :1], 1.0)
    z_ext = torch.cat([z, inf], dim=-1)
    deltas = (z_ext[..., 1:] - z_ext[..., :-1]) * rays_d_ndc.norm(dim=-1, keepdim=True)
    alpha = 1.0 - torch.exp(-sigma[..., 0] * deltas)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], dim=-1), dim=-1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(dim=-2)
    acc = weights.sum(dim=-1)
    depth_ndc = (weights * z).sum(dim=-1) / (acc + 1e-6)

    oz, dz = rays_o_w[..., 2:3], rays_d_w[..., 2:3]
    tn = -(1.0 + oz) / dz
    guard = torch.where(z == 1.0, torch.full_like(z, 1e-3), torch.zeros_like(z))
    z_metric = (oz + tn * dz) / dz * (1.0 / (1.0 - z + guard) - 1.0) + tn
    depth = (weights * z_metric).sum(dim=-1) / (acc + 1e-6)
    return rgb_map, depth_ndc, depth, acc


class TestTorchParity:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = make_cfg()
        params = renderer.init(jax.random.PRNGKey(3), cfg)
        rays = make_rays()
        return cfg, params, rays

    def test_images_match(self, setup):
        cfg, params, rays = setup
        out_j = renderer.render_rays(params, cfg, rays, train=False)

        tpc = to_torch_params(params["coarse"])
        tpf = to_torch_params(params["fine"])
        with torch.no_grad():
            out_t = t_render(
                tpc, tpf,
                torch.tensor(np.asarray(rays["rays_o"])),
                torch.tensor(np.asarray(rays["rays_d"])),
                torch.tensor(np.asarray(rays["view_dirs"])),
                torch.tensor(np.asarray(rays["near"])),
                torch.tensor(np.asarray(rays["far"])),
            )
        for k in ("rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine",
                  "depth_var_coarse", "depth_var_fine", "acc_coarse", "acc_fine"):
            np.testing.assert_allclose(
                np.asarray(out_j[k]), out_t[k].numpy(), atol=2e-5, rtol=2e-5, err_msg=k
            )
        # Inverse-CDF sampling is chaotic where pdf bins are tiny: a ~1e-6
        # fp accumulation-order difference between XLA and torch matmuls
        # shifts t by 1/denom — the implementations agree to 1e-5 on
        # identical inputs (see /tmp-independent sampler test), so allow
        # the amplified boundary flips here.
        np.testing.assert_allclose(
            np.asarray(out_j["z_vals_fine"]), out_t["z_vals_fine"].numpy(), atol=5e-3
        )

    @pytest.mark.parametrize("variant", ["points_aug", "views_aug_lambertian"])
    def test_ndc_augmented_models_match(self, variant):
        """NDC single-level render with the augmented 'simpler' models."""
        ds = 2 if variant == "points_aug" else None
        lambertian = variant == "views_aug_lambertian"
        mlp_kw = dict(
            points_net_depth=DEPTH, views_net_depth=1, points_net_width=WIDTH,
            views_net_width=VWIDTH, points_pe_degree=PE_PTS, views_pe_degree=PE_VIEWS,
            skip_layers=SKIP,
        )
        mcfg = MLPConfig(
            num_samples=NSC,
            points_sigma_pe_degree=ds,
            use_view_dirs=not lambertian,
            view_dependent_rgb=not lambertian,
            **mlp_kw,
        )
        cfg = renderer.RenderConfig(
            coarse_mlp=mcfg, ndc=True, perturb=False, raw_noise_std=0.0,
            compute_dtype="float32", fused_mlp="off",
        )
        params = renderer.init(jax.random.PRNGKey(8), cfg)
        rays = make_rays()
        rays["rays_o_ndc"] = jnp.asarray(
            np.random.default_rng(2).normal(0, 0.2, (NR, 3)).astype(np.float32)
        )
        rays["rays_d_ndc"] = rays["rays_d"] * 0.15
        rays["near_ndc"] = jnp.zeros((NR, 1))
        rays["far_ndc"] = jnp.ones((NR, 1))
        out_j = renderer.render_rays(params, cfg, rays, train=False)

        jp = params["coarse"]
        tp = {
            "pts": [(torch.tensor(np.asarray(l["w"])), torch.tensor(np.asarray(l["b"])))
                    for l in jp["pts"]],
            "pts_out": (torch.tensor(np.asarray(jp["pts_out"]["w"])),
                        torch.tensor(np.asarray(jp["pts_out"]["b"]))),
        }
        if not lambertian:
            tp["feature"] = (torch.tensor(np.asarray(jp["feature"]["w"])),
                             torch.tensor(np.asarray(jp["feature"]["b"])))
            tp["views0"] = (torch.tensor(np.asarray(jp["views"][0]["w"])),
                            torch.tensor(np.asarray(jp["views"][0]["b"])))
            tp["views_out"] = (torch.tensor(np.asarray(jp["views_out"]["w"])),
                               torch.tensor(np.asarray(jp["views_out"]["b"])))

        with torch.no_grad():
            o = torch.tensor(np.asarray(rays["rays_o_ndc"]))
            dd = torch.tensor(np.asarray(rays["rays_d_ndc"]))
            vd = torch.tensor(np.asarray(rays["view_dirs"]))
            ow = torch.tensor(np.asarray(rays["rays_o"]))
            dw = torch.tensor(np.asarray(rays["rays_d"]))
            t = torch.linspace(0.0, 1.0, NSC)
            z = torch.zeros(NR, 1) * (1 - t) + torch.ones(NR, 1) * t
            pts = o[:, None, :] + dd[:, None, :] * z[..., None]
            dirs = None if lambertian else vd[:, None, :].expand(-1, NSC, -1).reshape(-1, 3)
            sigma, rgb = t_mlp_aug(tp, pts.reshape(-1, 3), ds=ds, view_dirs=dirs,
                                   lambertian=lambertian)
            sigma, rgb = sigma.view(NR, NSC, 1), rgb.view(NR, NSC, 3)
            rgb_t, depth_ndc_t, depth_t, acc_t = t_volume_render_ndc(sigma, rgb, z, dd, ow, dw)

        np.testing.assert_allclose(np.asarray(out_j["rgb_coarse"]), rgb_t.numpy(),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(out_j["depth_ndc_coarse"]), depth_ndc_t.numpy(),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(out_j["depth_coarse"]), depth_t.numpy(),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(out_j["acc_coarse"]), acc_t.numpy(),
                                   atol=2e-5, rtol=2e-5)

    def test_parameter_gradients_match(self, setup):
        cfg, params, rays = setup
        target = jnp.asarray(
            np.random.default_rng(5).uniform(0.0, 1.0, (NR, 3)).astype(np.float32)
        )

        def jloss(p):
            out = renderer.render_rays(p, cfg, rays, train=False)
            return jnp.mean((out["rgb_fine"] - target) ** 2) + jnp.mean(
                (out["rgb_coarse"] - target) ** 2
            )

        grads = jax.grad(jloss)(params)

        tpc = to_torch_params(params["coarse"])
        tpf = to_torch_params(params["fine"])
        out_t = t_render(
            tpc, tpf,
            torch.tensor(np.asarray(rays["rays_o"])),
            torch.tensor(np.asarray(rays["rays_d"])),
            torch.tensor(np.asarray(rays["view_dirs"])),
            torch.tensor(np.asarray(rays["near"])),
            torch.tensor(np.asarray(rays["far"])),
        )
        tt = torch.tensor(np.asarray(target))
        loss_t = ((out_t["rgb_fine"] - tt) ** 2).mean() + ((out_t["rgb_coarse"] - tt) ** 2).mean()
        loss_t.backward()

        for name, jp, tp in (("coarse", grads["coarse"], tpc), ("fine", grads["fine"], tpf)):
            for i, (gj, tw) in enumerate(zip(jax_leaves(jp), torch_leaves(tp))):
                gj = np.asarray(gj)
                gt = tw.grad.numpy()
                scale = max(np.abs(gt).max(), 1e-8)
                np.testing.assert_allclose(
                    gj / scale, gt / scale, atol=3e-5,
                    err_msg=f"{name} leaf {i}",
                )
