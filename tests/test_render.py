"""Tests for sampling, compositing and the fused render step."""

import jax
import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.fields.mlp import MLPConfig
from simplenerf_tpu.render import renderer, sampling, volume


class TestStratified:
    def test_deterministic_linspace(self):
        near = jnp.full((4, 1), 2.0)
        far = jnp.full((4, 1), 6.0)
        z = sampling.stratified_z_vals(None, near, far, 5, perturb=False)
        np.testing.assert_allclose(np.asarray(z[0]), [2, 3, 4, 5, 6], atol=1e-6)

    def test_lindisp(self):
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 4.0)
        z = sampling.stratified_z_vals(None, near, far, 3, lindisp=True, perturb=False)
        # disparity linspace: 1/z in [1, 0.625, 0.25] -> z = [1, 1.6, 4]
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], atol=1e-5)

    def test_jitter_within_bins(self):
        near = jnp.full((64, 1), 0.0)
        far = jnp.full((64, 1), 1.0)
        z = sampling.stratified_z_vals(jax.random.PRNGKey(0), near, far, 16, perturb=True)
        zs = np.asarray(z)
        assert np.all(np.diff(zs, axis=-1) > -1e-6)  # sorted
        assert np.all(zs >= 0.0) and np.all(zs <= 1.0)
        base = np.linspace(0, 1, 16)
        assert not np.allclose(zs[0], base)


class TestSamplePDF:
    def test_uniform_weights_uniform_samples(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
        weights = jnp.ones((2, 8))
        s = sampling.sample_pdf(None, bins, weights, 17, deterministic=True)
        np.testing.assert_allclose(np.asarray(s[0]), np.linspace(0, 1, 17), atol=1e-5)

    def test_concentrated_weights(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
        weights = jnp.zeros((1, 10)).at[0, 4].set(1000.0)
        s = sampling.sample_pdf(jax.random.PRNGKey(1), bins, weights, 64)
        inside = np.mean((np.asarray(s) >= 0.4) & (np.asarray(s) <= 0.5))
        assert inside > 0.95

    def test_no_gradient_through_fine_positions(self):
        z_coarse = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (2, 8))

        def f(w):
            z = sampling.fine_z_vals(None, z_coarse, w, 4, perturb=False)
            return jnp.sum(z)

        g = jax.grad(f)(jnp.ones((2, 8)))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


class TestComposite:
    def test_opaque_first_sample(self):
        """A huge sigma at the first sample pins depth/rgb to that sample."""
        nr, ns = 2, 8
        z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, ns), (nr, ns))
        sigma = jnp.zeros((nr, ns)).at[:, 2].set(1e8)
        rgb = jnp.zeros((3, nr, ns)).at[:, :, 2].set(jnp.array([0.2, 0.5, 0.9])[:, None])
        rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (nr, 1))
        out = volume.composite(sigma, rgb, z, rays_d)
        np.testing.assert_allclose(np.asarray(out["rgb"][0]), [0.2, 0.5, 0.9], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["depth"]), z[:, 2], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-5)
        assert np.all(np.asarray(out["depth_var"]) < 1e-6)

    def test_empty_space(self):
        nr, ns = 1, 4
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, ns), (nr, ns))
        out = volume.composite(
            jnp.zeros((nr, ns)), jnp.ones((3, nr, ns)), z,
            jnp.array([[0.0, 0.0, -1.0]]),
        )
        np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)

    def test_white_background(self):
        nr, ns = 1, 4
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, ns), (nr, ns))
        out = volume.composite(
            jnp.zeros((nr, ns)), jnp.zeros((3, nr, ns)), z,
            jnp.array([[0.0, 0.0, -1.0]]), white_bkgd=True,
        )
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)

    def test_alpha_formula(self):
        """alpha = 1 - exp(-sigma * dz * |d|) with an infinite last bin."""
        z = jnp.array([[1.0, 2.0]])
        sigma = jnp.array([[0.7, 0.3]])
        rays_d = jnp.array([[0.0, 0.0, -2.0]])  # norm 2 scales deltas
        out = volume.composite(sigma, jnp.zeros((3, 1, 2)), z, rays_d)
        a0 = 1 - np.exp(-0.7 * (2.0 - 1.0) * 2.0)
        a1 = 1.0  # infinite last bin
        np.testing.assert_allclose(np.asarray(out["alpha"][0]), [a0, a1], atol=1e-6)
        # weights = alpha * transmittance
        np.testing.assert_allclose(
            np.asarray(out["weights"][0]), [a0, (1 - a0 + 1e-10) * a1], atol=1e-6
        )

    def test_ndc_metric_depth(self):
        """NDC compositing reports both ndc and metric expected depth."""
        nr, ns = 1, 6
        z_ndc = jnp.broadcast_to(jnp.linspace(0.0, 0.9, ns), (nr, ns))
        sigma = jnp.zeros((nr, ns)).at[:, 3].set(1e8)
        rgb = jnp.zeros((3, nr, ns))
        rays_o = jnp.zeros((nr, 3))
        rays_d = jnp.array([[0.0, 0.0, -1.0]])
        out = volume.composite(
            sigma, rgb, z_ndc, rays_d, ndc=True, rays_o_world=rays_o, rays_d_world=rays_d
        )
        np.testing.assert_allclose(np.asarray(out["depth_ndc"][0]), z_ndc[0, 3], rtol=1e-5)
        # metric depth of ndc z: with tn=1, oz'=-1 -> t = 1/(1-z') ... check via roundtrip
        from simplenerf_tpu.geometry import projection

        expected = projection.depth_from_ndc(z_ndc[:, 3:4], rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(out["depth"][0]), expected[0, 0], rtol=1e-4)


def tiny_render_cfg(**kw):
    mlp_kw = dict(points_net_depth=2, views_net_depth=1, points_net_width=32,
                  views_net_width=16, points_pe_degree=4, views_pe_degree=2)
    defaults = dict(
        coarse_mlp=MLPConfig(num_samples=8, **mlp_kw),
        fine_mlp=MLPConfig(num_samples=16, **mlp_kw),
        points_aug_coarse_mlp=MLPConfig(num_samples=8, points_sigma_pe_degree=2, **mlp_kw),
        views_aug_coarse_mlp=MLPConfig(
            num_samples=8, use_view_dirs=False, view_dependent_rgb=False, **mlp_kw
        ),
        ndc=False,
        perturb=True,
        raw_noise_std=1.0,
    )
    defaults.update(kw)
    return renderer.RenderConfig(**defaults)


def make_rays(nr=16, ndc=False):
    key = jax.random.PRNGKey(42)
    d = jax.random.normal(key, (nr, 3))
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.5)
    rays = {
        "rays_o": jnp.zeros((nr, 3)),
        "rays_d": d,
        "view_dirs": d / jnp.linalg.norm(d, axis=-1, keepdims=True),
        "near": jnp.full((nr, 1), 1.0),
        "far": jnp.full((nr, 1), 6.0),
    }
    if ndc:
        rays["rays_o_ndc"] = jnp.zeros((nr, 3))
        rays["rays_d_ndc"] = d * 0.1
        rays["near_ndc"] = jnp.zeros((nr, 1))
        rays["far_ndc"] = jnp.ones((nr, 1))
    return rays


class TestRenderer:
    def test_train_output_contract(self):
        cfg = tiny_render_cfg()
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        out = renderer.render_rays(params, cfg, make_rays(), jax.random.PRNGKey(1), train=True)
        for k in [
            "rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine",
            "depth_var_coarse", "depth_var_fine", "acc_coarse", "acc_fine",
            "weights_coarse", "z_vals_coarse", "z_vals_fine",
            "points_augmentation_rgb_coarse", "points_augmentation_depth_coarse",
            "views_augmentation_rgb_coarse", "views_augmentation_depth_coarse",
            "raw_sigma_coarse", "raw_rgb_fine",
        ]:
            assert k in out, k
        assert out["rgb_fine"].shape == (16, 3)
        assert out["z_vals_fine"].shape == (16, 8 + 16)
        # Fine z-vals sorted.
        assert np.all(np.diff(np.asarray(out["z_vals_fine"]), axis=-1) >= 0)

    def test_eval_mode_drops_augmentations(self):
        cfg = tiny_render_cfg()
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        out = renderer.render_rays(params, cfg, make_rays(), train=False)
        assert not any(k.startswith("points_augmentation") for k in out)
        assert not any(k.startswith("views_augmentation") for k in out)
        assert not any(k.startswith("raw_") for k in out)

    def test_eval_deterministic(self):
        cfg = tiny_render_cfg()
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        a = renderer.render_rays(params, cfg, make_rays(), jax.random.PRNGKey(1), train=False)
        b = renderer.render_rays(params, cfg, make_rays(), jax.random.PRNGKey(2), train=False)
        np.testing.assert_allclose(np.asarray(a["rgb_fine"]), np.asarray(b["rgb_fine"]), atol=1e-6)

    def test_ndc_render(self):
        cfg = tiny_render_cfg(ndc=True)
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        out = renderer.render_rays(params, cfg, make_rays(ndc=True), jax.random.PRNGKey(1), train=True)
        assert "depth_ndc_fine" in out and "depth_var_ndc_fine" in out
        assert np.all(np.isfinite(np.asarray(out["depth_fine"])))

    def test_jit_and_grad(self):
        cfg = tiny_render_cfg()
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        rays = make_rays()

        @jax.jit
        def loss_fn(p, key):
            out = renderer.render_rays(p, cfg, rays, key, train=True)
            return jnp.mean(out["rgb_fine"] ** 2) + jnp.mean(out["rgb_coarse"] ** 2)

        g = jax.grad(loss_fn)(params, jax.random.PRNGKey(3))
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        # Coarse MLP gets gradient; fine MLP gets gradient.
        assert float(jnp.abs(g["coarse"]["pts"][0]["w"]).sum()) > 0
        assert float(jnp.abs(g["fine"]["pts"][0]["w"]).sum()) > 0

    def test_fused_ensemble_matches_xla_path(self):
        """Train render via the stacked coarse kernel == the XLA MLP path.

        fused_mlp='on' routes the 3 coarse models (main + points-aug +
        Lambertian views-aug) through one pallas_call (interpret mode on
        CPU); noise off so both paths are deterministic given the key."""
        cfg_off = tiny_render_cfg(raw_noise_std=0.0, fused_mlp="off")
        cfg_on = tiny_render_cfg(raw_noise_std=0.0, fused_mlp="on")
        params = renderer.init(jax.random.PRNGKey(0), cfg_off)
        rays = make_rays()
        key = jax.random.PRNGKey(1)
        a = renderer.render_rays(params, cfg_off, rays, key, train=True)
        b = renderer.render_rays(params, cfg_on, rays, key, train=True)
        assert set(a) == set(b)
        for k in [
            "rgb_coarse", "depth_coarse", "weights_coarse",
            "points_augmentation_rgb_coarse", "points_augmentation_depth_coarse",
            "views_augmentation_rgb_coarse", "views_augmentation_depth_coarse",
            "rgb_fine", "depth_fine",
        ]:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=5e-5, err_msg=k
            )

    def test_fused_fine_ensemble_six_mlp(self):
        """6-MLP config: the FINE trio also runs as one stacked pallas_call
        (values AND gradients match the per-member XLA path)."""
        mlp_kw = dict(points_net_depth=2, views_net_depth=1, points_net_width=32,
                      views_net_width=16, points_pe_degree=4, views_pe_degree=2)
        six = dict(
            points_aug_fine_mlp=MLPConfig(
                num_samples=16, points_sigma_pe_degree=2, **mlp_kw),
            views_aug_fine_mlp=MLPConfig(
                num_samples=16, use_view_dirs=False, view_dependent_rgb=False, **mlp_kw),
        )
        cfg_off = tiny_render_cfg(raw_noise_std=0.0, fused_mlp="off", **six)
        cfg_on = tiny_render_cfg(raw_noise_std=0.0, fused_mlp="on", **six)
        params = renderer.init(jax.random.PRNGKey(0), cfg_off)
        rays = make_rays()
        key = jax.random.PRNGKey(1)

        def loss(p, cfg):
            out = renderer.render_rays(p, cfg, rays, key, train=True)
            terms = [
                out["rgb_fine"], out["depth_fine"],
                out["points_augmentation_rgb_fine"], out["points_augmentation_depth_fine"],
                out["views_augmentation_rgb_fine"], out["views_augmentation_depth_fine"],
            ]
            return sum(jnp.mean(t**2) for t in terms), out

        (la, a), ga = jax.value_and_grad(loss, has_aux=True)(params, cfg_off)
        (lb, b), gb = jax.value_and_grad(loss, has_aux=True)(params, cfg_on)
        for k in [
            "rgb_fine", "depth_fine",
            "points_augmentation_rgb_fine", "points_augmentation_depth_fine",
            "views_augmentation_rgb_fine", "views_augmentation_depth_fine",
        ]:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=5e-5, err_msg=k
            )
        np.testing.assert_allclose(float(la), float(lb), atol=1e-5)
        for (pa_, leaf_a), (_, leaf_b) in zip(
            jax.tree_util.tree_leaves_with_path(ga), jax.tree_util.tree_leaves_with_path(gb)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), atol=5e-4,
                err_msg=jax.tree_util.keystr(pa_),
            )

    def test_keep_per_sample_false(self):
        cfg = tiny_render_cfg()
        params = renderer.init(jax.random.PRNGKey(0), cfg)
        out = renderer.render_rays(
            params, cfg, make_rays(), train=False, keep_per_sample=False
        )
        assert "alpha_fine" not in out and "weights_fine" not in out
        assert "rgb_fine" in out and "depth_fine" in out
