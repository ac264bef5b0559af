"""Tests for the loss subsystem: masked reductions, schedules, arbitration."""

import jax
import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.losses import LossComputer, LossContext
from simplenerf_tpu.losses import common, consistency
from simplenerf_tpu.losses.photometric import make_photometric_loss
from simplenerf_tpu.losses.depth_supervision import make_sparse_depth_loss


class TestCommon:
    def test_masked_mean(self):
        x = jnp.array([1.0, 2.0, 3.0, 4.0])
        m = jnp.array([True, True, False, False])
        assert float(common.masked_mean(x, m)) == 1.5
        assert float(common.masked_mean(x, jnp.zeros(4, bool))) == 0.0

    def test_closest_other_frame(self):
        poses = jnp.stack([jnp.eye(4)] * 3)
        poses = poses.at[0, :3, 3].set(jnp.array([0.0, 0, 0]))
        poses = poses.at[1, :3, 3].set(jnp.array([1.0, 0, 0]))
        poses = poses.at[2, :3, 3].set(jnp.array([10.0, 0, 0]))
        c = np.asarray(common.closest_other_frame(poses))
        assert c[0] == 1 and c[1] == 0 and c[2] == 1

    def test_gather_patches_center_and_clamp(self):
        img = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
        p = common.gather_patches(
            img, jnp.array([1]), jnp.array([2]), jnp.array([1]), 3, 3
        )
        assert p.shape == (1, 3, 3, 1)
        # center = image 1, y=1, x=2 -> 16 + 1*4 + 2 = 22
        assert float(p[0, 1, 1, 0]) == 22.0
        # corner clamp: (x=0, y=0) patch upper-left stays in-bounds
        p2 = common.gather_patches(img, jnp.array([0]), jnp.array([0]), jnp.array([0]), 3, 3)
        assert float(p2[0, 0, 0, 0]) == 0.0  # clamped to pixel (0,0)


def base_batch(nr=8):
    return {
        "indices_mask_nerf": jnp.array([True] * (nr // 2) + [False] * (nr // 2)),
        "indices_mask_sparse_depth": jnp.array([False] * (nr // 2) + [True] * (nr // 2)),
        "target_rgb": jnp.zeros((nr, 3)),
        "sparse_depth_values": jnp.full((nr, 1), 2.0),
    }


class TestPhotometric:
    def test_value_and_masking(self):
        batch = base_batch()
        outputs = {
            "rgb_coarse": jnp.full((8, 3), 0.5),
            "rgb_fine": jnp.concatenate([jnp.full((4, 3), 0.1), jnp.full((4, 3), 9.0)]),
        }
        loss = make_photometric_loss("")(batch, outputs)
        # coarse: 0.25 on the 4 nerf rays; fine: 0.01 (sd rays with 9.0 excluded)
        np.testing.assert_allclose(float(loss), 0.25 + 0.01, atol=1e-6)

    def test_aug_prefix_missing_keys(self):
        batch = base_batch()
        loss = make_photometric_loss("points_augmentation_")(batch, {"rgb_coarse": jnp.zeros((8, 3))})
        assert float(loss) == 0.0


class TestSparseDepth:
    def test_main_prefers_fine(self):
        batch = base_batch()
        outputs = {"depth_coarse": jnp.full((8,), 99.0), "depth_fine": jnp.full((8,), 3.0)}
        loss = make_sparse_depth_loss("")(batch, outputs)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)  # (3-2)^2 on sd rays

    def test_aug_uses_aug_coarse_when_no_aug_fine(self):
        batch = base_batch()
        outputs = {
            "depth_fine": jnp.full((8,), 99.0),
            "points_augmentation_depth_coarse": jnp.full((8,), 4.0),
        }
        loss = make_sparse_depth_loss("points_augmentation_", aug_fine_present=False)(batch, outputs)
        np.testing.assert_allclose(float(loss), 4.0, atol=1e-6)  # (4-2)^2

    def test_aug_falls_back_to_main_fine_quirk(self):
        batch = base_batch()
        outputs = {
            "depth_fine": jnp.full((8,), 3.0),
            "points_augmentation_depth_fine": jnp.full((8,), 50.0),
        }
        loss = make_sparse_depth_loss("points_augmentation_", aug_fine_present=True)(batch, outputs)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)  # main fine, not aug fine


def arbitration_batch(nr=4, d_true=1.0, d_wrong=5.0):
    """Two cameras; image b bright on the right half so the wrong depth's
    reprojection mismatches. All rays shoot through camera 0's center."""
    h = w = 16
    fx = 10.0
    images = np.full((2, h, w, 3), 0.2, np.float32)
    images[1, :, 6:, :] = 0.9  # right side of view b mismatches (clear of d_true's patch)
    poses = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    poses[1, :3, 3] = [0.5, 0.0, 0.0]
    intrinsics = np.array([[[fx, 0, 8.0], [0, fx, 8.0], [0, 0, 1]]] * 2, np.float32)
    batch = {
        "rays_o": jnp.zeros((nr, 3)),
        "rays_d": jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (nr, 1)),
        "pixel_id": jnp.tile(jnp.array([[0, 8, 8]], dtype=jnp.int32), (nr, 1)),
        "indices_mask_nerf": jnp.ones((nr,), bool),
        "common": {
            "images": jnp.asarray(images),
            "poses": jnp.asarray(poses),
            "intrinsics": jnp.asarray(intrinsics),
        },
    }
    return batch, jnp.full((nr,), d_true), jnp.full((nr,), d_wrong)


class TestReliableConsistency:
    def test_reliable_model_teaches_wrong_model(self):
        batch, d1, d2 = arbitration_batch()
        loss, _, _ = consistency.reliable_depth_consistency(d1, d2, batch, (5, 5), 0.1)
        np.testing.assert_allclose(float(loss), (5.0 - 1.0) ** 2, atol=1e-5)

    def test_gradient_flows_only_to_wrong_model(self):
        batch, d1, d2 = arbitration_batch()

        def f(d1_, d2_):
            return consistency.reliable_depth_consistency(d1_, d2_, batch, (5, 5), 0.1)[0]

        g1, g2 = jax.grad(f, argnums=(0, 1))(d1, d2)
        np.testing.assert_allclose(np.asarray(g1), 0.0, atol=1e-7)
        # d/dd2 mean((d2-d1)^2) = 2*(5-1)/nr per lane
        np.testing.assert_allclose(np.asarray(g2), 2 * 4.0 / 4, atol=1e-5)

    def test_no_teacher_above_threshold(self):
        """If both reprojections mismatch (rmse > threshold), no loss."""
        batch, d1, d2 = arbitration_batch()
        # Make view b entirely bright: both models mismatch.
        imgs = np.asarray(batch["common"]["images"]).copy()
        imgs[1, :, :, :] = 0.9
        batch["common"]["images"] = jnp.asarray(imgs)
        loss, _, _ = consistency.reliable_depth_consistency(d1, d2, batch, (5, 5), 0.1)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)

    def test_depth_clip_bounds_pole_rays(self):
        """depth_clip clamps pole-magnitude depths at clip x far and zeroes
        their teaching gradient; clip=None stays reference-exact."""
        batch, d1, d2 = arbitration_batch()
        batch["far"] = jnp.full((4, 1), 2.0)
        # Ray 0's wrong-model depth explodes toward the NDC z->1 pole.
        d2 = d2.at[0].set(1e5)

        def f(d1_, d2_, clip):
            return consistency.reliable_depth_consistency(
                d1_, d2_, batch, (5, 5), 0.1, depth_clip=clip)[0]

        loss_unclipped = float(f(d1, d2, None))
        assert loss_unclipped > 1e8  # quadratic in the pole
        # clip at 3x far=2.0 -> pole ray clamps to 6.0: bounded loss.
        loss_clipped = float(f(d1, d2, 3.0))
        assert loss_clipped < 50.0
        np.testing.assert_allclose(
            loss_clipped, (3 * (5 - 1) ** 2 + (6 - 1) ** 2) / 4, atol=1e-4)
        g2 = jax.grad(f, argnums=1)(d1, d2, 3.0)
        # Clamped ray: d min(d2, 6)/d d2 = 0 -> no runaway gradient.
        np.testing.assert_allclose(float(g2[0]), 0.0, atol=1e-7)
        assert abs(float(g2[1])) > 0.1  # unclamped rays still teach

    def test_depth_huber_bounds_gradient_without_zeroing_it(self):
        """depth_huber: squared error within delta = huber x far, linear
        beyond — the pole ray's teaching gradient is BOUNDED (|g| = 2*delta
        / count) but nonzero, unlike depth_clip which zeroes it; huber=None
        stays reference-exact."""
        batch, d1, d2 = arbitration_batch()
        batch["far"] = jnp.full((4, 1), 2.0)
        d2 = d2.at[0].set(1e5)  # pole ray

        def f(d1_, d2_, hub):
            return consistency.reliable_depth_consistency(
                d1_, d2_, batch, (5, 5), 0.1, depth_huber=hub)[0]

        # Reference-exact when None.
        np.testing.assert_allclose(float(f(d1, d2, None)), float(f(d1, d2, None)))
        # huber at 3x far=2.0 -> delta=6: loss linear in the pole, not quadratic.
        loss_h = float(f(d1, d2, 3.0))
        assert loss_h < 1e6 and loss_h > 1e3  # ~ delta*2*|e|/4 ~ 3e5
        g_none = jax.grad(f, argnums=1)(d1, d2, None)
        g_hub = jax.grad(f, argnums=1)(d1, d2, 3.0)
        # Pole ray: unbounded quadratic gradient becomes exactly 2*delta/4.
        assert abs(float(g_none[0])) > 1e4
        np.testing.assert_allclose(abs(float(g_hub[0])), 2 * 6.0 / 4, rtol=1e-5)
        # Small-error rays are untouched (|e| < delta -> squared branch).
        np.testing.assert_allclose(float(g_hub[1]), float(g_none[1]), rtol=1e-5)

    def test_depth_arb_clip_bounds_mask_inputs_not_gradient(self):
        """depth_arb_clip: the reprojection/arbitration sees the CLAMPED
        depth (bounded coordinates, honest patch comparison for pole rays)
        while the teaching error keeps the raw depths — the restoring
        gradient on a runaway ray is never zeroed (contrast
        test_depth_clip_bounds_pole_rays where it is exactly 0)."""
        batch, d1, d2 = arbitration_batch()
        batch["far"] = jnp.full((4, 1), 2.0)
        d2 = d2.at[0].set(1e5)  # pole ray on the wrong model

        def f(d1_, d2_, arb):
            return consistency.reliable_depth_consistency(
                d1_, d2_, batch, (5, 5), 0.1, depth_arb_clip=arb)[0]

        # Teaching error unchanged by the arb clamp: still quadratic in the
        # pole (the loss VALUE is the reference's; only the masks moved).
        loss_arb = float(f(d1, d2, 3.0))
        assert loss_arb > 1e8
        # ... and the restoring gradient is the raw quadratic one, not 0.
        g2 = jax.grad(f, argnums=1)(d1, d2, 3.0)
        assert abs(float(g2[0])) > 1e4
        # The arbitration itself used the clamped depth: reprojecting ray 0
        # at min(1e5, 6) instead of 1e5 keeps coordinates bounded. With
        # identical-looking patches, the reliable teacher is still d1 (true
        # depth), so the structure of the loss matches the unclamped one on
        # the healthy rays.
        g2_none = jax.grad(f, argnums=1)(d1, d2, None)
        np.testing.assert_allclose(float(g2[1]), float(g2_none[1]), rtol=1e-5)

    def test_coarse_fine_sd_branch(self):
        batch, d1, d2 = arbitration_batch()
        batch["indices_mask_nerf"] = jnp.array([True, True, False, False])
        batch["indices_mask_sparse_depth"] = jnp.array([False, False, True, True])
        fn = consistency.make_reliable_coarse_fine_consistency((5, 5), 0.1, True)
        outputs = {"depth_coarse": d2, "depth_fine": d1}  # coarse wrong, fine right
        loss = float(fn(batch, outputs))
        # nerf part: arbitration says fine (d1) teaches coarse: (5-1)^2 over nerf rays
        # sd part: (5-1)^2 over sd rays
        np.testing.assert_allclose(loss, 16.0 + 16.0, atol=1e-4)


class TestLossComputer:
    def specs(self):
        return [
            {"name": "MSE01", "weight": 1},
            {"name": "SparseDepthMSE01", "weight": 0.1},
            {"name": "CoarseFineConsistencyLoss02", "iter_weights": {"0": 0, "10000": 0.1},
             "rmse_threshold": 0.1, "patch_size": [5, 5]},
        ]

    def test_schedule(self):
        lc = LossComputer(self.specs(), LossContext())
        w = lc.weights_vector(0)
        np.testing.assert_allclose(w, [1.0, 0.1, 0.0])
        w = lc.weights_vector(9999)
        np.testing.assert_allclose(w, [1.0, 0.1, 0.0])
        w = lc.weights_vector(10000)
        np.testing.assert_allclose(w, [1.0, 0.1, 0.1])

    def test_compute_total(self):
        lc = LossComputer(self.specs()[:2], LossContext())
        batch = base_batch()
        outputs = {
            "rgb_coarse": jnp.full((8, 3), 0.5),
            "depth_fine": jnp.full((8,), 3.0),
        }
        total, values = lc.compute(batch, outputs, jnp.asarray(lc.weights_vector(0)))
        np.testing.assert_allclose(float(values["MSE01"]), 0.25, atol=1e-6)
        np.testing.assert_allclose(float(values["SparseDepthMSE01"]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(total), 0.25 + 0.1, atol=1e-6)

    def test_all_losses_buildable_and_jittable(self):
        specs = [
            {"name": n}
            | ({"iter_weights": {"0": 0.1}} if "Loss" in n else {"weight": 1.0})
            for n in [
                "MSE01", "MSE02", "MSE03", "SparseDepthMSE01", "SparseDepthMSE02",
                "SparseDepthMSE03", "DenseDepthMSE01", "PointsAugmentationDepthLoss01",
                "PointsAugmentationDepthLoss02", "ViewsAugmentationDepthLoss01",
                "ViewsAugmentationDepthLoss02", "CoarseFineConsistencyLoss01",
                "CoarseFineConsistencyLoss02", "VisibilityLoss01", "VisibilityPriorLoss01",
            ]
        ]
        lc = LossComputer(specs, LossContext())
        batch, d1, d2 = arbitration_batch(8)
        batch.update(base_batch(8))
        batch["dense_depth_values"] = jnp.full((8, 1), 2.0)
        outputs = {
            "rgb_coarse": jnp.zeros((8, 3)), "rgb_fine": jnp.zeros((8, 3)),
            "points_augmentation_rgb_coarse": jnp.zeros((8, 3)),
            "views_augmentation_rgb_coarse": jnp.zeros((8, 3)),
            "depth_coarse": d1, "depth_fine": d1,
            "points_augmentation_depth_coarse": d2,
            "views_augmentation_depth_coarse": d2,
            "raw_visibility_coarse": jnp.full((8, 4), 0.5),
            "visibility_coarse": jnp.full((8, 4), 0.6),
            "visibility2_coarse": jnp.full((8, 1), 0.8),
        }
        w = jnp.asarray(lc.weights_vector(5000))

        @jax.jit
        def run(b, o, w):
            return lc.compute(b, o, w)

        total, values = run(batch, outputs, w)
        assert np.isfinite(float(total))
        assert len(values) == len(specs) + 1
