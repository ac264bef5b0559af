"""Golden-value and property tests for the geometry core."""

import numpy as np
import jax.numpy as jnp

from simplenerf_tpu.geometry import poses, projection, rays


def make_w2c(rot_deg_y=0.0, t=(0.0, 0.0, 0.0)):
    th = np.deg2rad(rot_deg_y)
    r = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m


class TestPoses:
    def test_average_pose_of_identical_cameras(self):
        w2c = make_w2c(15.0, (1.0, 2.0, 3.0))
        batch = np.stack([w2c, w2c, w2c])
        avg = poses.average_pose(batch)
        # Average of identical cameras is that camera (up to orthonormalization).
        np.testing.assert_allclose(avg, w2c, atol=1e-6)

    def test_recenter_identity(self):
        w2c = make_w2c(10.0, (0.5, -1.0, 2.0))
        centered = poses.recenter_poses(w2c[None], w2c)
        np.testing.assert_allclose(centered[0], np.eye(4), atol=1e-9)

    def test_preprocess_poses_train_scale(self):
        w2c = np.stack([make_w2c(0.0, (0, 0, 5.0)), make_w2c(20.0, (1.0, 0, 5.0))])
        bounds = np.array([2.0, 10.0])
        out = poses.preprocess_poses(w2c, bounds=bounds, bd_factor=0.75, recenter=True)
        sc = 1.0 / (2.0 * 0.75)
        assert np.isclose(out["sc"], sc)
        np.testing.assert_allclose(out["bounds"], bounds * sc)
        assert out["poses"].shape == (2, 4, 4)
        assert out["poses"].dtype == np.float32

    def test_test_mode_reuses_stored_normalization(self):
        w2c = np.stack([make_w2c(0.0, (0, 0, 5.0)), make_w2c(20.0, (1.0, 0, 5.0))])
        bounds = np.array([2.0, 10.0])
        train = poses.preprocess_poses(w2c, bounds=bounds, bd_factor=0.75)
        test = poses.preprocess_poses(
            w2c,
            train_mode=False,
            translation_scale=train["sc"],
            avg_pose=train["average_pose"],
        )
        np.testing.assert_allclose(test["poses"], train["poses"], atol=1e-6)


class TestSpherify:
    """Golden checks for spherify_poses (ref DataPreprocessor01.py:1032-1088).

    Geometry: 8 c2w cameras on a circle of radius 2 in the z=1 plane, all
    looking at the origin. Hand-derived facts: the point minimizing distance
    to all camera z-axes is the origin; the mean camera offset (the spherify
    'up') is (0, 0, 1); every camera sits at distance sqrt(5) from the
    focus, so the normalization scale is 1/sqrt(5) and the reset origins
    are unit vectors whose z-components all equal 1/sqrt(5)."""

    @staticmethod
    def _ring_c2w(n=8, radius=2.0, z=1.0):
        out = []
        for th in np.linspace(0.0, 2 * np.pi, n, endpoint=False):
            pos = np.array([radius * np.cos(th), radius * np.sin(th), z])
            fwd = poses.normalize(-pos)  # z-axis looks at the origin
            right = poses.normalize(np.cross(np.array([0.0, 0.0, 1.0]), fwd))
            up = np.cross(fwd, right)
            c2w = np.eye(4)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
            out.append(c2w)
        return np.stack(out)

    def test_golden_ring(self):
        ring = self._ring_c2w()
        bounds = np.array([2.0, 10.0])
        reset, render, new_bounds, transform = poses.spherify_poses(ring, bounds)
        # Scale = 1/sqrt(5): every camera is sqrt(4+1) from the focus (origin).
        assert np.isclose(transform["scale"], 1 / np.sqrt(5.0), atol=1e-6)
        np.testing.assert_allclose(new_bounds, bounds / np.sqrt(5.0), atol=1e-6)
        # Focus = origin: the stored frame's translation column.
        np.testing.assert_allclose(np.asarray(transform["c2w"])[:3, 3], 0.0, atol=1e-6)
        # Reset origins are unit vectors with constant z = 1/sqrt(5).
        t = reset[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-6)
        np.testing.assert_allclose(t[:, 2], 1 / np.sqrt(5.0), atol=1e-6)
        # Render path: 120 poses on the same circle, unit distance.
        assert render.shape == (120, 4, 4)
        np.testing.assert_allclose(
            np.linalg.norm(render[:, :3, 3], axis=1), 1.0, atol=1e-6
        )

    def test_transform_reuse_matches(self):
        """Applying the stored transform reproduces the training output —
        the test-mode path through preprocess_poses(spherify=True)."""
        ring = self._ring_c2w()
        reset, _, _, transform = poses.spherify_poses(ring, None)
        reset2, _, _, t2 = poses.spherify_poses(ring, None, transform=transform)
        np.testing.assert_allclose(reset2, reset, atol=1e-12)
        assert t2 == transform

    def test_preprocess_poses_spherify_roundtrip(self):
        """Train-mode spherify stores a transform; test mode reusing it maps
        the same w2c inputs to identical normalized poses."""
        ring_w2c = np.linalg.inv(self._ring_c2w(z=1.5))
        bounds = np.array([2.0, 10.0])
        train = poses.preprocess_poses(
            ring_w2c, bounds=bounds, bd_factor=0.75, spherify=True
        )
        assert "spherify_transform" in train and "render_poses" in train
        test = poses.preprocess_poses(
            ring_w2c,
            train_mode=False,
            translation_scale=train["sc"],
            avg_pose=train["average_pose"],
            spherify=True,
            spherify_transform=train["spherify_transform"],
        )
        np.testing.assert_allclose(test["poses"], train["poses"], atol=1e-6)


class TestRays:
    def test_identity_camera_center_pixel(self):
        h, w = 4, 6
        fx = fy = 10.0
        intrinsic = jnp.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
        c2w = jnp.eye(4)
        rays_o, rays_d = rays.get_rays(h, w, intrinsic, c2w)
        assert rays_o.shape == (h, w, 3) and rays_d.shape == (h, w, 3)
        np.testing.assert_allclose(np.asarray(rays_o), 0.0, atol=1e-7)
        # Camera looks along -z in the NeRF convention.
        assert np.all(np.asarray(rays_d[..., 2]) < 0)
        # The pixel at the principal point goes straight down -z.
        d_center = np.asarray(rays_d[2, 3])
        np.testing.assert_allclose(d_center, [0, 0, -1.0], atol=1e-6)

    def test_ray_through_known_pixel(self):
        h, w = 8, 8
        intrinsic = jnp.array([[4.0, 0, 4.0], [0, 4.0, 4.0], [0, 0, 1.0]])
        c2w = jnp.eye(4)
        _, rays_d = rays.get_rays(h, w, intrinsic, c2w)
        # pixel (x=6, y=2): cam dir = K^-1 (6,2,1) = (0.5, -0.5, 1) -> flip y,z
        np.testing.assert_allclose(np.asarray(rays_d[2, 6]), [0.5, 0.5, -1.0], atol=1e-6)

    def test_view_dirs_unit_norm(self):
        d = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, -2.0]])
        v = rays.get_view_dirs(d)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-6)

    def test_ndc_bounds(self):
        """Points at z=-near map to ndc z=0; z->-inf maps to ndc z->1."""
        h = w = 8
        f = 4.0
        rays_o = jnp.array([[0.0, 0.0, 0.0]])
        rays_d = jnp.array([[0.1, -0.2, -1.0]])
        o_ndc, d_ndc = rays.ndc_rays(rays_o, rays_d, h, w, f, f, near=1.0)
        # Origin shifted to the near plane: ndc z = 1 + 2*near/oz = 1 - 2 = -1
        np.testing.assert_allclose(np.asarray(o_ndc[0, 2]), -1.0, atol=1e-6)
        # Travelling the full d_ndc lands on ndc z = 1 (infinity).
        np.testing.assert_allclose(np.asarray(o_ndc[0, 2] + d_ndc[0, 2]), 1.0, atol=1e-6)


class TestProjection:
    def test_reproject_identity_camera(self):
        intrinsic = jnp.array([[10.0, 0, 5.0], [0, 10.0, 5.0], [0, 0, 1.0]])
        pose = jnp.eye(4)[None]
        # A point on the -z axis projects to the principal point.
        pts = jnp.array([[0.0, 0.0, -3.0]])
        pix = projection.reproject(pts, pose, intrinsic)
        np.testing.assert_allclose(np.asarray(pix[0]), [5.0, 5.0], atol=1e-5)
        # +x world offset moves the projection +x in pixels; +y moves -y
        # (flip to OpenCV's y-down).
        pix2 = projection.reproject(jnp.array([[0.3, 0.3, -3.0]]), pose, intrinsic)
        assert pix2[0, 0] > 5.0 and pix2[0, 1] < 5.0

    def test_ndc_depth_roundtrip(self):
        rays_o = jnp.array([[0.0, 0.0, 0.0]])
        rays_d = jnp.array([[0.0, 0.0, -1.0]])
        depths = jnp.array([[1.0, 2.0, 5.0, 50.0]])
        z_ndc = projection.depth_to_ndc(depths.T, rays_o.repeat(4, 0), rays_d.repeat(4, 0)).T
        back = projection.depth_from_ndc(z_ndc, rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(back), np.asarray(depths), rtol=1e-5)

    def test_ndc_depth_known_values(self):
        # Straight-down-the-axis ray from origin: tn = 1, oz' = -1.
        # depth d -> ndc z = 1 - 1/d ... for this geometry: z = 1 - (-1)/(-1+(d-1)*(-1)) = 1 - 1/d
        rays_o = jnp.zeros((1, 3))
        rays_d = jnp.array([[0.0, 0.0, -1.0]])
        z = projection.depth_to_ndc(jnp.array([[2.0]]), rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(z), [[0.5]], atol=1e-6)
