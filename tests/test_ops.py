"""Fused Pallas MLP kernel vs the XLA blocked evaluation (interpret mode).

`fields.mlp.apply` is itself tested equal to the reference transcription
(test_fields.TestBlockedEquivalence), so matching it transitively matches
the reference MLP (src/models/SimpleNeRF01.py:560-715).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from simplenerf_tpu.fields import mlp


def small_cfg(**kw):
    base = dict(
        points_net_depth=4,
        views_net_depth=1,
        points_net_width=64,
        views_net_width=64,
        points_pe_degree=10,
        views_pe_degree=4,
        use_view_dirs=True,
        view_dependent_rgb=True,
        skip_layers=(2,),
    )
    base.update(kw)
    return mlp.MLPConfig(**base)


CASES = {
    "main": small_cfg(),
    "points_aug": small_cfg(points_sigma_pe_degree=3),
    "lambertian": small_cfg(use_view_dirs=False, view_dependent_rgb=False),
    "visibility": small_cfg(predict_visibility=True),
    "two_skips": small_cfg(points_net_depth=5, skip_layers=(1, 3)),
}


def _inputs(nr, ns, seed=0):
    pts = jax.random.normal(jax.random.PRNGKey(seed), (nr * ns, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(seed + 1), (nr, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return pts, dirs


class TestFusedMLP:
    @pytest.mark.parametrize("name", sorted(CASES))
    def test_forward_matches_apply(self, name):
        cfg = CASES[name]
        params = mlp.init(jax.random.PRNGKey(3), cfg)
        nr, ns = 6, 5  # forces ray padding (tile_rays > nr divisors)
        pts, dirs = _inputs(nr, ns)
        ref = mlp.to_planes(mlp.apply(params, cfg, pts, view_dirs=dirs, view_dirs_tile=ns), nr, ns)
        fused = mlp.apply_fused(params, cfg, pts, view_dirs=dirs, view_dirs_tile=ns)
        assert set(fused) == set(ref)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(fused[k]), np.asarray(ref[k]), atol=3e-5, err_msg=f"{name}/{k}"
            )

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_grads_match_apply(self, name):
        cfg = CASES[name]
        params = mlp.init(jax.random.PRNGKey(4), cfg)
        pts, dirs = _inputs(4, 6, seed=10)

        def loss(apply_fn, p):
            o = apply_fn(p, cfg, pts, view_dirs=dirs, view_dirs_tile=6)
            val = jnp.sum(o["rgb"] * 1.7) + jnp.sum(o["sigma"] * 0.3)
            if "visibility" in o:
                val = val + jnp.sum(o["visibility"])
            return val

        gr, _ = jax.flatten_util.ravel_pytree(jax.grad(lambda p: loss(mlp.apply, p))(params))
        gf, _ = jax.flatten_util.ravel_pytree(
            jax.grad(lambda p: loss(mlp.apply_fused, p))(params)
        )
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, err_msg=name)

    def test_per_point_dirs(self):
        """view_dirs_tile=1: per-point directions, hvx grouping of 1."""
        cfg = CASES["main"]
        params = mlp.init(jax.random.PRNGKey(5), cfg)
        n = 40
        pts = jax.random.normal(jax.random.PRNGKey(6), (n, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(7), (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        ref = mlp.to_planes(mlp.apply(params, cfg, pts, view_dirs=dirs), n, 1)
        fused = mlp.apply_fused(params, cfg, pts, view_dirs=dirs)
        for k in ref:
            np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(ref[k]), atol=3e-5)

    def test_sigma_noise_applied(self):
        """Noise goes into raw sigma pre-ReLU, keyed identically to apply."""
        cfg = CASES["main"]
        params = mlp.init(jax.random.PRNGKey(8), cfg)
        pts, dirs = _inputs(4, 4, seed=20)
        key = jax.random.PRNGKey(99)
        ref = mlp.apply(params, cfg, pts, view_dirs=dirs, view_dirs_tile=4, noise_std=1.0, noise_key=key)
        fused = mlp.apply_fused(
            params, cfg, pts, view_dirs=dirs, view_dirs_tile=4, noise_std=1.0, noise_key=key
        )
        np.testing.assert_allclose(
            np.asarray(fused["sigma"]), np.asarray(ref["sigma"]).reshape(4, 4), atol=3e-5
        )

    def test_bf16_close_to_f32(self):
        cfg = CASES["main"]
        params = mlp.init(jax.random.PRNGKey(9), cfg)
        pts, dirs = _inputs(4, 8, seed=30)
        f32 = mlp.apply_fused(params, cfg, pts, view_dirs=dirs, view_dirs_tile=8)
        bf16 = mlp.apply_fused(
            params, cfg, pts, view_dirs=dirs, view_dirs_tile=8, dtype=jnp.bfloat16
        )
        np.testing.assert_allclose(np.asarray(f32["rgb"]), np.asarray(bf16["rgb"]), atol=0.05)


class TestFusedEnsemble:
    """Stacked multi-model kernel == per-member fused evaluation.

    The trio mirrors the published coarse ensemble: full main model,
    points-aug (reduced sigma PE), Lambertian views-aug
    (reference src/models/SimpleNeRF01.py:170-199)."""

    TRIO = ["main", "points_aug", "lambertian"]

    def _members(self, seed=0):
        return [
            (mlp.init(jax.random.PRNGKey(seed + i), CASES[n]), CASES[n])
            for i, n in enumerate(self.TRIO)
        ]

    def test_forward_matches_per_member(self):
        members = self._members()
        nr, ns = 6, 5  # forces ray padding
        pts, dirs = _inputs(nr, ns, seed=50)
        outs = mlp.apply_fused_ensemble(members, pts, view_dirs=dirs, view_dirs_tile=ns)
        for (params, cfg), got in zip(members, outs):
            ref = mlp.apply_fused(params, cfg, pts, view_dirs=dirs, view_dirs_tile=ns)
            assert set(got) == set(ref)
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), atol=3e-5, err_msg=k
                )

    def test_grads_match_per_member(self):
        members = self._members(seed=7)
        pts, dirs = _inputs(4, 6, seed=60)

        def loss_ens(ps):
            outs = mlp.apply_fused_ensemble(
                [(p, cfg) for p, (_, cfg) in zip(ps, members)],
                pts, view_dirs=dirs, view_dirs_tile=6,
            )
            return sum(
                jnp.sum(o["rgb"] * (1.3 + i)) + jnp.sum(o["sigma"] * (0.3 + i))
                for i, o in enumerate(outs)
            )

        def loss_sep(ps):
            return sum(
                jnp.sum(o["rgb"] * (1.3 + i)) + jnp.sum(o["sigma"] * (0.3 + i))
                for i, o in enumerate(
                    mlp.apply_fused(p, cfg, pts, view_dirs=dirs, view_dirs_tile=6)
                    for p, (_, cfg) in zip(ps, members)
                )
            )

        ps = [p for p, _ in members]
        ge, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_ens)(ps))
        gs, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_sep)(ps))
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gs), atol=1e-4)

    def test_sigma_noise_keys_per_member(self):
        members = self._members(seed=11)
        pts, dirs = _inputs(4, 4, seed=70)
        nkeys = [jax.random.PRNGKey(100 + i) for i in range(3)]
        outs = mlp.apply_fused_ensemble(
            members, pts, view_dirs=dirs, view_dirs_tile=4, noise_std=1.0, noise_keys=nkeys
        )
        for (params, cfg), got, nk in zip(members, outs, nkeys):
            ref = mlp.apply_fused(
                params, cfg, pts, view_dirs=dirs, view_dirs_tile=4, noise_std=1.0, noise_key=nk
            )
            np.testing.assert_allclose(np.asarray(got["sigma"]), np.asarray(ref["sigma"]), atol=3e-5)


class TestForwardHalves:
    def test_halves_two_matches_single_chain(self):
        """spec.halves=2 (interleaved fwd chains) computes the same planes."""
        import dataclasses

        from simplenerf_tpu.ops import fused_mlp
        from simplenerf_tpu.fields import encoding
        import jax.numpy as jnp

        cfg = CASES["main"]
        params = mlp.init(jax.random.PRNGKey(12), cfg)
        nr, ns = 32, 4
        pts, dirs = _inputs(nr, ns, seed=40)
        kp = fused_mlp.kernel_params(params, cfg)
        xv, sv, cv = encoding.encode_parts(dirs, cfg.views_pe_degree)
        hvx = jnp.concatenate([xv, sv, cv], axis=-1) @ fused_mlp.dirs_w(params, cfg)

        base = fused_mlp.make_spec(cfg, ns, jnp.float32)
        s1 = dataclasses.replace(base, tile_rays=16, halves=1)
        s2 = dataclasses.replace(base, tile_rays=16, halves=2)
        lo, hi = mlp._trunk_inputs(cfg, pts, base.cdtype)
        out1 = fused_mlp.fused_apply(s1, kp, lo, hi, hvx)
        out2 = fused_mlp.fused_apply(s2, kp, lo, hi, hvx)
        for a, b in zip(out1, out2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestForwardKnobs:
    """The perf env knobs (tile size, parallel grid) must not change values."""

    def test_tile_rays_override_matches(self, monkeypatch):
        cfg = CASES["main"]
        params = mlp.init(jax.random.PRNGKey(3), cfg)
        nr, ns = 6, 5
        pts, dirs = _inputs(nr, ns)
        base = mlp.apply_fused(params, cfg, pts, view_dirs=dirs, view_dirs_tile=ns)
        monkeypatch.setenv("SIMPLENERF_TILE_RAYS", "16")
        monkeypatch.setenv("SIMPLENERF_FWD_PARALLEL_GRID", "1")
        knobbed = mlp.apply_fused(params, cfg, pts, view_dirs=dirs, view_dirs_tile=ns)
        for k in base:
            np.testing.assert_allclose(np.asarray(base[k]), np.asarray(knobbed[k]),
                                       rtol=1e-6, atol=1e-6)

    def test_tile_rays_override_grads_match(self, monkeypatch):
        cfg = CASES["main"]
        params = mlp.init(jax.random.PRNGKey(3), cfg)
        nr, ns = 6, 5
        pts, dirs = _inputs(nr, ns)

        def loss(p):
            out = mlp.apply_fused(p, cfg, pts, view_dirs=dirs, view_dirs_tile=ns)
            return sum(jnp.sum(v**2) for v in out.values())

        g0 = jax.grad(loss)(params)
        monkeypatch.setenv("SIMPLENERF_TILE_RAYS", "16")
        g1 = jax.grad(loss)(params)
        f0, _ = jax.flatten_util.ravel_pytree(g0)
        f1, _ = jax.flatten_util.ravel_pytree(g1)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-6)
