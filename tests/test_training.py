"""Integration tests: full train/checkpoint/resume/test loop on the
synthetic scene, single-device and sharded over the 8-device CPU mesh."""

import json

import jax
import numpy as np
import pytest

from simplenerf_tpu.data import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor
from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers.presets import tiny_synthetic_config
from simplenerf_tpu.parallel import make_mesh
from simplenerf_tpu.training.tester import Tester as NerfTester
from simplenerf_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("db")
    gt = generate_scene(root, num_frames=5, h=24, w=32, num_train=3, seed=3)
    return root, gt


def build_trainer(root, out_dir, mesh=None, iters=120, **overrides):
    cfg = tiny_synthetic_config(num_iterations=iters, **overrides)
    raw = get_data_loader(cfg, root, "train").load_data()
    pp = ScenePreprocessor(cfg, "train", raw, seed=0)
    return Trainer(cfg, out_dir, pp, mesh=mesh), cfg, pp


class TestTraining:
    def test_loss_decreases_and_psnr(self, scene, tmp_path):
        root, gt = scene
        trainer, cfg, pp = build_trainer(root, tmp_path / "run", iters=300)
        first = trainer.train_one_iter(0)
        first_total = float(first["TotalLoss"])
        trainer.train()
        last_total = float(trainer.train_one_iter(299)["TotalLoss"])
        assert last_total < first_total * 0.5, (first_total, last_total)

        # Checkpoint written; scalars logged.
        assert (tmp_path / "run/saved_models/Model_Iter000300.msgpack").exists()
        assert (tmp_path / "run/saved_models/Model_Latest.msgpack").exists()
        lines = [json.loads(l) for l in open(tmp_path / "run/logs/scalars.jsonl")]
        assert any("TotalLoss" in l for l in lines)
        assert any("rays_per_s" in l for l in lines)

    def test_resume_from_checkpoint(self, scene, tmp_path):
        root, _ = scene
        trainer, cfg, pp = build_trainer(root, tmp_path / "run", iters=60)
        trainer.configs["model_save_interval"] = 30
        trainer.train(30)
        # Fresh trainer resumes at iter 30 with restored state.
        trainer2, _, _ = build_trainer(root, tmp_path / "run", iters=60)
        assert trainer2.start_iter == 30
        p1 = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
        p2 = jax.tree_util.tree_leaves(jax.device_get(trainer2.params))
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(a, b)
        trainer2.train()  # runs 30 more without error

    def test_resume_is_bit_identical_to_uninterrupted(self, scene, tmp_path):
        """Kill-and-resume must reproduce the uninterrupted run exactly: the
        Trainer fast-forwards the host sampler streams to start_iter and the
        RNG/LR/loss-weights are pure functions of the iteration, so a
        watchdog restart (scripts/tpu_watchdog.py) changes nothing."""
        root, _ = scene
        straight, _, _ = build_trainer(root, tmp_path / "a", iters=60)
        straight.train()

        first, _, _ = build_trainer(root, tmp_path / "b", iters=60)
        first.configs["model_save_interval"] = 30
        first.train(30)
        resumed, _, _ = build_trainer(root, tmp_path / "b", iters=60)
        assert resumed.start_iter == 30
        resumed.train()

        pa = jax.tree_util.tree_leaves(jax.device_get(straight.params))
        pb = jax.tree_util.tree_leaves(jax.device_get(resumed.params))
        for a, b in zip(pa, pb):
            np.testing.assert_array_equal(a, b)

    def test_resume_migrates_per_leaf_adam_checkpoint(self, scene, tmp_path):
        """Checkpoints written before the flat-vector Adam change hold
        per-leaf moment pytrees; resume must migrate them (ravel in the
        params flatten order) rather than crash in from_state_dict."""
        import jax.flatten_util
        import optax

        from simplenerf_tpu.training import checkpoints

        root, _ = scene
        trainer, cfg, pp = build_trainer(root, tmp_path / "run", iters=60)
        trainer.train(30)
        params = jax.device_get(trainer.params)
        # Rebuild the OLD layout with the moments the flat state holds now.
        flat_state = jax.device_get(trainer.opt_state)
        _, unravel = jax.flatten_util.ravel_pytree(params)
        old_scale = flat_state[0]._replace(
            mu=unravel(flat_state[0].mu), nu=unravel(flat_state[0].nu)
        )
        old_state = (old_scale,) + tuple(flat_state[1:])
        ckpt_dir = tmp_path / "run/saved_models"
        for p in ckpt_dir.glob("Model_*"):
            p.unlink()
        checkpoints.save_checkpoint(ckpt_dir, 30, params, old_state)

        with pytest.warns(UserWarning, match="migrated per-leaf Adam"):
            trainer2, _, _ = build_trainer(root, tmp_path / "run", iters=60)
        assert trainer2.start_iter == 30
        mig = jax.device_get(trainer2.opt_state)
        np.testing.assert_allclose(mig[0].mu, flat_state[0].mu)
        np.testing.assert_allclose(mig[0].nu, flat_state[0].nu)
        assert int(mig[0].count) == int(flat_state[0].count)
        trainer2.train()  # continues without error

    def test_tester_end_to_end(self, scene, tmp_path):
        root, gt = scene
        trainer, cfg, pp = build_trainer(root, tmp_path / "run", iters=300)
        trainer.train()

        tester = NerfTester(cfg, pp.get_model_configs())
        tester.load_model(tmp_path / "run/saved_models/Model_Latest.msgpack")
        test_frame = int(gt["test_frames"][0])
        pred = tester.predict_frame(gt["extrinsics"][test_frame])
        assert pred["image"].shape == (24, 32, 3) and pred["image"].dtype == np.uint8
        assert pred["depth"].shape == (24, 32)
        # Novel-view PSNR after 300 tiny iters: just demand better than a
        # constant-gray render and finite depth.
        target = gt["images"][test_frame]
        mse = np.mean((pred["image"] / 255.0 - target) ** 2)
        gray_mse = np.mean((0.5 - target) ** 2)
        assert mse < gray_mse
        assert np.all(np.isfinite(pred["depth"]))

        # save outputs + idempotency
        out = tmp_path / "test_out"
        tester.save_frame_outputs(out, test_frame, pred)
        assert (out / f"predicted_frames/{test_frame:04}.png").exists()
        assert tester.frame_done(out, test_frame)

    def test_validation_renders(self, scene, tmp_path):
        """Reference-style validation (Trainer01.py:109-263): every train
        frame rendered + saved per level, the full loss set evaluated per
        frame, and loss maps written when validation_save_loss_maps is on."""
        root, _ = scene
        trainer, cfg, pp = build_trainer(root, tmp_path / "run", iters=20)
        trainer.configs["validation_save_loss_maps"] = True
        trainer.run_validation(10)
        samples = tmp_path / "run/samples"
        for frame in (int(f) for f in pp.frame_nums):
            for mode in ("coarse", "fine"):
                assert (samples / f"predicted_frames/{frame:04}_{mode}_Iter00010.png").exists()
                assert (samples / f"predicted_depths/{frame:04}_{mode}_Iter00010.npy").exists()
                assert (samples / f"predicted_depths/{frame:04}_{mode}_ndc_Iter00010.npy").exists()
                assert (samples / f"predicted_depths_variance/{frame:04}_{mode}_Iter00010.npy").exists()
        # Loss maps: per-ray maps reshaped to (h, w), npy + png, following
        # the reference's {LossFileStem}_{level} key grammar.
        frame0 = int(pp.frame_nums[0])
        for map_name in ("MSE01_coarse", "MSE01_fine",
                         "CoarseFineConsistencyLoss02_coarse",
                         "CoarseFineConsistencyLoss02_fine"):
            map_npy = samples / f"Losses/{map_name}_{frame0:04}_Iter00010.npy"
            assert map_npy.exists()
            assert (map_npy.with_suffix(".png")).exists()
            assert np.load(map_npy).shape == (24, 32)
        # Per-loss scalars for every configured loss + TotalLoss + psnr logged.
        lines = [json.loads(l) for l in open(tmp_path / "run/logs/scalars.jsonl")]
        merged = {k: v for l in lines for k, v in l.items()}
        for name in [s["name"] for s in cfg["losses"]] + ["TotalLoss", "psnr"]:
            assert f"validation/train_images/{name}" in merged, name
        # Eval-mode renders carry no augmented outputs, so MSE02/03 are 0
        # and MSE01 is finite and positive (reference key-presence guards).
        assert merged["validation/train_images/MSE02"] == 0.0
        assert merged["validation/train_images/MSE01"] > 0.0


class TestShardedTraining:
    def test_mesh_train_step_matches_shapes(self, scene, tmp_path):
        root, _ = scene
        mesh = make_mesh()
        assert mesh.devices.size == 8
        trainer, cfg, pp = build_trainer(root, tmp_path / "run", mesh=mesh, iters=10)
        values = trainer.train_one_iter(0)
        assert np.isfinite(float(values["TotalLoss"]))
        v2 = trainer.train_one_iter(1)
        assert np.isfinite(float(v2["TotalLoss"]))

    def test_sharded_matches_single_device(self, scene, tmp_path):
        """Same seed, same data: sharded and unsharded training agree —
        3 eager steps (single-step path) then a 97-step scan soak, so slow
        drift across psum/reduction orderings would surface, not just a
        3-step agreement."""
        root, _ = scene
        t1, _, _ = build_trainer(root, tmp_path / "a", iters=100)
        t2, _, _ = build_trainer(root, tmp_path / "b", mesh=make_mesh(), iters=100)
        for it in range(3):
            v1 = t1.train_one_iter(it)
            v2 = t2.train_one_iter(it)
        np.testing.assert_allclose(
            float(v1["TotalLoss"]), float(v2["TotalLoss"]), rtol=2e-4
        )
        # Tight oracle on the 3-step prefix: reduction-order drift is still
        # negligible here, so a systematic sharding error (wrong psum,
        # missing normalization) cannot hide under the soak tolerance below.
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(t1.params)),
            jax.tree_util.tree_leaves(jax.device_get(t2.params)),
        ):
            np.testing.assert_allclose(a, b, atol=2e-5)
        v1 = t1.train_many(3, 97)
        v2 = t2.train_many(3, 97)
        np.testing.assert_allclose(
            float(v1["TotalLoss"]), float(v2["TotalLoss"]), rtol=5e-4
        )
        # Tolerance calibrated to benign fp32 reduction-order drift after
        # 100 Adam steps at this config's (10x published) LR — measured
        # worst case |Δ| ≈ 1.1e-3 / rel 0.7% on single params; a systematic
        # sharding bug (wrong psum, missing normalization) is orders of
        # magnitude larger.
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(t1.params)),
            jax.tree_util.tree_leaves(jax.device_get(t2.params)),
        ):
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-3)


class TestMultiStep:
    def test_scan_steps_match_single_steps(self, scene, tmp_path):
        """K scanned steps produce the same params as K single steps."""
        root, _ = scene
        t1, _, _ = build_trainer(root, tmp_path / "a", iters=8)
        t2, _, _ = build_trainer(root, tmp_path / "b", iters=8)
        for it in range(4):
            t1.train_one_iter(it)
        t2.train_many(0, 4)
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(t1.params)),
            jax.tree_util.tree_leaves(jax.device_get(t2.params)),
        ):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_train_loop_with_steps_per_call(self, scene, tmp_path):
        root, _ = scene
        trainer, cfg, _ = build_trainer(root, tmp_path / "run", iters=60)
        trainer.steps_per_call = 25
        trainer.configs["log_interval"] = 50
        trainer.configs["model_save_interval"] = 30
        trainer.train()
        assert (tmp_path / "run/saved_models/Model_Iter000060.msgpack").exists()
        assert (tmp_path / "run/saved_models/Model_Iter000030.msgpack").exists()
