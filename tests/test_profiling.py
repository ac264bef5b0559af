"""Profiling subsystem: StepTimer stats and the trainer's trace window."""

import json
import time

import numpy as np

from simplenerf_tpu.utils import profiling


class TestStepTimer:
    def test_stats(self):
        t = profiling.StepTimer(rays_per_step=100)
        t.tick(0)
        for _ in range(5):
            time.sleep(0.002)
            t.tick()
        s = t.stats()
        assert s["step_ms_mean"] >= 2.0
        assert s["step_ms_p50"] <= s["step_ms_p90"] <= s["step_ms_max"]
        assert np.isclose(s["rays_per_s"], 100 * s["steps_per_s"], rtol=1e-6)

    def test_multi_step_tick(self):
        t = profiling.StepTimer()
        t.tick(0)
        time.sleep(0.004)
        dt = t.tick(steps=4)
        assert dt is not None and dt >= 0.0009
        assert len(t._samples) == 4

    def test_window_bound(self):
        t = profiling.StepTimer(window=8)
        t.tick(0)
        for _ in range(20):
            t.tick()
        assert len(t._samples) == 8

    def test_dump(self, tmp_path):
        t = profiling.StepTimer()
        t.tick(0)
        t.tick()
        t.dump(tmp_path / "timing.json")
        s = json.loads((tmp_path / "timing.json").read_text())
        assert "step_ms_mean" in s


class TestTrace:
    def test_trace_writes_and_is_reentrant_safe(self, tmp_path):
        # Nested/failed starts must not raise; outer capture produces files.
        with profiling.trace(tmp_path / "prof"):
            with profiling.trace(tmp_path / "prof2"):
                x = np.arange(8).sum()
        assert x == 28
        assert (tmp_path / "prof").exists()


class TestTrainerProfilingWindow:
    def test_trainer_emits_trace_and_timing(self, tmp_path):
        from simplenerf_tpu.data import get_data_loader
        from simplenerf_tpu.data.preprocessor import ScenePreprocessor
        from simplenerf_tpu.data.synthetic import generate_scene
        from simplenerf_tpu.drivers.presets import tiny_synthetic_config
        from simplenerf_tpu.training.trainer import Trainer

        synthetic_scene = tmp_path / "db"
        generate_scene(synthetic_scene, num_frames=4, h=16, w=24, num_train=3, seed=0)
        cfg = tiny_synthetic_config(
            num_rays=8, sparse_depth_rays=8, num_samples_coarse=4,
            num_samples_fine=8, num_iterations=6,
        )
        cfg["profiling"] = {"start_iter": 2, "num_iters": 2}
        cfg["log_interval"] = 3
        cfg["model_save_interval"] = 6
        raw = get_data_loader(cfg, synthetic_scene, "train").load_data()
        pp = ScenePreprocessor(cfg, "train", raw, seed=0)
        trainer = Trainer(cfg, tmp_path / "run", pp)
        trainer.train()
        assert (tmp_path / "run/profile").exists()
        timing = json.loads((tmp_path / "run/logs/step_timing.json").read_text())
        assert timing["steps_per_s"] > 0
