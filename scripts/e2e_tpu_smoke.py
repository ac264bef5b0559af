"""Real-TPU end-to-end smoke: drivers train -> test -> QA -> spiral +
static-camera videos on a synthetic scene at the bench shape (so train-step
compiles hit the cache). Covers every driver stage the reference runs
(NerfLlffTrainerTester01.py:120-229).

Run from the repo root: `python -c "exec(open('scripts/e2e_tpu_smoke.py').read())"`
(or `python scripts/e2e_tpu_smoke.py` with the repo on PYTHONPATH via cwd).
Last measured (one v5e chip, warm compile cache): 1000 iters trained in
173 s, test + QA 42 s, held-out PSNR 40.4 dB / SSIM 0.984."""
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.dataset_tools import video_poses
from simplenerf_tpu.drivers import runner
from simplenerf_tpu.drivers.presets import simplenerf_config

root = Path("/tmp/e2e_db")
out = Path("/tmp/e2e_runs")
gt = generate_scene(root, scene_name="blobs", num_frames=5, h=189, w=252, num_train=3, seed=0)

cfg = simplenerf_config(
    scene_id="blobs", num_iterations=1000, compute_dtype="bfloat16", seed=0
)
cfg["steps_per_call"] = 50
t0 = time.time()
run_dir = runner.start_training(cfg, root, out)
t1 = time.time()
print(f"TRAIN OK in {t1 - t0:.1f}s", file=sys.stderr)

test_cfg = {"test_num": 1, "train_num": 1, "test_set_num": 2, "scene_names": None}
scores = runner.start_testing(test_cfg, root, out)
t2 = time.time()
print(f"TEST+QA OK in {t2 - t1:.1f}s", file=sys.stderr)

# Videos: spiral poses from the train cameras, then the pose-path video and
# the static-camera (fixed rays, swept shading view) video.
mc = json.loads((run_dir / "blobs/ModelConfigs.json").read_text())
extr = gt["extrinsics"][gt["train_frames"]]
bounds = np.array(mc["bounds"]) / mc["translation_scale"]
poses = video_poses.create_spiral_video_poses(extr, bounds, num_frames=30)
video_poses.save_video_poses(root, "blobs", poses)
runner.start_testing_videos(test_cfg, root, out)
runner.start_testing_videos(test_cfg, root, out, static_camera=True)
t3 = time.time()
test_dir = out / "testing/test0001/blobs"
for name in ("PredictedVideo", "StaticCameraVideo"):
    ok = (test_dir / f"{name}.mp4").exists() or any((test_dir / name).glob("*.png"))
    assert ok, f"{name} missing"
print(f"VIDEOS OK in {t3 - t2:.1f}s", file=sys.stderr)
print(json.dumps(scores))
