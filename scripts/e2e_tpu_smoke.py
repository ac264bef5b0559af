"""Real-TPU end-to-end smoke: drivers train -> test -> QA on a synthetic
scene at the bench shape (so train-step compiles hit the cache).

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

from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers import runner
from simplenerf_tpu.drivers.presets import simplenerf_config

root = Path("/tmp/e2e_db")
out = Path("/tmp/e2e_runs")
generate_scene(root, scene_name="blobs", num_frames=5, h=189, w=252, num_train=3, seed=0)

cfg = simplenerf_config(
    scene_id="blobs", num_iterations=1000, compute_dtype="bfloat16", seed=0
)
cfg["steps_per_call"] = 50
t0 = time.time()
runner.start_training(cfg, root, out)
t1 = time.time()
print(f"TRAIN OK in {t1 - t0:.1f}s", file=sys.stderr)

test_cfg = {"test_num": 1, "train_num": 1, "test_set_num": 2, "scene_names": None}
scores = runner.start_testing(test_cfg, root, out)
t2 = time.time()
print(f"TEST+QA OK in {t2 - t1:.1f}s", file=sys.stderr)
print(json.dumps(scores))
