"""RealEstate10K-layout end-to-end smoke on the real TPU (VERDICT r4 #6).

Generates a synthetic scene in the RE10K on-disk layout (5-digit scene dir
under test/database_data, fixed [1,100] bounds, suffix-free rgb/intrinsics,
the reference's sparse split recipe — TrainTestCreator01.py:40-50), then
drives drivers/realestate.build_configs -> train -> test -> QA end-to-end
through the RealEstate driver's own config path.

Shapes are chosen to REUSE the chip's compiled program set (189x252 scene,
3 train views, 4096-ray f32 full recipe = the studies-8 programs), so the
smoke costs minutes, not a 30-minute remote compile.

Run from the repo root:
  nohup python -c "exec(open('scripts/re_smoke_tpu.py').read())" \
      > /root/repo/.studies/re_smoke/run.log 2>&1 &
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from simplenerf_tpu.data.synthetic import generate_realestate_scene
from simplenerf_tpu.drivers import realestate, runner
from simplenerf_tpu.qa.masks import generate_visibility_masks

ROOT = Path(os.environ.get("RE_SMOKE_ROOT", "/root/repo/.studies/re_smoke"))
DB = ROOT / "db"
OUT = ROOT / "runs"
ITERS = int(os.environ.get("RE_SMOKE_ITERS", "2000"))
EVIDENCE = Path("/root/repo/docs/evidence/re_smoke_r5")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


ROOT.mkdir(parents=True, exist_ok=True)
gt = generate_realestate_scene(
    DB, scene_num=0, num_frames=20, h=189, w=252, num_train=3, seed=5,
    textured=True, sparse_mode="colmap", sparse_points_per_frame=32,
    max_test_frames=3,
)
log(f"RE10K-layout scene ready (train={list(gt['train_frames'])}, "
    f"test={list(gt['test_frames'])})")

# GT depths + visibility masks (RE layout: under test/) for the full QA set.
gt_depth_dir = ROOT / "gt_depths/00000"
gt_depth_dir.mkdir(parents=True, exist_ok=True)
for f in gt["test_frames"]:
    np.save(gt_depth_dir / f"{f:04}.npy", gt["depths"][f].astype(np.float32))


def frame_info(i):
    return {
        "frame": np.round(gt["images"][i] * 255).astype(np.uint8),
        "depth": gt["depths"][i],
        "extrinsic": gt["extrinsics"][i],
        "intrinsic": gt["intrinsic"],
    }


train_f = {int(i): frame_info(int(i)) for i in gt["train_frames"]}
test_f = {int(i): frame_info(int(i)) for i in gt["test_frames"]}
generate_visibility_masks(DB / "test/visibility_masks/VM02", "00000", train_f, test_f)

# The RealEstate driver's OWN config path (3-view set -> run 0021).
train_configs, test_configs = realestate.build_configs(
    views=3, scenes=[0], iters=ITERS, compute_dtype="float32", seed=0
)
train_configs["steps_per_call"] = 50
train_configs["log_interval"] = 200
train_configs["model_save_interval"] = ITERS

t0 = time.time()
runner.start_training(train_configs, DB, OUT)
t1 = time.time()
log(f"trained {ITERS} iters in {t1 - t0:.0f}s")
scores = runner.start_testing(
    test_configs, DB, OUT, gt_depth_dirpath=ROOT / "gt_depths"
)
log(f"test+QA in {time.time() - t1:.0f}s -> {json.dumps(scores)}")

run_num = train_configs["train_num"]
qa_json = OUT / f"testing/test{run_num:04}/QA_Scores.json"
EVIDENCE.mkdir(parents=True, exist_ok=True)
(EVIDENCE / "QA_Scores.json").write_text(qa_json.read_text())
summary = {"iters": ITERS, "views": 3, "scene_layout": "RealEstate10K",
           "train_s": round(t1 - t0, 1), "qa": scores}
(ROOT / "summary.json").write_text(json.dumps(summary, indent=2))
(EVIDENCE / "summary.json").write_text(json.dumps(summary, indent=2))
log("DONE")
print(json.dumps(summary, indent=2))
