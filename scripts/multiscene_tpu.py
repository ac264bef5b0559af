"""Multi-scene end-to-end on the real TPU: the driver's scene loop + the
scene-wise QA roll-up, both arms (full SimpleNeRF vs DS-NeRF-style ablation).

The reference publishes multi-scene averages (8 LLFF / 5 RealEstate scenes
rolled up by src/qa/00_Common/src/SceneWiseGrouper.py:17-33). This script
builds a database of THREE distinct textured synthetic scenes (different
blob fields / textures per seed), trains every scene via the driver's scene
loop (drivers/runner.py:58), renders the held-out frames, and runs the full
QA suite once over all scenes -> one QA_Scores.json whose per-scene rows
live in QA_Scores/<Metric>_SceneWise.csv and whose headline numbers are the
all-frame averages.

Run in the background (foreground shells cap at 10 min):
  MULTISCENE_ITERS=2000 nohup python -c \
      "exec(open('scripts/multiscene_tpu.py').read())" \
      > /tmp/multiscene_r3.log 2>&1 &
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import pandas as pd

from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers import runner
from simplenerf_tpu.drivers.presets import simplenerf_config
from simplenerf_tpu.qa.masks import generate_visibility_masks

ROOT = Path(os.environ.get("MULTISCENE_ROOT", "/tmp/multiscene_r3"))
DB = ROOT / "db"
OUT = ROOT / "runs"
ITERS = int(os.environ.get("MULTISCENE_ITERS", "2000"))
RAMP = int(os.environ.get("MULTISCENE_RAMP", str(ITERS // 10)))
DTYPE = os.environ.get("MULTISCENE_DTYPE", "float32")
# Sparse-prior regime (VERDICT r4 directive 5): "uniform" = GT-oracle,
# "colmap" = COLMAP-realistic statistics (data/synthetic._colmap_like_sparse).
SPARSE_MODE = os.environ.get("MULTISCENE_SPARSE_MODE", "uniform")
SPARSE_POINTS = int(os.environ.get("MULTISCENE_SPARSE_POINTS", "96"))
PX_SIGMA = float(os.environ.get("MULTISCENE_PX_SIGMA", "1.0"))
OUTLIER_FRAC = float(os.environ.get("MULTISCENE_OUTLIER_FRAC", "0.05"))
SCENES = ["blobs_a", "blobs_b", "blobs_c"]
SEEDS = {"blobs_a": 0, "blobs_b": 21, "blobs_c": 42}
MASKS_DIRNAME = "VM02"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


ROOT.mkdir(parents=True, exist_ok=True)
gts = {}
for scene in SCENES:
    gts[scene] = generate_scene(
        DB, scene_name=scene, num_frames=5, h=189, w=252, num_train=3,
        seed=SEEDS[scene], textured=True,
        sparse_mode=SPARSE_MODE, sparse_points_per_frame=SPARSE_POINTS,
        sparse_px_sigma=PX_SIGMA, sparse_outlier_frac=OUTLIER_FRAC,
    )
    gt = gts[scene]
    gt_depth_dir = ROOT / f"gt_depths/{scene}"
    gt_depth_dir.mkdir(parents=True, exist_ok=True)
    for i in range(len(gt["depths"])):
        np.save(gt_depth_dir / f"{i:04}.npy", gt["depths"][i].astype(np.float32))

    def frame_info(i):
        return {
            "frame": np.round(gt["images"][i] * 255).astype(np.uint8),
            "depth": gt["depths"][i],
            "extrinsic": gt["extrinsics"][i],
            "intrinsic": gt["intrinsic"],
        }

    train_f = {int(i): frame_info(int(i)) for i in gt["train_frames"]}
    test_f = {int(i): frame_info(int(i)) for i in gt["test_frames"]}
    generate_visibility_masks(
        DB / f"all/visibility_masks/{MASKS_DIRNAME}", scene, train_f, test_f
    )
    log(f"scene {scene} ready")

summary = {"iters": ITERS, "ramp": RAMP, "dtype": DTYPE, "scenes": SCENES,
           "sparse_mode": SPARSE_MODE, "sparse_points_per_frame": SPARSE_POINTS,
           "sparse_px_sigma": PX_SIGMA, "sparse_outlier_frac": OUTLIER_FRAC}
ARMS = os.environ.get("MULTISCENE_ARMS", "full,ablation").split(",")

for tag, train_num, with_aug in (("full", 21, True), ("ablation", 22, False)):
    if tag not in ARMS:
        continue
    if (ROOT / f"QA_Scores_{tag}.json").exists():
        log(f"{tag}: QA_Scores_{tag}.json already present, skipping arm")
        continue
    cfg = simplenerf_config(
        num_iterations=ITERS,
        consistency_start_iter=RAMP,
        compute_dtype=DTYPE,
        seed=0,
        with_augmentations=with_aug,
    )
    cfg["train_num"] = train_num
    cfg["steps_per_call"] = 50
    cfg["log_interval"] = 500
    # No scene_names override: the driver resolves all 3 scenes from the
    # accumulated split CSV and loops them.
    t0 = time.time()
    runner.start_training(cfg, DB, OUT)
    t1 = time.time()
    log(f"{tag}: trained {len(SCENES)} scenes x {ITERS} iters in {t1 - t0:.0f}s")

    test_cfg = {
        "test_num": train_num,
        "train_num": train_num,
        "test_set_num": 2,
        "scene_names": None,
        "qa_masks_dirname": MASKS_DIRNAME,
    }
    scores = runner.start_testing(test_cfg, DB, OUT, gt_depth_dirpath=ROOT / "gt_depths")
    t2 = time.time()
    log(f"{tag}: test+QA in {t2 - t1:.0f}s -> {json.dumps(scores)}")
    test_dir = OUT / f"testing/test{train_num:04}"
    scene_wise = {}
    for csv in sorted((test_dir / "QA_Scores").glob("*_SceneWise.csv")):
        df = pd.read_csv(csv)
        scene_wise[csv.stem.replace("_SceneWise", "")] = {
            str(r[0]): float(r[1]) for r in df.itertuples(index=False)
        }
    summary[tag] = {
        "train_s": round(t1 - t0, 1),
        "qa": scores,
        "scene_wise": scene_wise,
    }
    (ROOT / f"QA_Scores_{tag}.json").write_text((test_dir / "QA_Scores.json").read_text())

(ROOT / "summary.json").write_text(json.dumps(summary, indent=2))
log("DONE")
print(json.dumps(summary, indent=2))
