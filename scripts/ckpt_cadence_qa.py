"""Checkpoint-cadence QA: score EVERY saved snapshot of an ablation-study
run, not just the final one.

VERDICT r2 item 1 asks whether checkpoint cadence masks the late-training
consistency spikes (the reference saves every 10k iterations,
src/NerfLlffTrainerTester01.py model_save_interval, and tests only the
final model). This renders the held-out frames and runs the full QA suite
for each Model_IterNNNN.msgpack of the given train run -> one table of
QA-vs-iteration, revealing how far the spike regime moves the headline
numbers between adjacent snapshots.

Run after the ablation study (chip otherwise idle):
  ABLATION_ROOT=/tmp/ablation_r3_100k CADENCE_TRAIN_NUM=11 nohup python -c \
      "exec(open('scripts/ckpt_cadence_qa.py').read())" \
      > /tmp/cadence_qa.log 2>&1 &
"""

import json
import os
import re
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from simplenerf_tpu.drivers import runner

ROOT = Path(os.environ.get("ABLATION_ROOT", "/tmp/ablation_r3_100k"))
DB = ROOT / "db"
OUT = ROOT / "runs"
TRAIN_NUM = int(os.environ.get("CADENCE_TRAIN_NUM", "11"))
SCENE = os.environ.get("CADENCE_SCENE", "blobs")
MASKS_DIRNAME = "VM02"
KEEP = ("PSNR", "SSIM", "DepthRMSE", "DepthMAE", "DepthSROCC", "MaskedDepthMAE")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


models_dir = OUT / f"training/train{TRAIN_NUM:04}/{SCENE}/saved_models"
snapshots = sorted(
    (int(m.group(1)), p.name)
    for p in models_dir.glob("Model_Iter*.msgpack")
    if (m := re.search(r"Iter(\d+)", p.name))
)
log(f"{len(snapshots)} snapshots in {models_dir}")

table = {}
for i, (iteration, name) in enumerate(snapshots):
    test_num = 900 + i
    test_cfg = {
        "test_num": test_num,
        "train_num": TRAIN_NUM,
        "test_set_num": 2,
        "scene_names": None,
        "qa_masks_dirname": MASKS_DIRNAME,
        "checkpoint_name": name,
    }
    t0 = time.time()
    scores = runner.start_testing(
        test_cfg, DB, OUT, gt_depth_dirpath=ROOT / "gt_depths"
    )
    table[iteration] = {k: scores[k] for k in KEEP if k in scores}
    log(f"iter {iteration}: {json.dumps(table[iteration])} ({time.time()-t0:.0f}s)")

(ROOT / "cadence_qa.json").write_text(json.dumps(table, indent=2))
log("DONE")
print(json.dumps(table, indent=2))
