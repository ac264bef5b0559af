"""Round-5 chip queue: run multiple studies in ONE process, in priority order.

Rationale (CLAUDE.md round-4 lesson 4): after any process that held the chip
exits, the next client is refused for ~8-9 minutes. Sequencing the round's
chip studies inside a single process pays that cost once instead of per
study. Each stage exec's scripts/ablation_study_tpu.py with its own env and
a fresh globals dict; stages whose summary.json already contains every
requested arm are skipped, so a watchdog kill-and-relaunch resumes mid-queue
(and mid-training, via the Trainer's checkpoint resume).

Stages (VERDICT r4 directives 1 and 3):
  1. colmap100k — the COLMAP-realistic prior A/B at the published 100k
     schedule (f32, ramp 10k = {0:0, 10000:0.1}, 3 views): the one empty
     cell of the schedule x regime matrix, the cell the reference's
     headline occupies (reference src/NerfLlffTrainerTester01.py:438,
     351-428; prior statistics modeled on
     src/prior_generators/sparse_depth/Tester01.py:232-289).
  2. colmap4v — the 4-view COLMAP-realistic A/B at the 20k screen schedule
     (study-8 protocol), completing the reference's published 2/3/4-view
     trend (demo1c, NerfLlffTrainerTester01.py:703-935).

Launch from the repo root under the watchdog:
  nohup python scripts/tpu_watchdog.py --log /root/repo/.studies/r5queue.log \
      --watch /root/repo/.studies/colmap100k --watch /root/repo/.studies/colmap4v \
      -- python -c "exec(open('scripts/round5_queue.py').read())" \
      > /root/repo/.studies/r5queue.watchdog.log 2>&1 &
"""

import json
import os
import sys
import time
from pathlib import Path

STUDY_SRC = open("scripts/ablation_study_tpu.py").read()

# Shared COLMAP-realistic prior knobs — the studies 8/8b operating point.
COLMAP = {
    "ABLATION_SPARSE_MODE": "colmap",
    "ABLATION_SPARSE_POINTS": "32",
    "ABLATION_SPARSE_NOISE": "0.02",
    "ABLATION_PX_SIGMA": "1.0",
    "ABLATION_OUTLIER_FRAC": "0.05",
    "ABLATION_DTYPE": "float32",
    "ABLATION_DEPTH_CLIP": "",
    "ABLATION_DEPTH_HUBER": "",
    "ABLATION_ARMS": "full,ablation",
    "ABLATION_SAVE_INTERVAL": "10000",
    "ABLATION_LOG_INTERVAL": "100",
}

STAGES = [
    ("colmap100k", dict(COLMAP, ABLATION_ROOT="/root/repo/.studies/colmap100k",
                        ABLATION_ITERS="100000", ABLATION_RAMP="10000",
                        ABLATION_TRAIN_VIEWS="3")),
    ("colmap4v", dict(COLMAP, ABLATION_ROOT="/root/repo/.studies/colmap4v",
                      ABLATION_ITERS="20000", ABLATION_RAMP="2000",
                      ABLATION_TRAIN_VIEWS="4")),
]


def qlog(msg):
    print(f"[queue {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def stage_done(env) -> bool:
    summary = Path(env["ABLATION_ROOT"]) / "summary.json"
    if not summary.exists():
        return False
    try:
        d = json.loads(summary.read_text())
    except json.JSONDecodeError:
        return False
    return all(arm in d and "qa" in d[arm] for arm in env["ABLATION_ARMS"].split(","))


for name, env in STAGES:
    if stage_done(env):
        qlog(f"stage {name}: already complete, skipping")
        continue
    qlog(f"stage {name}: starting")
    os.environ.update(env)
    t0 = time.time()
    exec(compile(STUDY_SRC, f"ablation_study_tpu.py[{name}]", "exec"), {"__name__": "__main__"})
    qlog(f"stage {name}: done in {time.time() - t0:.0f}s")

qlog("QUEUE DONE")
