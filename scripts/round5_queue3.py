"""Round-5 chip queue, part 3: post-reboot relaunch of the queue2 stages.

The box rebooted mid-round (11:48 UTC), wiping the untracked `.studies/`
tree before queue2 ever ran, and the session restarted with an unknown
remaining wall budget. This queue is therefore ordered to degrade
gracefully under deadline uncertainty:

  short, cached, verdict-closing stages FIRST (bench_clip, re_smoke),
  then the deciding long experiment (clip100k), then the rest of the
  queue2 list (colmap4v, sensitivity cells, arb/huber screens,
  multiscene).

Every stage still skips when its summary exists, so relaunching this same
script with a later ROUND5_DEADLINE_EPOCH continues where it left off —
that is the intended phase-2 move once the round's true horizon is known.

Launch:
  ROUND5_DEADLINE_EPOCH=<epoch> \
  python scripts/tpu_watchdog.py --log /root/repo/.studies/r5queue3.log \
      --watch /root/repo/.studies \
      -- python -c "exec(open('scripts/round5_queue3.py').read())"
"""

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

DEADLINE = float(os.environ.get("ROUND5_DEADLINE_EPOCH", "1787317700"))
STUDY_SRC = open("scripts/ablation_study_tpu.py").read()
Path("/root/repo/.studies").mkdir(exist_ok=True)


def qlog(msg):
    print(f"[queue3 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def remaining():
    return DEADLINE - time.time()


def run_study(name, est_s, env):
    root = Path(env["ABLATION_ROOT"])
    summary = root / "summary.json"
    if summary.exists():
        try:
            d = json.loads(summary.read_text())
            if all(a in d and "qa" in d[a] for a in env["ABLATION_ARMS"].split(",")):
                qlog(f"{name}: already complete, skipping")
                return
        except json.JSONDecodeError:
            pass
    if remaining() < est_s:
        qlog(f"{name}: {remaining():.0f}s left < est {est_s}s — skipping (deadline)")
        return
    qlog(f"{name}: starting (est {est_s}s, {remaining():.0f}s left)")
    os.environ.update(env)
    t0 = time.time()
    exec(compile(STUDY_SRC, f"ablation_study_tpu.py[{name}]", "exec"), {"__name__": "__main__"})
    qlog(f"{name}: done in {time.time() - t0:.0f}s")


COLMAP_100K = {
    "ABLATION_ITERS": "100000", "ABLATION_RAMP": "10000",
    "ABLATION_TRAIN_VIEWS": "3", "ABLATION_DTYPE": "float32",
    "ABLATION_SPARSE_MODE": "colmap", "ABLATION_SPARSE_POINTS": "32",
    "ABLATION_SPARSE_NOISE": "0.02", "ABLATION_PX_SIGMA": "1.0",
    "ABLATION_OUTLIER_FRAC": "0.05", "ABLATION_ARMS": "full",
    "ABLATION_DEPTH_CLIP": "", "ABLATION_DEPTH_HUBER": "",
    "ABLATION_DEPTH_ARB_CLIP": "",
    "ABLATION_SAVE_INTERVAL": "10000", "ABLATION_LOG_INTERVAL": "100",
}
COLMAP_F32_20K = dict(COLMAP_100K, ABLATION_ITERS="20000", ABLATION_RAMP="2000",
                      ABLATION_ARMS="full,ablation")
BF16_SCREEN = {
    "ABLATION_ITERS": "20000", "ABLATION_RAMP": "2000",
    "ABLATION_TRAIN_VIEWS": "3", "ABLATION_DTYPE": "bfloat16",
    "ABLATION_SPARSE_MODE": "uniform", "ABLATION_SPARSE_POINTS": "96",
    "ABLATION_SPARSE_NOISE": "0.02", "ABLATION_PX_SIGMA": "1.0",
    "ABLATION_OUTLIER_FRAC": "0.05", "ABLATION_ARMS": "full",
    "ABLATION_DEPTH_CLIP": "", "ABLATION_DEPTH_HUBER": "",
    "ABLATION_DEPTH_ARB_CLIP": "",
    "ABLATION_SAVE_INTERVAL": "10000", "ABLATION_LOG_INTERVAL": "100",
}

# --- stage 1: bench baseline vs depth_clip=2 (directive 8; cached) --------
bench_out = Path("/root/repo/.studies/bench_clip_r5.json")
if bench_out.exists():
    qlog("bench_clip: already complete, skipping")
elif remaining() < 1100:
    qlog("bench_clip: skipped (deadline)")
else:
    import bench as bench_mod

    results = {}
    for tag, clip in (("baseline", ""), ("depth_clip_2", "2.0")):
        os.environ["BENCH_DEPTH_CLIP"] = clip
        buf = io.StringIO()
        t0 = time.time()
        with redirect_stdout(buf):
            bench_mod.main()
        line = [l for l in buf.getvalue().splitlines() if l.strip().startswith("{")][-1]
        results[tag] = json.loads(line)
        qlog(f"bench_clip[{tag}]: {line} ({time.time() - t0:.0f}s)")
    os.environ["BENCH_DEPTH_CLIP"] = ""
    bench_out.write_text(json.dumps(results, indent=2))

# --- stage 2: RE10K smoke (directive 6; warm programs) --------------------
if (Path("/root/repo/.studies/re_smoke/summary.json")).exists():
    qlog("re_smoke: already complete, skipping")
elif remaining() < 1200:
    qlog("re_smoke: skipped (deadline)")
else:
    qlog("re_smoke: starting")
    t0 = time.time()
    exec(compile(open("scripts/re_smoke_tpu.py").read(), "re_smoke_tpu.py", "exec"),
         {"__name__": "__main__"})
    qlog(f"re_smoke: done in {time.time() - t0:.0f}s")

# --- stage 3: the stabilized third arm at the published schedule ----------
# (study-10 measured ~80 min/arm at 100k with warm programs)
run_study("clip100k", 5400, dict(
    COLMAP_100K, ABLATION_ROOT="/root/repo/.studies/colmap100k_clip",
    ABLATION_DEPTH_CLIP="2.0"))

# --- stage 4: 4-view realistic A/B (novel programs) -----------------------
run_study("colmap4v", 5800, dict(
    COLMAP_F32_20K, ABLATION_ROOT="/root/repo/.studies/colmap4v",
    ABLATION_TRAIN_VIEWS="4"))

# --- stage 5: prior-statistics sensitivity cells (warm f32 programs) ------
run_study("sens_kp16", 3300, dict(
    COLMAP_F32_20K, ABLATION_ROOT="/root/repo/.studies/sens_kp16",
    ABLATION_SPARSE_POINTS="16"))
run_study("sens_kp64", 3300, dict(
    COLMAP_F32_20K, ABLATION_ROOT="/root/repo/.studies/sens_kp64",
    ABLATION_SPARSE_POINTS="64"))
run_study("sens_out0", 3300, dict(
    COLMAP_F32_20K, ABLATION_ROOT="/root/repo/.studies/sens_out0",
    ABLATION_OUTLIER_FRAC="0.0"))
run_study("sens_out10", 3300, dict(
    COLMAP_F32_20K, ABLATION_ROOT="/root/repo/.studies/sens_out10",
    ABLATION_OUTLIER_FRAC="0.10"))

# --- stage 6: arbitration-only clamp screen (novel program) ---------------
run_study("arb_bf16_20k", 4200, dict(
    BF16_SCREEN, ABLATION_ROOT="/root/repo/.studies/arb_bf16_20k",
    ABLATION_DEPTH_ARB_CLIP="2.0"))

# --- stage 7: Huber delta=0.5 screen (novel program) ----------------------
run_study("huber05_bf16_20k", 4200, dict(
    BF16_SCREEN, ABLATION_ROOT="/root/repo/.studies/huber05_bf16_20k",
    ABLATION_DEPTH_HUBER="0.5"))

# --- stage 8: multi-scene colmap A/B (warm) -------------------------------
ms_root = Path("/root/repo/.studies/multiscene_colmap")
if (ms_root / "summary.json").exists():
    qlog("multiscene: already complete, skipping")
elif remaining() < 9500:
    qlog(f"multiscene: skipped (deadline, {remaining():.0f}s left)")
else:
    qlog("multiscene: starting")
    os.environ.update({
        "MULTISCENE_ROOT": str(ms_root), "MULTISCENE_ITERS": "20000",
        "MULTISCENE_RAMP": "2000", "MULTISCENE_DTYPE": "float32",
        "MULTISCENE_SPARSE_MODE": "colmap", "MULTISCENE_SPARSE_POINTS": "32",
        "MULTISCENE_PX_SIGMA": "1.0", "MULTISCENE_OUTLIER_FRAC": "0.05",
    })
    t0 = time.time()
    exec(compile(open("scripts/multiscene_tpu.py").read(), "multiscene_tpu.py", "exec"),
         {"__name__": "__main__"})
    qlog(f"multiscene: done in {time.time() - t0:.0f}s")

qlog("QUEUE3 DONE")
