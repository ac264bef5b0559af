"""Round-5 chip queue, part 2: code-dependent studies after the 100k A/B.

Same single-process rationale as round5_queue.py (one ~9-min chip handoff
for the whole batch). Stages, in VERDICT-r4 priority order:

  1. re_smoke      — RE10K-layout e2e smoke through the RealEstate driver
                     (directive 6; warm studies-8 program set).
  2. bench_clip    — bench.py bf16 workload, baseline vs depth_clip=2
                     (directive 8; both programs cached).
  3. arb_bf16_20k  — stability screen: arbitration-only clamp at 2x far,
                     bf16 20k full arm, study-7 protocol (directive 2;
                     novel program, ~30 min remote compile).
  4. sens_*        — prior-statistics sensitivity cells (directive 4),
                     f32 colmap 3-view 20k A/B at keypoints {16, 64} and
                     outlier fraction {0, 0.10}; all programs warm.
  5. huber05       — second stability candidate: Huber delta = 0.5x far,
                     bf16 20k full arm (directive 2; novel program).
  6. multiscene    — 3-scene colmap-prior A/B at 20k (directive 5; warm).

Each stage is skipped when its summary file already exists, so a watchdog
relaunch resumes mid-queue; stages also skip when the ROUND5_DEADLINE_EPOCH
budget cannot cover their estimated cost (the driver needs the chip back
for the end-of-round bench).

Launch:
  ROUND5_DEADLINE_EPOCH=<epoch> python scripts/tpu_watchdog.py \
      --log /root/repo/.studies/r5queue2.log --watch /root/repo/.studies \
      -- python -c "exec(open('scripts/round5_queue2.py').read())"
"""

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

DEADLINE = float(os.environ.get("ROUND5_DEADLINE_EPOCH", time.time() + 4 * 3600))
STUDY_SRC = open("scripts/ablation_study_tpu.py").read()


def qlog(msg):
    print(f"[queue2 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


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


# --- stage 1: RE10K smoke -------------------------------------------------
if (Path("/root/repo/.studies/re_smoke/summary.json")).exists():
    qlog("re_smoke: already complete, skipping")
elif remaining() < 1500:
    qlog("re_smoke: skipped (deadline)")
else:
    qlog("re_smoke: starting")
    t0 = time.time()
    exec(compile(open("scripts/re_smoke_tpu.py").read(), "re_smoke_tpu.py", "exec"),
         {"__name__": "__main__"})
    qlog(f"re_smoke: done in {time.time() - t0:.0f}s")

# --- stage 2: bench baseline vs depth_clip=2 ------------------------------
bench_out = Path("/root/repo/.studies/bench_clip_r5.json")
if bench_out.exists():
    qlog("bench_clip: already complete, skipping")
elif remaining() < 1200:
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

# --- shared env bases -----------------------------------------------------
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
COLMAP_F32 = {
    "ABLATION_ITERS": "20000", "ABLATION_RAMP": "2000",
    "ABLATION_TRAIN_VIEWS": "3", "ABLATION_DTYPE": "float32",
    "ABLATION_SPARSE_MODE": "colmap", "ABLATION_SPARSE_POINTS": "32",
    "ABLATION_SPARSE_NOISE": "0.02", "ABLATION_PX_SIGMA": "1.0",
    "ABLATION_OUTLIER_FRAC": "0.05", "ABLATION_ARMS": "full,ablation",
    "ABLATION_DEPTH_CLIP": "", "ABLATION_DEPTH_HUBER": "",
    "ABLATION_DEPTH_ARB_CLIP": "",
    "ABLATION_SAVE_INTERVAL": "10000", "ABLATION_LOG_INTERVAL": "100",
}

# --- stage 3: arbitration-only clamp screen (novel program) ---------------
run_study("arb_bf16_20k", 4200, dict(
    BF16_SCREEN, ABLATION_ROOT="/root/repo/.studies/arb_bf16_20k",
    ABLATION_DEPTH_ARB_CLIP="2.0"))

# --- stage 4: prior-statistics sensitivity cells (warm f32 programs) ------
run_study("sens_kp16", 3300, dict(
    COLMAP_F32, ABLATION_ROOT="/root/repo/.studies/sens_kp16",
    ABLATION_SPARSE_POINTS="16"))
run_study("sens_kp64", 3300, dict(
    COLMAP_F32, ABLATION_ROOT="/root/repo/.studies/sens_kp64",
    ABLATION_SPARSE_POINTS="64"))
run_study("sens_out0", 3300, dict(
    COLMAP_F32, ABLATION_ROOT="/root/repo/.studies/sens_out0",
    ABLATION_OUTLIER_FRAC="0.0"))
run_study("sens_out10", 3300, dict(
    COLMAP_F32, ABLATION_ROOT="/root/repo/.studies/sens_out10",
    ABLATION_OUTLIER_FRAC="0.10"))

# --- stage 5: Huber delta=0.5 screen (novel program) ----------------------
run_study("huber05_bf16_20k", 4200, dict(
    BF16_SCREEN, ABLATION_ROOT="/root/repo/.studies/huber05_bf16_20k",
    ABLATION_DEPTH_HUBER="0.5"))

# --- stage 6: multi-scene colmap A/B (warm) -------------------------------
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

qlog("QUEUE2 DONE")
