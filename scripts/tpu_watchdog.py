"""Progress watchdog for long chip runs: launch, monitor, kill-and-resume.

Productizes the round-3 operational pattern (CLAUDE.md): relay-attached TPU
clients occasionally hang (client futex-wait, scalars stop advancing, ~2x/day
observed) and the remote TPU host sometimes restarts mid-run. Training runs
survive both via checkpoint resume (Trainer resumes from Model_Latest and
fast-forwards the batch samplers, so a restarted run is bit-identical to an
uninterrupted one) — but only if something notices the hang, kills the EXACT
process group (never pattern-kills), verifies the chip is healthy again, and
relaunches. This script is that something.

Usage (from the repo root; the child inherits cwd and env):

  python scripts/tpu_watchdog.py --log /path/run.log [options] -- CMD [ARGS...]

  --log PATH          child stdout+stderr appended here; its growth counts
                      as progress.
  --watch PATH        extra progress signals: a file or a directory TREE
                      whose newest mtime counts as progress. Pass the run
                      output dir here — trainers log scalars/checkpoints to
                      files, not stdout, so the child log alone goes quiet
                      during healthy training (repeatable; the first clip-100k
                      launch was spuriously killed at 45 min for exactly this).
                      May be given multiple times; paths may not exist yet.
  --stall-secs N      no-progress window before the child is declared hung
                      (default 2700 — cold remote compiles take up to ~35 min,
                      a shorter window would kill a healthy compile).
  --max-restarts N    give up after N kill/relaunch cycles (default 12).
  --probe / --no-probe  chip-health probe (90 s-timeout 256x256 matmul + host
                      read) before each (re)launch; waits until the chip
                      answers, up to --probe-tries x --probe-wait.

Exit code: the child's final exit code (0 on success), 3 if restarts were
exhausted, 4 if the chip never came back.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

PROBE_SRC = r"""
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
y = jax.jit(lambda a: a @ a)(x)
assert float(np.asarray(y)[0, 0]) == 256.0
print("PROBE_OK", flush=True)
"""


def log(msg: str):
    print(f"[watchdog {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def probe_chip(timeout_s: int = 90) -> bool:
    """One 256x256 matmul + host read under a hard timeout. The host read is
    the real synchronization point (block_until_ready does not block on the
    relay backend)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return r.returncode == 0 and "PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_chip(tries: int, wait_s: int, probe_timeout: int) -> bool:
    for i in range(tries):
        if probe_chip(probe_timeout):
            log(f"chip healthy (probe {i + 1}/{tries})")
            return True
        log(f"chip probe failed ({i + 1}/{tries}); sleeping {wait_s}s")
        time.sleep(wait_s)
    return False


def progress_stamp(log_path: Path, watch: list[str]) -> tuple:
    """Opaque progress token: (log size, newest mtime across watch trees).
    Any change between polls counts as progress."""
    size = log_path.stat().st_size if log_path.exists() else 0
    newest = 0.0
    for w in watch:
        p = Path(w)
        if p.is_file():
            newest = max(newest, p.stat().st_mtime)
        elif p.is_dir():
            for root, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        newest = max(newest, os.path.getmtime(os.path.join(root, f)))
                    except OSError:
                        continue
    return (size, newest)


def kill_group(proc: subprocess.Popen):
    """SIGTERM then SIGKILL the child's own process group — by pgid, never by
    pattern, so nothing outside this launch can be hit."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, grace in ((signal.SIGTERM, 10), (signal.SIGKILL, 5)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        try:
            proc.wait(timeout=grace)
            return
        except subprocess.TimeoutExpired:
            continue


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--log", required=True)
    ap.add_argument("--watch", action="append", default=[])
    ap.add_argument("--stall-secs", type=int, default=2700)
    ap.add_argument("--poll-secs", type=int, default=30)
    ap.add_argument("--max-restarts", type=int, default=12)
    ap.add_argument("--probe", dest="probe", action="store_true", default=True)
    ap.add_argument("--no-probe", dest="probe", action="store_false")
    ap.add_argument("--probe-tries", type=int, default=40)
    ap.add_argument("--probe-wait", type=int, default=60)
    ap.add_argument("--probe-timeout", type=int, default=90)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- CMD [ARGS...] to launch and babysit")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no child command given (pass it after --)")

    log_path = Path(args.log)
    log_path.parent.mkdir(parents=True, exist_ok=True)

    restarts = 0
    while True:
        if args.probe and not wait_for_chip(args.probe_tries, args.probe_wait,
                                            args.probe_timeout):
            log("chip never came back; giving up")
            return 4
        with open(log_path, "ab") as lf:
            lf.write(f"\n=== watchdog launch {restarts} @ {time.ctime()} ===\n".encode())
            lf.flush()
            proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                    start_new_session=True)
        log(f"launched pid={proc.pid} (attempt {restarts + 1}): {' '.join(cmd)}")
        last_stamp = None
        last_progress = time.time()
        stalled = False
        while True:
            try:
                rc = proc.wait(timeout=args.poll_secs)
                break
            except subprocess.TimeoutExpired:
                pass
            stamp = progress_stamp(log_path, args.watch)
            if stamp != last_stamp:
                last_stamp = stamp
                last_progress = time.time()
            elif time.time() - last_progress > args.stall_secs:
                log(f"no progress for {args.stall_secs}s — killing pid {proc.pid}")
                kill_group(proc)
                stalled = True
                rc = None
                break
        if not stalled and rc == 0:
            log("child finished ok")
            return 0
        if not stalled:
            log(f"child exited rc={rc}")
        restarts += 1
        if restarts > args.max_restarts:
            log("restart budget exhausted; giving up")
            return 3
        log(f"relaunching (restart {restarts}/{args.max_restarts})")


if __name__ == "__main__":
    sys.exit(main())
