"""Unit tests for scripts/tpu_watchdog.py with fake child processes.

The watchdog is load-bearing operational infrastructure (it shepherds every
long chip run; see CLAUDE.md round-3/4 lessons), so its host-side logic —
progress stamps, stall detection, exact-pgid kill, restart budget, the
--watch tree signal — is pinned here against a regression that would
otherwise cost a night of chip time. All children are tiny `python -c`
scripts; no JAX, no chip, no pattern kills.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "tpu_watchdog", Path(__file__).resolve().parents[1] / "scripts/tpu_watchdog.py"
)
watchdog = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(watchdog)


def run_main(*args: str) -> int:
    return watchdog.main(list(args))


def alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False


def wait_dead(pid: int, timeout: float = 10.0) -> bool:
    """A SIGKILLed child of a *different* process group is reparented to
    init and reaped there; poll briefly for the zombie window to close."""
    end = time.time() + timeout
    while time.time() < end:
        if not alive(pid):
            return True
        time.sleep(0.1)
    return False


class TestWatchdogMain:
    def test_successful_child_exits_zero(self, tmp_path):
        log = tmp_path / "run.log"
        rc = run_main(
            "--log", str(log), "--no-probe", "--",
            sys.executable, "-c", "print('hello from child')",
        )
        assert rc == 0
        assert "hello from child" in log.read_text()

    def test_restart_budget_exhausted(self, tmp_path):
        log = tmp_path / "run.log"
        counter = tmp_path / "launches.txt"
        child = (
            "from pathlib import Path; import sys; "
            f"p = Path({str(counter)!r}); "
            "p.write_text(p.read_text() + 'x' if p.exists() else 'x'); "
            "sys.exit(1)"
        )
        rc = run_main(
            "--log", str(log), "--no-probe", "--max-restarts", "2", "--",
            sys.executable, "-c", child,
        )
        assert rc == 3
        # Initial launch + 2 restarts = 3 attempts, then the budget trips.
        assert counter.read_text() == "xxx"

    def test_stall_kills_process_group_and_resumes(self, tmp_path):
        """First launch prints once then hangs (and spawns a hanging
        grandchild in the same process group); the watchdog must detect the
        stall, kill the WHOLE group by pgid, and relaunch. The relaunch sees
        the first attempt's pid file and exits 0 — modelling checkpoint
        resume."""
        log = tmp_path / "run.log"
        pids = tmp_path / "pids.txt"
        child = f"""
import os, subprocess, sys, time
from pathlib import Path
p = Path({str(pids)!r})
if p.exists():
    sys.exit(0)  # relaunched run "resumes" and completes
g = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(600)"])
p.write_text(f"{{os.getpid()}} {{g.pid}}")
print("started", flush=True)
time.sleep(600)
"""
        t0 = time.time()
        rc = run_main(
            "--log", str(log), "--no-probe",
            "--stall-secs", "2", "--poll-secs", "1", "--",
            sys.executable, "-c", child,
        )
        assert rc == 0
        assert time.time() - t0 < 60
        child_pid, grandchild_pid = map(int, pids.read_text().split())
        assert wait_dead(child_pid), "stalled child survived the pgid kill"
        assert wait_dead(grandchild_pid), "grandchild survived the pgid kill"

    def test_watch_tree_counts_as_progress(self, tmp_path):
        """A healthy trainer writes scalars/checkpoints, not stdout
        (CLAUDE.md: the first clip-100k launch was spuriously killed for
        exactly this). A child silent on stdout but touching files under
        --watch must NOT be declared stalled."""
        log = tmp_path / "run.log"
        watch = tmp_path / "rundir"
        counter = tmp_path / "launches.txt"
        child = f"""
import time
from pathlib import Path
c = Path({str(counter)!r})
c.write_text(c.read_text() + "x" if c.exists() else "x")
d = Path({str(watch)!r}); d.mkdir(exist_ok=True)
for i in range(5):
    (d / "scalars.jsonl").write_text("tick %d" % i)
    time.sleep(1)
"""
        rc = run_main(
            "--log", str(log), "--no-probe",
            "--stall-secs", "3", "--poll-secs", "1",
            "--watch", str(watch), "--",
            sys.executable, "-c", child,
        )
        assert rc == 0
        assert counter.read_text() == "x", "silent-but-progressing child was restarted"


class TestProgressStamp:
    def test_log_growth_changes_stamp(self, tmp_path):
        log = tmp_path / "run.log"
        log.write_text("a")
        s1 = watchdog.progress_stamp(log, [])
        log.write_text("ab")
        assert watchdog.progress_stamp(log, []) != s1

    def test_watch_tree_newest_mtime(self, tmp_path):
        log = tmp_path / "run.log"
        tree = tmp_path / "tree/sub"
        tree.mkdir(parents=True)
        f = tree / "ckpt.msgpack"
        f.write_text("v1")
        s1 = watchdog.progress_stamp(log, [str(tmp_path / "tree")])
        os.utime(f, (time.time() + 5, time.time() + 5))
        assert watchdog.progress_stamp(log, [str(tmp_path / "tree")]) != s1

    def test_missing_paths_are_tolerated(self, tmp_path):
        stamp = watchdog.progress_stamp(tmp_path / "no.log", [str(tmp_path / "nowhere")])
        assert stamp == (0, 0.0)


class TestChipProbeGating:
    def test_launch_waits_for_probe(self, tmp_path, monkeypatch):
        """Probing is the round-4 lesson-4 guard (the chip refuses clients
        for ~8-9 min after a holder exits): the child must not launch until
        a probe passes, and a never-healthy chip must abort with rc 4."""
        results = iter([False, False, True])
        calls = []
        monkeypatch.setattr(watchdog, "probe_chip", lambda t=90: calls.append(1) or next(results))
        monkeypatch.setattr(watchdog.time, "sleep", lambda s: None)
        log = tmp_path / "run.log"
        rc = run_main(
            "--log", str(log), "--probe-tries", "5", "--probe-wait", "1", "--",
            sys.executable, "-c", "print('ran')",
        )
        assert rc == 0
        assert len(calls) == 3
        assert "ran" in log.read_text()

    def test_chip_never_healthy_gives_up(self, tmp_path, monkeypatch):
        monkeypatch.setattr(watchdog, "probe_chip", lambda t=90: False)
        monkeypatch.setattr(watchdog.time, "sleep", lambda s: None)
        rc = run_main(
            "--log", str(tmp_path / "run.log"), "--probe-tries", "3", "--probe-wait", "1",
            "--", sys.executable, "-c", "print('never')",
        )
        assert rc == 4
        assert not (tmp_path / "run.log").exists() or "never" not in (tmp_path / "run.log").read_text()


class TestKillGroup:
    def test_kill_group_on_exited_process_is_noop(self):
        proc = subprocess.Popen([sys.executable, "-c", "pass"], start_new_session=True)
        proc.wait()
        watchdog.kill_group(proc)  # must not raise

    def test_kill_group_terminates_session(self):
        proc = subprocess.Popen(
            [sys.executable, "-c", "import time; time.sleep(600)"],
            start_new_session=True,
        )
        try:
            watchdog.kill_group(proc)
            assert proc.poll() is not None
        finally:
            if proc.poll() is None:
                proc.kill()
