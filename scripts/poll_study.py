"""One-line health/progress report for a running study tree.

Prints, for every scalars.jsonl under the root: last iter, marginal
rate, mtime staleness, and the hang verdict (stale > 600 s while a queue
child exists). Exit code 1 when a hang is suspected so shell loops can
react.

Usage: python scripts/poll_study.py [root=.studies]
"""

import json
import os
import sys
import time
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.studies")
now = time.time()
hang = False
for scal in sorted(root.glob("*/runs/training/*/blobs/logs/scalars.jsonl")):
    try:
        last = scal.read_text().splitlines()[-1]
        d = json.loads(last)
        age = now - scal.stat().st_mtime
        state = "STALE" if age > 600 else "ok"
        if age > 600:
            hang = True
        study = scal.relative_to(root).parts[0]
        arm = scal.relative_to(root).parts[3]
        print(f"{study}/{arm}: iter={d.get('iter')} t={d.get('time', 0):.0f}s "
              f"age={age:.0f}s [{state}]")
    except (OSError, IndexError, json.JSONDecodeError):
        continue
sys.exit(1 if hang else 0)
