"""Training observability: JSONL scalar stream + optional TensorBoard.

The JSONL file (one {"iter", "lr", losses..., "rays_per_s"} object per line)
is always written — cheap, grep-able, and the source for save_plots().
TensorBoard event files are written too when the package is importable
(the reference logs per-iteration scalars to TB, src/Trainer01.py:266-271).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class TrainLogger:
    def __init__(self, log_dir: Path):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.log_dir / "scalars.jsonl", "a", buffering=1)
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(str(self.log_dir))
        except Exception:
            pass
        self._t0 = time.time()

    def log_scalars(self, iteration: int, scalars: dict):
        row = {"iter": iteration, "time": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(row) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), iteration)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()

    def save_plots(self, plots_dir: Optional[Path] = None):
        """Render every logged scalar to a PNG (reference save_plots,
        src/Trainer01.py:412-427)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plots_dir = Path(plots_dir or (self.log_dir / "plots"))
        plots_dir.mkdir(parents=True, exist_ok=True)
        rows = [json.loads(line) for line in open(self.log_dir / "scalars.jsonl")]
        if not rows:
            return
        keys = {k for row in rows for k in row if k not in ("iter", "time")}
        for key in sorted(keys):
            pts = [(r["iter"], r[key]) for r in rows if key in r]
            if not pts:
                continue
            xs, ys = zip(*pts)
            plt.figure(figsize=(8, 4))
            plt.plot(xs, ys)
            plt.title(key)
            plt.xlabel("iteration")
            plt.grid(True, alpha=0.3)
            plt.savefig(plots_dir / f"{key.replace('/', '_')}.png", dpi=80)
            plt.close()
