"""Spike statistics from a training scalars.jsonl (study-7 protocol).

A "spike event" is a logged iteration where any consistency loss exceeds
the threshold (default 5.0) — the convention of RESULTS.md studies 5-9.
Reports per-loss event counts, the global max event, and the final MSE01
(trunk-damage indicator).

Usage:
  python scripts/spike_stats.py <scalars.jsonl> [threshold]
"""

import json
import sys
from pathlib import Path

CONSISTENCY_KEYS = (
    "PointsAugmentationDepthLoss02",
    "ViewsAugmentationDepthLoss02",
    "CoarseFineConsistencyLoss02",
)


def spike_stats(scalars_path, threshold: float = 5.0) -> dict:
    rows = [json.loads(l) for l in Path(scalars_path).read_text().splitlines() if l.strip()]
    events = 0
    excursions = 0
    above = False
    max_event = 0.0
    max_iter = None
    per_loss = {k: 0 for k in CONSISTENCY_KEYS}
    for r in rows:
        vals = {k: r[k] for k in CONSISTENCY_KEYS if k in r}
        if not vals:
            continue
        peak = max(vals.values())
        if peak > threshold:
            events += 1
            if not above:
                excursions += 1
            for k, v in vals.items():
                if v > threshold:
                    per_loss[k] += 1
        above = peak > threshold
        if peak > max_event:
            max_event, max_iter = peak, r.get("iter")
    return {
        "rows": len(rows),
        "threshold": threshold,
        "events": events,
        "excursions": excursions,
        "per_loss": {k: v for k, v in per_loss.items() if v},
        "max_event": round(max_event, 3),
        "max_event_iter": max_iter,
        "final_MSE01": rows[-1].get("MSE01") if rows else None,
        "final_iter": rows[-1].get("iter") if rows else None,
    }


if __name__ == "__main__":
    path = sys.argv[1]
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    print(json.dumps(spike_stats(path, thr), indent=2))
