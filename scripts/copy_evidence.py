"""Copy a study's durable evidence into docs/evidence/<name>/.

Copies summary.json and QA_Scores_*.json, and thins each arm's
scalars.jsonl to every-500th-iteration rows (plus all rows whose
consistency losses exceed the spike threshold, so the spike record
survives the thinning), following the docs/evidence/*_r4 convention.

Usage:
  python scripts/copy_evidence.py <study_root> <evidence_name>
  # e.g. python scripts/copy_evidence.py /root/repo/.studies/colmap100k colmap100k_r5
"""

import json
import shutil
import sys
from pathlib import Path

SPIKE_KEYS = (
    "PointsAugmentationDepthLoss02",
    "ViewsAugmentationDepthLoss02",
    "CoarseFineConsistencyLoss02",
)


def thin_scalars(src: Path, dst: Path, every: int = 500, spike_thr: float = 5.0):
    rows = [json.loads(l) for l in src.read_text().splitlines() if l.strip()]
    kept = [
        r for r in rows
        if r.get("iter", 0) % every == 0
        or max((r.get(k, 0.0) for k in SPIKE_KEYS), default=0.0) > spike_thr
    ]
    dst.write_text("\n".join(json.dumps(r) for r in kept) + "\n")
    return len(rows), len(kept)


def main(study_root: str, name: str):
    root = Path(study_root)
    dest = Path("/root/repo/docs/evidence") / name
    dest.mkdir(parents=True, exist_ok=True)
    for f in ["summary.json", *[p.name for p in root.glob("QA_Scores_*.json")]]:
        if (root / f).exists():
            shutil.copy(root / f, dest / f)
            print(f"copied {f}")
    for arm, train_num in (("full", 11), ("ablation", 12)):
        scalars = root / f"runs/training/train{train_num:04}/blobs/logs/scalars.jsonl"
        if scalars.exists():
            n, k = thin_scalars(scalars, dest / f"scalars_{arm}_thinned.jsonl")
            print(f"thinned {arm} scalars: {n} -> {k} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
