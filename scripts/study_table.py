"""Render RESULTS.md-style markdown tables from study summary.json files.

Usage:
  python scripts/study_table.py <summary.json> [<summary.json> ...]

For each summary: a full-vs-ablation QA table (the 12 families) plus the
win count. With multiple summaries, also prints a compact margin table
(full minus ablation, sign-adjusted so positive = full wins) across
studies — the shape used for the view-count trend and the sensitivity
sweep (VERDICT r4 directives 3/4).
"""

import json
import sys
from pathlib import Path

# (key, higher_is_better)
FAMILIES = [
    ("RMSE", False), ("PSNR", True), ("SSIM", True),
    ("MaskedRMSE", False), ("MaskedPSNR", True), ("MaskedSSIM", True),
    ("DepthRMSE", False), ("DepthMAE", False), ("DepthSROCC", True),
    ("MaskedDepthRMSE", False), ("MaskedDepthMAE", False), ("MaskedDepthSROCC", True),
]


def load(path):
    d = json.loads(Path(path).read_text())
    return d


def wins(full_qa, abl_qa):
    n = 0
    for k, hib in FAMILIES:
        if k not in full_qa or k not in abl_qa:
            continue
        if (full_qa[k] > abl_qa[k]) == hib and full_qa[k] != abl_qa[k]:
            n += 1
    return n


def one_table(name, d):
    fq, aq = d["full"]["qa"], d["ablation"]["qa"]
    print(f"### {name}")
    meta = [f"{k}={d[k]}" for k in (
        "iters", "num_train_views", "compute_dtype", "sparse_mode",
        "sparse_points_per_frame", "sparse_outlier_frac") if k in d]
    print(f"({', '.join(meta)})\n")
    head = ["arm"] + [k for k, _ in FAMILIES if k in fq]
    print("| " + " | ".join(head) + " |")
    print("|" + "---|" * len(head))
    for arm, qa in (("full", fq), ("ablation", aq)):
        row = [arm] + [f"{qa[k]:.4g}" for k, _ in FAMILIES if k in qa]
        print("| " + " | ".join(row) + " |")
    print(f"\nfull wins {wins(fq, aq)}/{sum(1 for k, _ in FAMILIES if k in fq and k in aq)} families\n")


def margin_table(rows):
    keys = [k for k, _ in FAMILIES]
    print("### Margins (full − ablation, sign-adjusted: positive = full wins)\n")
    print("| study | " + " | ".join(keys) + " | wins |")
    print("|" + "---|" * (len(keys) + 2))
    for name, d in rows:
        fq, aq = d["full"]["qa"], d["ablation"]["qa"]
        cells = []
        for k, hib in FAMILIES:
            if k in fq and k in aq:
                m = (fq[k] - aq[k]) if hib else (aq[k] - fq[k])
                cells.append(f"{m:+.3g}")
            else:
                cells.append("—")
        print(f"| {name} | " + " | ".join(cells)
              + f" | {wins(fq, aq)}/{sum(1 for k, _ in FAMILIES if k in fq and k in aq)} |")
    print()


if __name__ == "__main__":
    rows = []
    for p in sys.argv[1:]:
        d = load(p)
        name = Path(p).parent.name
        if "full" in d and "ablation" in d:
            one_table(name, d)
            rows.append((name, d))
        else:
            print(f"### {name}: arms present: {[k for k in ('full','ablation') if k in d]}")
    if len(rows) > 1:
        margin_table(rows)
