"""Tests for the study-analysis helpers (scripts/spike_stats.py,
scripts/copy_evidence.py) — they gate what goes into RESULTS.md and
docs/evidence/, so their conventions are pinned."""

import importlib.util
import json
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[1]


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, _ROOT / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


spike_stats = _load("spike_stats", "scripts/spike_stats.py")
copy_evidence = _load("copy_evidence", "scripts/copy_evidence.py")


def write_scalars(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_spike_stats_events_and_excursions(tmp_path):
    rows = [
        {"iter": 100, "CoarseFineConsistencyLoss02": 0.5, "MSE01": 1e-3},
        {"iter": 200, "CoarseFineConsistencyLoss02": 8.0, "MSE01": 1e-3},   # excursion 1
        {"iter": 300, "CoarseFineConsistencyLoss02": 12.0, "MSE01": 1e-3},  # same excursion
        {"iter": 400, "CoarseFineConsistencyLoss02": 0.2, "MSE01": 1e-3},
        {"iter": 500, "ViewsAugmentationDepthLoss02": 6.0,
         "CoarseFineConsistencyLoss02": 0.1, "MSE01": 2e-3},                # excursion 2
    ]
    p = tmp_path / "scalars.jsonl"
    write_scalars(p, rows)
    d = spike_stats.spike_stats(p)
    assert d["events"] == 3          # rows above threshold
    assert d["excursions"] == 2      # merged consecutive rows
    assert d["max_event"] == 12.0 and d["max_event_iter"] == 300
    assert d["per_loss"] == {"CoarseFineConsistencyLoss02": 2,
                             "ViewsAugmentationDepthLoss02": 1}
    assert d["final_MSE01"] == 2e-3 and d["final_iter"] == 500


def test_spike_stats_threshold(tmp_path):
    rows = [{"iter": i * 100, "CoarseFineConsistencyLoss02": v, "MSE01": 0.1}
            for i, v in enumerate([1.0, 3.0, 1.0])]
    p = tmp_path / "s.jsonl"
    write_scalars(p, rows)
    assert spike_stats.spike_stats(p)["events"] == 0
    assert spike_stats.spike_stats(p, threshold=2.0)["events"] == 1


def test_thin_scalars_keeps_spike_rows(tmp_path):
    # 100-iter cadence; thinning keeps every 500th iter AND all spike rows.
    rows = []
    for i in range(1, 21):
        r = {"iter": i * 100, "CoarseFineConsistencyLoss02": 0.1}
        rows.append(r)
    rows[6]["CoarseFineConsistencyLoss02"] = 50.0  # iter 700: spike, not a 500-multiple
    src = tmp_path / "scalars.jsonl"
    dst = tmp_path / "thinned.jsonl"
    write_scalars(src, rows)
    n, k = copy_evidence.thin_scalars(src, dst)
    kept = [json.loads(l) for l in dst.read_text().splitlines()]
    kept_iters = {r["iter"] for r in kept}
    assert n == 20 and k == len(kept)
    assert {500, 1000, 1500, 2000}.issubset(kept_iters)
    assert 700 in kept_iters          # the spike row survives thinning
    assert 600 not in kept_iters      # ordinary off-cadence rows do not
