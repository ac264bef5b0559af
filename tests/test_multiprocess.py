"""Real multi-PROCESS (multi-host-shaped) training test.

Launches 2 OS processes, each with 4 virtual CPU devices, joined by
`jax.distributed.initialize` into one 8-device job; both run sharded train
steps through the `jax.process_count() > 1` branches of Trainer
(`mesh.process_local_rows` / `shard_ray_batch_local`) and the result is
compared against a single-process 8-device run of the same seed/config —
the global batch and math are identical, so params must match.

This is the executable substitute for the reference's DataParallel
deployment (reference src/Trainer01.py:514) scaled past one host; the
same code path feeds real multi-host TPU slices.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from simplenerf_tpu.data import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor
from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers.presets import tiny_synthetic_config
from simplenerf_tpu.parallel import make_mesh
from simplenerf_tpu.training.trainer import Trainer

REPO = Path(__file__).resolve().parent.parent
ITERS = 3


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_workers(db: Path, out: Path, steps_per_call: int = 1):
    coord = f"127.0.0.1:{free_port()}"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.update(
            MP_PID=str(pid), MP_NPROC="2", MP_COORD=coord,
            MP_DB=str(db), MP_OUT=str(out), MP_ITERS=str(ITERS),
            MP_STEPS_PER_CALL=str(steps_per_call),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c",
                 "exec(open('scripts/multiprocess_worker.py').read())"],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout[-4000:]}"
        assert f"WORKER {pid} OK" in stdout
    return outputs


def single_process_params(db: Path, out: Path):
    cfg = tiny_synthetic_config(num_iterations=ITERS)
    raw = get_data_loader(cfg, db, "train").load_data()
    pp = ScenePreprocessor(cfg, "train", raw, seed=0)
    trainer = Trainer(cfg, out, pp, mesh=make_mesh())
    for it in range(ITERS):
        values = trainer.train_one_iter(it)
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    return [np.asarray(l) for l in leaves], float(values["TotalLoss"])


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("db")
    generate_scene(root, num_frames=5, h=24, w=32, num_train=3, seed=3)
    return root


@pytest.mark.parametrize("steps_per_call", [1, ITERS],
                         ids=["per_step", "scan"])
def test_two_process_training_matches_single_process(scene, tmp_path, steps_per_call):
    """steps_per_call=ITERS exercises the multi-host SCAN branch
    (train_many's make_array_from_process_local_data feed) — the production
    TPU-slice configuration (steps_per_call=50) runs exactly this code."""
    run_workers(scene, tmp_path, steps_per_call=steps_per_call)
    mp = np.load(tmp_path / "params_mp.npz")
    sp_leaves, sp_total = single_process_params(scene, tmp_path / "sp")
    mp_leaves = [mp[f"arr_{i}"] for i in range(len(sp_leaves))]
    np.testing.assert_allclose(float(mp["total"]), sp_total, rtol=2e-4)
    for a, b in zip(mp_leaves, sp_leaves):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
