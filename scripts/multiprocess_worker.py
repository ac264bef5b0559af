"""Worker process for the 2-process distributed-training smoke test.

Launched by tests/test_multiprocess.py (and usable manually) with env:
  MP_PID / MP_NPROC  — this process's id and the process count
  MP_COORD           — coordinator address (host:port)
  MP_DB / MP_OUT     — synthetic database dir and output dir
  MP_ITERS / MP_STEPS_PER_CALL — loop length and scan-chunk size

Each process gets 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device job. Every process loads the same synthetic scene,
draws the same globally-seeded ray batches, and feeds only its local block
through `mesh.shard_ray_batch_local` / `process_local_rows` — the repo's
multi-host replacement for the reference's single-process DataParallel
(reference src/Trainer01.py:514). Process 0 dumps the final (replicated)
params for the launcher to compare against a single-process run.
"""

import os
import sys
from pathlib import Path

pid = int(os.environ["MP_PID"])
nproc = int(os.environ["MP_NPROC"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["MP_COORD"], num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

import numpy as np

from simplenerf_tpu.data import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor
from simplenerf_tpu.drivers.presets import tiny_synthetic_config
from simplenerf_tpu.parallel import make_mesh
from simplenerf_tpu.training.trainer import Trainer

iters = int(os.environ.get("MP_ITERS", "3"))
steps_per_call = int(os.environ.get("MP_STEPS_PER_CALL", "1"))
out = Path(os.environ["MP_OUT"])

cfg = tiny_synthetic_config(num_iterations=iters)
cfg["steps_per_call"] = steps_per_call
raw = get_data_loader(cfg, Path(os.environ["MP_DB"]), "train").load_data()
pp = ScenePreprocessor(cfg, "train", raw, seed=0)
trainer = Trainer(cfg, out / f"proc{pid}", pp, mesh=make_mesh())

if steps_per_call > 1:
    values = trainer.train_many(0, iters)
else:
    for it in range(iters):
        values = trainer.train_one_iter(it)
total = float(values["TotalLoss"])

if pid == 0:
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    np.savez(out / "params_mp.npz", *[np.asarray(l) for l in leaves], total=total)
print(f"WORKER {pid} OK TotalLoss={total:.6f}", flush=True)
sys.exit(0)
