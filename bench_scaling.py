"""Scaling benchmark: sharded train-step throughput across mesh sizes.

BASELINE.json asks for rays/s scaling at 1 chip / 1 host / N hosts. This
harness runs the FULL sharded train step (gather -> 4-MLP render -> 9-loss
stack -> psum'd grads -> Adam) over 1-D ray-sharded meshes of increasing
size and reports rays/s + parallel efficiency per mesh size.

Modes:
  python bench_scaling.py            # real backend (this box: one v5e chip)
  python bench_scaling.py --cpu 8    # 8 virtual CPU devices: validates the
                                     # SPMD mechanics and partitioning (CPU
                                     # numbers are NOT hardware throughput)

On a real pod slice the same script measures true ICI scaling; each process
feeds its local block (parallel.shard_ray_batch_local).

Prints one JSON line per mesh size:
  {"devices": N, "rays_per_s": X, "efficiency_vs_1": E}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="use N virtual CPU devices instead of the real backend")
    ap.add_argument("--rays", type=int, default=2048, help="NeRF rays per device")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from simplenerf_tpu.data import get_data_loader
    from simplenerf_tpu.data.preprocessor import ScenePreprocessor
    from simplenerf_tpu.data.synthetic import generate_scene
    from simplenerf_tpu.drivers.presets import simplenerf_config, tiny_synthetic_config
    from simplenerf_tpu.parallel import initialize_distributed, make_mesh
    from simplenerf_tpu.training.trainer import Trainer

    initialize_distributed()
    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "db"
        if args.cpu:
            generate_scene(root, num_frames=3, h=32, w=48, num_train=3, seed=0)
        else:
            generate_scene(root, scene_name="blobs", num_frames=3, h=189, w=252,
                           num_train=3, seed=0)

        base = None
        for n in sizes:
            mesh = make_mesh(devices[:n])
            if args.cpu:
                cfg = tiny_synthetic_config(
                    num_rays=args.rays * n // 8, sparse_depth_rays=args.rays * n // 8,
                    num_samples_coarse=16, num_samples_fine=32,
                    num_iterations=args.steps * 2,
                )
            else:
                cfg = simplenerf_config(
                    scene_id="blobs", num_iterations=args.steps * 2,
                    compute_dtype="bfloat16", seed=0,
                )
                cfg["data_loader"]["num_rays"] = args.rays * n
                cfg["data_loader"]["sparse_depth"]["num_rays"] = args.rays * n
            cfg["steps_per_call"] = args.steps
            raw = get_data_loader(cfg, root, "train").load_data()
            pp = ScenePreprocessor(cfg, "train", raw, seed=0)
            trainer = Trainer(cfg, Path(tmp) / f"run{n}", pp, mesh=mesh)
            rays_per_step = pp.num_rays + getattr(pp, "num_rays_sparse_depth", 0)

            vals = trainer.train_many(0, args.steps)  # compile + warmup
            _ = float(vals["TotalLoss"])
            t0 = time.perf_counter()
            vals = trainer.train_many(args.steps, args.steps)
            _ = float(vals["TotalLoss"])  # host sync
            dt = time.perf_counter() - t0
            rps = rays_per_step * args.steps / dt
            if base is None:
                base = rps / n
            print(json.dumps({
                "devices": n,
                "rays_per_s": round(rps, 1),
                "efficiency_vs_1": round(rps / (base * n), 3),
            }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
