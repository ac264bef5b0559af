"""RealEstate10K experiment driver (CLI).

Published 2/3/4-view experiments (reference src/RealEstateTrainerTester01.py
:230-455; run numbering 0011/0021/0031). Bounds are fixed [1, 100]; scenes
are 5-digit numbers.

Usage:
  python -m simplenerf_tpu.drivers.realestate --database-dir <RealEstate10K/data>
      --output-dir runs/ --views 3 [--scenes 0 1 3 4 6]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from simplenerf_tpu.drivers import runner
from simplenerf_tpu.drivers.presets import simplenerf_config

VIEWS_TO_SET = {2: (1, 11), 3: (2, 21), 4: (3, 31)}


def build_configs(views: int, scenes, iters: int, compute_dtype: str, seed: int):
    set_num, run_num = VIEWS_TO_SET[views]
    train_configs = simplenerf_config(
        database="RealEstate10K",
        data_loader_name="RealEstateDataLoader01",
        train_set_num=set_num,
        resolution_suffix="",
        num_iterations=iters,
        compute_dtype=compute_dtype,
        seed=seed,
    )
    train_configs["train_num"] = run_num
    train_configs["data_loader"]["scene_names"] = scenes or []
    test_configs = {
        "test_num": run_num,
        "train_num": run_num,
        "test_set_num": set_num,
        "qa_masks_dirname": "VM02",
        "scene_names": scenes or None,
    }
    return train_configs, test_configs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--database-dir", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("runs"))
    parser.add_argument("--views", type=int, default=2, choices=(2, 3, 4))
    parser.add_argument("--scenes", nargs="*", type=int, default=None)
    parser.add_argument("--iters", type=int, default=100000)
    parser.add_argument("--compute-dtype", default="bfloat16")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip-training", action="store_true")
    parser.add_argument("--gt-depth-dir", type=Path, default=None)
    args = parser.parse_args(argv)

    train_configs, test_configs = build_configs(
        args.views, args.scenes, args.iters, args.compute_dtype, args.seed
    )
    if not args.skip_training:
        runner.start_training(train_configs, args.database_dir, args.output_dir)
    scores = runner.start_testing(
        test_configs, args.database_dir, args.output_dir, gt_depth_dirpath=args.gt_depth_dir
    )
    print(scores)
    runner.start_testing_videos(test_configs, args.database_dir, args.output_dir)


if __name__ == "__main__":
    main()
