"""NeRF-LLFF experiment driver (CLI).

demo 2v/3v/4v = the published 2/3/4-input-view SimpleNeRF experiments
(reference src/NerfLlffTrainerTester01.py demo1a/b/c :232-935): full model
with points/views augmentations, COLMAP sparse-depth priors, 9-loss stack,
100k iterations, then testing + spiral videos + QA.

Usage:
  python -m simplenerf_tpu.drivers.llff --database-dir <path to NeRF_LLFF/data>
      --output-dir runs/ --views 3 [--scenes fern flower] [--iters 100000]
      [--compute-dtype bfloat16]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from simplenerf_tpu.drivers import runner
from simplenerf_tpu.drivers.presets import simplenerf_config

# view-count -> (train_set_num, run numbering), reference runs/README.md:1-11
VIEWS_TO_SET = {2: (2, 1011), 3: (3, 1021), 4: (4, 1031)}


def build_configs(views: int, scenes, iters: int, compute_dtype: str, seed: int):
    set_num, run_num = VIEWS_TO_SET[views]
    train_configs = simplenerf_config(
        database="NeRF_LLFF",
        data_loader_name="NerfLlffDataLoader01",
        train_set_num=set_num,
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
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--iters", type=int, default=100000)
    parser.add_argument("--compute-dtype", default="bfloat16")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip-training", action="store_true")
    parser.add_argument("--skip-videos", action="store_true")
    parser.add_argument("--gt-depth-dir", type=Path, default=None,
                        help="dense-NeRF pseudo-GT depths for the depth metrics")
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
    if not args.skip_videos:
        runner.start_testing_videos(test_configs, args.database_dir, args.output_dir)
        runner.start_testing_videos(
            test_configs, args.database_dir, args.output_dir, static_camera=True
        )


if __name__ == "__main__":
    main()
