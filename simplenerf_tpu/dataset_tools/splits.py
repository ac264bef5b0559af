"""Train/validation/test split creators (offline dataset tooling).

NeRF-LLFF: test = every 8th frame, validation = middle test frame, train =
n uniformly spaced of the rest (reference src/database_utils/nerf_llff/
train_test_creators/TrainTestCreator01_UniformSparseSampling.py:20-60).

RealEstate10K: train = first frames at stride 10 ([0, 10, 20, 30, 40]
prefix), test split into interpolation (between train frames) and
extrapolation (reference src/database_utils/real_estate/train_test_creators/
TrainTestCreator01.py:40-50).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def sample_sparse_train_frames(frame_nums, num_frames: int) -> np.ndarray:
    """n uniformly spaced interior samples (matches the reference's
    linspace(-1, len, n+2)[1:-1] rounding)."""
    frame_nums = np.asarray(sorted(frame_nums))
    if num_frames == -1:
        return frame_nums
    idx = np.round(np.linspace(-1, len(frame_nums), num_frames + 2)).astype(int)[1:-1]
    return frame_nums[idx]


def llff_split(frame_nums, num_train_frames: int):
    """(train, val, test) frame numbers for one LLFF scene."""
    frame_nums = sorted(frame_nums)
    test = list(range(0, len(frame_nums), 8))
    train_pool = sorted(set(frame_nums) - set(test))
    train = sample_sparse_train_frames(train_pool, num_train_frames)
    val = [test[len(test) // 2]]
    return np.asarray(train), np.asarray(val), np.asarray(test)


def create_llff_train_test_set(database_dirpath: Path, set_num: int, num_train_frames: int) -> None:
    """Scan all/database_data/<scene>/rgb* and write the three split CSVs."""
    database_dirpath = Path(database_dirpath)
    scenes_dirpath = database_dirpath / "all/database_data"
    set_dirpath = database_dirpath / f"train_test_sets/set{set_num:02}"
    set_dirpath.mkdir(parents=True, exist_ok=True)

    rows = {"Train": [], "Validation": [], "Test": []}
    for scene_dir in sorted(scenes_dirpath.iterdir()):
        rgb_dirs = sorted(scene_dir.glob("rgb*"))
        if not rgb_dirs:
            continue
        frame_nums = sorted(int(p.stem) for p in rgb_dirs[0].glob("*.png"))
        train, val, test = llff_split(frame_nums, num_train_frames)
        for name, frames in (("Train", train), ("Validation", val), ("Test", test)):
            rows[name] += [[scene_dir.name, int(f)] for f in frames]
    for name, data in rows.items():
        pd.DataFrame(data, columns=["scene_name", "pred_frame_num"]).to_csv(
            set_dirpath / f"{name}VideosData.csv", index=False
        )


def realestate_split(num_frames: int, num_train_frames: int):
    """(train, val, test) for a 50-frame RE10K clip: train prefix at stride
    10, remaining stride-10 frames as validation pool, everything else test."""
    train = np.arange(num_train_frames) * 10
    all_frames = np.arange(num_frames)
    test = np.array([f for f in all_frames if f not in train])
    val = np.array([int(train[-1]) + 5]) if len(train) else np.array([5])
    return train, val, test


def create_realestate_train_test_set(
    database_dirpath: Path, set_num: int, num_train_frames: int, num_frames: int = 50
) -> None:
    database_dirpath = Path(database_dirpath)
    scenes_dirpath = database_dirpath / "test/database_data"
    set_dirpath = database_dirpath / f"train_test_sets/set{set_num:02}"
    set_dirpath.mkdir(parents=True, exist_ok=True)
    rows = {"Train": [], "Validation": [], "Test": []}
    for scene_dir in sorted(scenes_dirpath.iterdir()):
        scene_num = int(scene_dir.name)
        train, val, test = realestate_split(num_frames, num_train_frames)
        for name, frames in (("Train", train), ("Validation", val), ("Test", test)):
            rows[name] += [[scene_num, int(f)] for f in frames]
    for name, data in rows.items():
        pd.DataFrame(data, columns=["scene_num", "pred_frame_num"]).to_csv(
            set_dirpath / f"{name}VideosData.csv", index=False
        )
