"""COLMAP sparse-depth prior generation (offline, CPU, subprocess).

Triangulates keypoints with KNOWN camera poses and emits per-frame
(x, y, depth, reprojection_error, weight) tables plus percentile depth
bounds — the DS-NeRF-style prior SimpleNeRF trains against.

Pipeline mirrors the reference ColmapTester (src/prior_generators/
sparse_depth/Tester01.py:34-296): write images + a known-pose COLMAP text
model -> colmap feature_extractor -> patch camera params in the sqlite db
-> exhaustive_matcher -> point_triangulator (two-view tracks allowed,
min tri angle 4) -> model_converter to TXT -> read back 3-D points, keep
per-frame z-depths within the 0.5/99.5 percentile bounds, confidence
weight = 2*exp(-(err/mean_err)^2) (:265).

The COLMAP model files are parsed with small text readers here rather than
vendored readers. If the `colmap` binary is absent (it is not in this
image), estimate_sparse_depth raises a clear error; the parsing/depth math
is testable without it.
"""

from __future__ import annotations

import shutil
import sqlite3
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd
from scipy.spatial.transform import Rotation


def colmap_available() -> bool:
    return shutil.which("colmap") is not None


def quaternion_wxyz(rotation_matrix: np.ndarray) -> np.ndarray:
    q = Rotation.from_matrix(rotation_matrix).as_quat()  # xyzw
    return np.roll(q, 1)  # wxyz, COLMAP order


# ----------------------------------------------------------- text model IO


def read_points3d_txt(path: Path) -> dict:
    """{point_id: (xyz, error, image_ids)} from a COLMAP points3D.txt."""
    points = {}
    for line in Path(path).read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        pid = int(parts[0])
        xyz = np.array(parts[1:4], float)
        error = float(parts[7])
        track = parts[8:]
        image_ids = np.array(track[0::2], int)
        points[pid] = (xyz, error, image_ids)
    return points


def read_images_txt(path: Path) -> dict:
    """{image_id: (name, w2c(4x4), xys(n,2), point3d_ids(n,))}."""
    images = {}
    lines = [l for l in Path(path).read_text().splitlines() if l and not l.startswith("#")]
    for header, data in zip(lines[0::2], lines[1::2]):
        parts = header.split()
        image_id = int(parts[0])
        qw, qx, qy, qz = map(float, parts[1:5])
        t = np.array(parts[5:8], float)
        name = parts[9]
        rot = Rotation.from_quat([qx, qy, qz, qw]).as_matrix()
        w2c = np.eye(4)
        w2c[:3, :3] = rot
        w2c[:3, 3] = t
        d = data.split()
        xys = np.array(d, float).reshape(-1, 3)[:, :2] if d else np.zeros((0, 2))
        ids = np.array(d[2::3], int) if d else np.zeros((0,), int)
        images[image_id] = (name, w2c, xys, ids)
    return images


# ----------------------------------------------------------- depth math


def depths_and_weights(points: dict, images: dict):
    """Per-image keypoint z-depths with DS-NeRF confidence weights.

    Returns ({image_id: DataFrame(x, y, depth, reprojection_error, weight)},
    DataFrame(near, far)) using 0.5/99.5 percentile bounds per image
    (reference get_bounds :184-218, compute_colmap_depth :232-289).
    """
    if not points:
        return None, None
    errors = np.array([p[1] for p in points.values()])
    err_mean = errors.mean()

    # Per-image percentile bounds over z-depths of visible points.
    per_image_z: dict = {i: [] for i in images}
    for xyz, err, image_ids in points.values():
        for iid in np.unique(image_ids):
            if iid in images:
                _, w2c, _, _ = images[iid]
                c2w = np.linalg.inv(w2c)
                z = float(c2w[:3, 2] @ (xyz - c2w[:3, 3]))
                per_image_z[iid].append(z)
    bounds = {}
    for iid, zs in per_image_z.items():
        if not zs:
            return None, None
        bounds[iid] = (np.percentile(zs, 0.5), np.percentile(zs, 99.5))

    frames = {}
    for iid, (name, w2c, xys, ids) in sorted(images.items()):
        c2w = np.linalg.inv(w2c)
        rows = []
        for (x, y), pid in zip(xys, ids):
            if pid == -1 or pid not in points:
                continue
            xyz, err, _ = points[pid]
            depth = float(c2w[:3, 2] @ (xyz - c2w[:3, 3]))
            if depth < bounds[iid][0] or depth > bounds[iid][1]:
                continue
            weight = 2 * np.exp(-((err / err_mean) ** 2))
            rows.append([x, y, depth, err, weight])
        frames[iid] = pd.DataFrame(rows, columns=["x", "y", "depth", "reprojection_error", "weight"])
    bounds_df = pd.DataFrame(
        [bounds[i] for i in sorted(images)], columns=["near", "far"]
    )
    return frames, bounds_df


# ----------------------------------------------------------- the estimator


class ColmapSparseDepthEstimator:
    def __init__(self, workspace: Path):
        self.workspace = Path(workspace)
        self.images_dirpath = self.workspace / "images"
        self.sparse_dirpath = self.workspace / "sparse"
        self.db_path = self.workspace / "database.db"

    # -- workspace -----------------------------------------------------
    def prepare_workspace(self, images: np.ndarray, intrinsics: np.ndarray) -> None:
        """Write images, cameras.txt (shared FULL_OPENCV camera) and an empty
        points3D.txt."""
        for intrinsic in intrinsics:
            assert np.allclose(intrinsic, intrinsics[0]), "per-frame intrinsics unsupported"
        if self.workspace.exists():
            shutil.rmtree(self.workspace)
        self.images_dirpath.mkdir(parents=True)
        self.sparse_dirpath.mkdir(parents=True)

        from simplenerf_tpu.data import io

        for i, image in enumerate(images):
            io.write_image(self.images_dirpath / f"{i:04}.png", image)

        k = intrinsics[0]
        h, w = images[0].shape[:2]
        cam = f"1 FULL_OPENCV {w} {h} {k[0,0]} {k[1,1]} {k[0,2]} {k[1,2]} 0 0 0 0 0 0 0 0 \n"
        (self.sparse_dirpath / "cameras.txt").write_text(cam)
        (self.sparse_dirpath / "points3D.txt").write_text("")

    def write_known_poses(self, extrinsics: np.ndarray, image_id_by_name: dict) -> None:
        """images.txt rows binding each db image to its known w2c pose."""
        lines = []
        for frame_num, w2c in enumerate(extrinsics):
            q = quaternion_wxyz(w2c[:3, :3])
            t = w2c[:3, 3]
            name = f"{frame_num:04}.png"
            image_id = image_id_by_name[name]
            q_str = " ".join(map(str, q))
            t_str = " ".join(map(str, t))
            lines.append(f"{image_id} {q_str} {t_str} 1 {name}\n\n")
        (self.sparse_dirpath / "images.txt").write_text("".join(lines))

    def _patch_camera_params(self, intrinsic: np.ndarray) -> dict:
        """Set the db camera to PINHOLE(fx, fy, cx, cy) and read image ids."""
        db = sqlite3.connect(self.db_path.as_posix())
        params = np.asarray(
            [intrinsic[0, 0], intrinsic[1, 1], intrinsic[0, 2], intrinsic[1, 2]], np.float64
        )
        db.execute(
            "UPDATE cameras SET model=6, params=? WHERE camera_id=1", (params.tobytes(),)
        )
        ids = dict((name, iid) for iid, name in db.execute("SELECT image_id, name FROM images"))
        db.commit()
        db.close()
        return ids

    def _run(self, args: list[str]) -> None:
        result = subprocess.run(args, capture_output=True, text=True)
        if result.returncode != 0:
            raise RuntimeError(f"{' '.join(args)} failed:\n{result.stderr[-2000:]}")

    def run_colmap(self, extrinsics: np.ndarray, intrinsic: np.ndarray) -> None:
        if not colmap_available():
            raise RuntimeError(
                "colmap binary not found on PATH; install COLMAP to generate "
                "sparse-depth priors (see simplenerf_tpu/priors/colmap.py)"
            )
        self._run(
            ["colmap", "feature_extractor", "--database_path", self.db_path.as_posix(),
             "--image_path", self.images_dirpath.as_posix(), "--ImageReader.single_camera", "1"]
        )
        ids = self._patch_camera_params(intrinsic)
        self.write_known_poses(extrinsics, ids)
        self._run(["colmap", "exhaustive_matcher", "--database_path", self.db_path.as_posix()])
        self._run(
            ["colmap", "point_triangulator", "--database_path", self.db_path.as_posix(),
             "--image_path", self.images_dirpath.as_posix(),
             "--input_path", self.sparse_dirpath.as_posix(),
             "--output_path", self.sparse_dirpath.as_posix(),
             "--Mapper.tri_ignore_two_view_tracks", "0", "--Mapper.num_threads", "16",
             "--Mapper.init_min_tri_angle", "4", "--Mapper.multiple_models", "0",
             "--Mapper.extract_colors", "0"]
        )
        self._run(
            ["colmap", "model_converter", "--input_path", self.sparse_dirpath.as_posix(),
             "--output_path", self.sparse_dirpath.as_posix(), "--output_type", "TXT"]
        )

    def estimate_sparse_depth(
        self, images: np.ndarray, extrinsics: np.ndarray, intrinsics: np.ndarray
    ):
        """Full pipeline. Returns (frames: [DataFrame per image], bounds df)."""
        self.prepare_workspace(images, intrinsics)
        self.run_colmap(extrinsics, intrinsics[0])
        points = read_points3d_txt(self.sparse_dirpath / "points3D.txt")
        model_images = read_images_txt(self.sparse_dirpath / "images.txt")
        frames, bounds = depths_and_weights(points, model_images)
        if frames is None:
            return None, None
        ordered = [frames[i] for i in sorted(frames)]
        return ordered, bounds


def generate_scene_priors(
    database_dirpath: Path,
    scene_name: str,
    frame_nums: np.ndarray,
    images: np.ndarray,
    extrinsics: np.ndarray,
    intrinsics: np.ndarray,
    output_dirname: str = "DE02",
    resolution_suffix: str = "_down4",
    workspace: Optional[Path] = None,
) -> bool:
    """Write per-frame sparse-depth CSVs + EstimatedBounds.csv for one scene
    (layout of src/prior_generators/sparse_depth/DepthEstimator02_NeRF_LLFF.py
    :45-84). Skips if outputs already exist. Returns True on success."""
    out_dir = (
        Path(database_dirpath)
        / f"all/estimated_depths/{output_dirname}/{scene_name}/estimated_depths{resolution_suffix}"
    )
    if all((out_dir / f"{f:04}.csv").exists() for f in frame_nums):
        return True
    workspace = Path(workspace) if workspace else Path("/tmp/simplenerf_colmap") / scene_name
    estimator = ColmapSparseDepthEstimator(workspace)
    frames, bounds = estimator.estimate_sparse_depth(images, extrinsics, intrinsics)
    if frames is None:
        return False
    out_dir.mkdir(parents=True, exist_ok=True)
    for frame_num, df in zip(frame_nums, frames):
        df.to_csv(out_dir / f"{frame_num:04}.csv", index=False)
    bounds.to_csv(out_dir.parent / "EstimatedBounds.csv", index=False)
    return True
