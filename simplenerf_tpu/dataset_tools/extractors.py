"""Dataset extractors: original releases -> this repo's scene layout.

LLFF: converts an original `nerf_llff_data` scene (COLMAP sparse/0 binary
model + images{,_4,_8} + poses_bounds.npy) into the CSV/png layout the
loaders read (reference src/database_utils/nerf_llff/data_organizers/
DataExtractor01.py:26-100). The COLMAP binary model is parsed with a
minimal struct-based reader implemented here.

RealEstate10K: parses the RE10K camera file (timestamp, intrinsics,
3x4 pose rows) and extracts the listed frames from a locally downloaded
clip via OpenCV (reference src/database_utils/real_estate/data_organizers/
DataExtractor01.py:28-70; video download itself needs network access and is
out of scope here).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from simplenerf_tpu.data import io


# ------------------------------------------------------ COLMAP binary model


def _read(fmt: str, f):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_binary(path: Path) -> dict:
    """{camera_id: dict(model_id, width, height, params)}"""
    cameras = {}
    num_params_by_model = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4, 9: 5, 10: 12}
    with open(path, "rb") as f:
        (num,) = _read("<Q", f)
        for _ in range(num):
            cam_id, model_id, width, height = _read("<iiQQ", f)
            n = num_params_by_model[model_id]
            params = np.array(_read(f"<{n}d", f))
            cameras[cam_id] = {
                "model_id": model_id, "width": width, "height": height, "params": params
            }
    return cameras


def read_images_binary(path: Path) -> dict:
    """{image_id: dict(qvec, tvec, camera_id, name, xys, point3d_ids)}"""
    images = {}
    with open(path, "rb") as f:
        (num,) = _read("<Q", f)
        for _ in range(num):
            image_id = _read("<i", f)[0]
            qvec = np.array(_read("<4d", f))
            tvec = np.array(_read("<3d", f))
            camera_id = _read("<i", f)[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (num_points,) = _read("<Q", f)
            data = np.array(_read(f"<{num_points * 3}d", f)).reshape(num_points, 3)
            images[image_id] = {
                "qvec": qvec, "tvec": tvec, "camera_id": camera_id,
                "name": name.decode(), "xys": data[:, :2],
                "point3d_ids": data[:, 2].astype(np.int64),
            }
    return images


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


# ------------------------------------------------------------- LLFF extract


def extract_llff_scene(scene_dirpath: Path, downsample_suffixes=("", "_down4", "_down8")) -> None:
    """Convert one original nerf_llff_data scene in place to the repo layout."""
    import cv2

    scene_dirpath = Path(scene_dirpath)
    cameras = read_cameras_binary(scene_dirpath / "sparse/0/cameras.bin")
    images = read_images_binary(scene_dirpath / "sparse/0/images.bin")
    bounds = np.load(scene_dirpath / "poses_bounds.npy")[:, 15:17]

    # COLMAP images are unordered; the reference enumerates dict order, which
    # for COLMAP models is insertion (id) order. Sort by name for stability.
    ordered = sorted(images.values(), key=lambda im: im["name"])

    intrinsics, extrinsics, bds = [], [], []
    for frame_num, im in enumerate(ordered):
        cam = cameras[im["camera_id"]]
        f = cam["params"][0]
        k = np.array([[f, 0, cam["width"] / 2], [0, f, cam["height"] / 2], [0, 0, 1.0]])
        w2c = np.eye(4)
        w2c[:3, :3] = qvec2rotmat(im["qvec"])
        w2c[:3, 3] = im["tvec"]
        intrinsics.append(k)
        extrinsics.append(w2c)
        bds.append(bounds[frame_num])

        src = next(scene_dirpath.glob(f"images/{Path(im['name']).stem}.*"))
        image = io.read_image(src) if src.suffix == ".png" else cv2.cvtColor(cv2.imread(str(src)), cv2.COLOR_BGR2RGB)
        for suffix in downsample_suffixes:
            factor = 1 if suffix == "" else int(suffix.replace("_down", ""))
            out = scene_dirpath / f"rgb{suffix}/{frame_num:04}.png"
            scaled = image if factor == 1 else cv2.resize(
                image, (image.shape[1] // factor, image.shape[0] // factor), interpolation=cv2.INTER_AREA
            )
            io.write_image(out, scaled)

    intrinsics = np.stack(intrinsics)
    extrinsics = np.stack(extrinsics)
    np.savetxt(scene_dirpath / "CameraExtrinsics.csv", extrinsics.reshape(-1, 16), delimiter=",")
    np.savetxt(scene_dirpath / "DepthBounds.csv", np.stack(bds), delimiter=",")
    for suffix in downsample_suffixes:
        factor = 1 if suffix == "" else int(suffix.replace("_down", ""))
        k = intrinsics.copy()
        k[:, :2] /= factor
        np.savetxt(scene_dirpath / f"CameraIntrinsics{suffix}.csv", k.reshape(-1, 9), delimiter=",")


# --------------------------------------------------------- RE10K extract


def parse_re10k_camera_file(path: Path):
    """(timestamps, intrinsics (n,3,3), w2c extrinsics (n,4,4)) from an
    RE10K camera txt (url line + one row per frame)."""
    lines = Path(path).read_text().splitlines()
    timestamps, intrinsics, extrinsics = [], [], []
    for line in lines[1:]:
        parts = line.split()
        if len(parts) < 19:
            continue
        timestamps.append(int(parts[0]))
        fx, fy, cx, cy = map(float, parts[1:5])
        intrinsics.append(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]]))
        pose = np.array(list(map(float, parts[7:19]))).reshape(3, 4)
        w2c = np.eye(4)
        w2c[:3] = pose
        extrinsics.append(w2c)
    return np.array(timestamps), np.stack(intrinsics), np.stack(extrinsics)


def extract_re10k_scene(
    video_path: Path,
    camera_file: Path,
    output_dirpath: Path,
    scene_num: int,
    num_frames: int = 50,
    start_index: int = 0,
) -> None:
    """Extract frames + camera CSVs for one RE10K clip from a local video."""
    import cv2

    timestamps, intrinsics, extrinsics = parse_re10k_camera_file(camera_file)
    sel = slice(start_index, start_index + num_frames)
    timestamps, intrinsics, extrinsics = timestamps[sel], intrinsics[sel], extrinsics[sel]

    out = Path(output_dirpath) / f"test/database_data/{scene_num:05}"
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(video_path))
    for i, ts in enumerate(timestamps):
        cap.set(cv2.CAP_PROP_POS_MSEC, ts / 1000.0)
        ok, frame = cap.read()
        if not ok:
            raise RuntimeError(f"failed to read frame at {ts} from {video_path}")
        io.write_image(out / f"rgb/{i:04}.png", cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()

    h, w = io.read_image(out / "rgb/0000.png").shape[:2]
    k = intrinsics.copy()
    # RE10K intrinsics are normalized by resolution.
    k[:, 0] *= w
    k[:, 1] *= h
    np.savetxt(out / "CameraIntrinsics.csv", k.reshape(-1, 9), delimiter=",")
    np.savetxt(out / "CameraExtrinsics.csv", extrinsics.reshape(-1, 16), delimiter=",")
