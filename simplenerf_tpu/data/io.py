"""Image/array IO helpers (imageio-backed; skimage is not in this image)."""

from __future__ import annotations

from pathlib import Path

import imageio.v2 as imageio
import numpy as np


def read_image(path: Path) -> np.ndarray:
    path = Path(path)
    if path.suffix == ".png":
        return np.asarray(imageio.imread(path.as_posix()))
    if path.suffix == ".npy":
        return np.load(path.as_posix())
    raise RuntimeError(f"Unknown image format: {path}")


def read_mask(path: Path) -> np.ndarray:
    path = Path(path)
    if path.suffix == ".png":
        return np.asarray(imageio.imread(path.as_posix())) == 255
    if path.suffix == ".npy":
        return np.load(path.as_posix())
    raise RuntimeError(f"Unknown mask format: {path}")


def write_image(path: Path, image: np.ndarray) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(path.as_posix(), image)


def write_depth(path: Path, depth: np.ndarray, as_png: bool = True) -> None:
    """Save raw depth as .npy and optionally an 8-bit visualization png."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path.with_suffix(".npy").as_posix(), depth)
    if as_png:
        lo, hi = float(np.min(depth)), float(np.max(depth))
        vis = (depth - lo) / (hi - lo) if hi > lo else np.zeros_like(depth)
        write_image(path.with_suffix(".png"), np.round(vis * 255).astype(np.uint8))


def write_video(path: Path, frames: np.ndarray, fps: int = 30) -> None:
    """Write an (n, h, w, 3) uint8 stack as an mp4 (ffmpeg via imageio)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimwrite(path.as_posix(), list(frames), fps=fps)
    except Exception:
        # ffmpeg plugin missing: fall back to per-frame pngs next to the target.
        frames_dir = path.with_suffix("")
        frames_dir.mkdir(parents=True, exist_ok=True)
        for i, frame in enumerate(frames):
            imageio.imwrite((frames_dir / f"{i:04}.png").as_posix(), frame)
