"""Inference harness: checkpointed model -> full-frame renders on disk.

Mirrors the reference NerfTester contract (src/Tester01.py:26-225): loads
the train run's Configs.json + per-scene ModelConfigs.json, rebuilds
test-time rays from the scene digest, renders frames under the deterministic
eval program, and saves predicted_frames/NNNN.png, predicted_depths (npy +
png), depth variance, NDC variants and per-train-frame visibility maps.
Every output is skip-if-exists so testing is idempotent and resumable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np

from simplenerf_tpu import config as config_lib
from simplenerf_tpu.data import io
from simplenerf_tpu.data.preprocessor import ScenePreprocessor
from simplenerf_tpu.render import renderer
from simplenerf_tpu.training import checkpoints
from simplenerf_tpu.training.trainer import build_eval_renderer, render_in_chunks


class Tester:
    def __init__(
        self,
        train_configs: dict,
        model_configs: dict,
        compute_dtype: Optional[str] = None,
        chunk: Optional[int] = None,
    ):
        self.train_configs = train_configs
        self.model_configs = model_configs
        self.render_cfg = config_lib.render_config_from_dict(train_configs, compute_dtype)
        if chunk is None:
            # HBM-sized eval chunk: 64k rays x 192 samples fits in bf16 but
            # overflows the 16G chip in f32 (measured 17.6G) — halve it.
            chunk = 64 * 1024 if self.render_cfg.compute_dtype == "bfloat16" else 32 * 1024
        self.chunk = chunk
        self.preprocessor = ScenePreprocessor(train_configs, "test", model_configs=model_configs)
        self.params = None
        self._eval_step = build_eval_renderer(self.render_cfg)

    def load_model(self, checkpoint_path: Path):
        target = renderer.init(jax.random.PRNGKey(0), self.render_cfg)
        _, self.params, _ = checkpoints.load_checkpoint(checkpoint_path, target)

    def predict_frame(
        self,
        pose: np.ndarray,
        view_pose: Optional[np.ndarray] = None,
        secondary_poses: Optional[list] = None,
        intrinsic: Optional[np.ndarray] = None,
        view_intrinsic: Optional[np.ndarray] = None,
    ) -> dict:
        assert self.params is not None, "call load_model first"
        batch = self.preprocessor.create_test_data(
            pose,
            view_pose=view_pose,
            secondary_poses=secondary_poses,
            intrinsic=intrinsic,
            view_intrinsic=view_intrinsic,
        )
        outputs = render_in_chunks(self._eval_step, self.params, batch, self.chunk)
        return self.preprocessor.retrieve_inference_outputs(outputs)

    # ------------------------------------------------------------------
    def save_frame_outputs(self, output_dir: Path, frame_num: int, prediction: dict):
        output_dir = Path(output_dir)
        io.write_image(output_dir / f"predicted_frames/{frame_num:04}.png", prediction["image"])
        io.write_depth(output_dir / f"predicted_depths/{frame_num:04}", prediction["depth"])
        io.write_depth(
            output_dir / f"predicted_depths_variance/{frame_num:04}", prediction["depth_var"]
        )
        if "depth_ndc" in prediction:
            io.write_depth(output_dir / f"predicted_depths_ndc/{frame_num:04}", prediction["depth_ndc"])
            io.write_depth(
                output_dir / f"predicted_depths_variance_ndc/{frame_num:04}",
                prediction["depth_var_ndc"],
            )
        if "visibility2" in prediction:
            for k, vis in enumerate(prediction["visibility2"]):
                io.write_image(
                    output_dir / f"predicted_visibilities/{frame_num:04}_{k:02}.png",
                    np.round(np.clip(vis, 0, 1) * 255).astype(np.uint8),
                )

    def frame_done(self, output_dir: Path, frame_num: int) -> bool:
        return (Path(output_dir) / f"predicted_frames/{frame_num:04}.png").exists()

    def test_scene(self, output_dir: Path, frames_data: dict):
        """Render every frame of a scene. frames_data: {frame_num: dict with
        'extrinsic' (4x4 w2c), optional 'intrinsic', optional
        'secondary_poses' (list of train-frame extrinsics for visibility)}."""
        for frame_num, frame in sorted(frames_data.items()):
            if self.frame_done(output_dir, frame_num):
                continue
            pred = self.predict_frame(
                np.asarray(frame["extrinsic"]),
                view_pose=frame.get("view_pose"),
                secondary_poses=frame.get("secondary_poses"),
                intrinsic=frame.get("intrinsic"),
            )
            self.save_frame_outputs(output_dir, frame_num, pred)

    def render_video_poses(self, poses: np.ndarray, view_poses: Optional[np.ndarray] = None) -> np.ndarray:
        """Render a pose path to an (n, h, w, 3) uint8 stack."""
        frames = []
        for i, pose in enumerate(poses):
            vp = view_poses[i] if view_poses is not None else None
            frames.append(self.predict_frame(np.asarray(pose), view_pose=vp)["image"])
        return np.stack(frames)
