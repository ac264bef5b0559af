"""Scene preprocessing: pose normalization, device-resident ray cache,
epoch-permutation batch sampling, and test-time ray construction.

TPU-first layout: the whole-scene per-pixel ray cache (origins, directions,
view dirs, NDC variants, target RGB, sparse-depth rasters) is built in one
jitted pass and lives in HBM as flat (n*h*w, .) arrays. Each training
iteration the host draws 2048+2048 indices from two epoch permutations
(NeRF pool + sparse-depth pool) and the gather happens on device inside the
train step — no host->device batch copies beyond the index vector.

Reference behavior: src/data_preprocessors/DataPreprocessor01.py —
preprocess_poses (:937-976), create_cache (:228-349), sparse-depth raster
(:163-185) + NDC conversion (:436-463), batch sampler (:507-585),
create_test_data (:807-895), model-configs digest (:65-80).

One deliberate deviation: the reference's epoch sampler emits a short batch
at epoch boundaries (DataPreprocessor01.py:559-563); we wrap into the next
permutation instead so every batch keeps the static shape XLA needs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.geometry import poses as pose_lib
from simplenerf_tpu.geometry import projection, rays as ray_lib


class EpochSampler:
    """Shuffled-permutation index stream with wrap-around (host-side)."""

    def __init__(self, pool: np.ndarray, rng: np.random.Generator):
        self.pool = np.asarray(pool)
        self.rng = rng
        self.perm = self.rng.permutation(self.pool)
        self.cursor = 0

    def reset_pool(self, pool: np.ndarray):
        self.pool = np.asarray(pool)
        self.perm = self.rng.permutation(self.pool)
        self.cursor = 0

    def next(self, count: int) -> np.ndarray:
        out = []
        remaining = count
        while remaining > 0:
            take = min(remaining, len(self.perm) - self.cursor)
            out.append(self.perm[self.cursor : self.cursor + take])
            self.cursor += take
            remaining -= take
            if self.cursor >= len(self.perm):
                self.perm = self.rng.permutation(self.pool)
                self.cursor = 0
        return np.concatenate(out)

    def skip(self, count: int):
        """Advance the stream `count` draws without materializing them —
        consumes the rng in exactly the same order as `next(count)`."""
        while count > 0:
            take = min(count, len(self.perm) - self.cursor)
            self.cursor += take
            count -= take
            if self.cursor >= len(self.perm):
                self.perm = self.rng.permutation(self.pool)
                self.cursor = 0


@functools.partial(jax.jit, static_argnames=("h", "w", "ndc"))
def _build_ray_cache(images, intrinsics, c2ws, near: float, h: int, w: int, ndc: bool):
    """Per-pixel rays for all frames, flattened to (n*h*w, .) — one XLA program."""

    def per_frame(frame_idx, intrinsic, c2w):
        rays_o, rays_d = ray_lib.get_rays(h, w, intrinsic, c2w)
        x, y = ray_lib.pixel_grid(h, w)
        pixel_id = jnp.stack([jnp.full_like(x, frame_idx), x, y], axis=-1)
        out = {"rays_o": rays_o, "rays_d": rays_d, "pixel_id": pixel_id}
        if ndc:
            o_ndc, d_ndc = ray_lib.ndc_rays(
                rays_o, rays_d, h, w, intrinsic[0, 0], intrinsic[1, 1], near
            )
            out["rays_o_ndc"] = o_ndc
            out["rays_d_ndc"] = d_ndc
        return out

    n = intrinsics.shape[0]
    frames = jax.vmap(per_frame)(jnp.arange(n, dtype=jnp.float32), intrinsics, c2ws)
    cache = {k: v.reshape(n * h * w, v.shape[-1]) for k, v in frames.items()}
    cache["view_dirs"] = ray_lib.get_view_dirs(cache["rays_d"])
    cache["pixel_id"] = cache["pixel_id"].astype(jnp.int32)
    cache["target_rgb"] = images.reshape(n * h * w, 3)
    return cache


class ScenePreprocessor:
    """Per-scene data pipeline for train/validation/test."""

    def __init__(
        self,
        configs: dict,
        mode: str,
        raw_data: Optional[dict] = None,
        model_configs: Optional[dict] = None,
        seed: int = 0,
    ):
        self.configs = configs
        self.mode = mode.lower()
        dl = configs["data_loader"]
        self.ndc = dl["ndc"]
        self.bd_factor = dl.get("bd_factor")
        self.downsampling_factor = dl.get("downsampling_factor", 1)
        self.num_rays = dl.get("num_rays", 2048)
        self.sparse_depth_needed = "sparse_depth" in dl
        self.dense_depth_needed = "dense_depth" in dl
        self.visibility_prior_needed = "visibility_prior" in dl
        self.mip_nerf_needed = "mip_nerf" in dl
        self.white_bkgd = configs.get("model", {}).get("white_bkgd", False)
        self.rng = np.random.default_rng(seed)
        self.model_configs = model_configs

        if self.mode in ("train", "validation"):
            assert raw_data is not None
            self._preprocess(raw_data)
            if self.mode == "train":
                self.model_configs = self._create_model_configs()

    # ------------------------------------------------------------------
    def _preprocess(self, raw: dict):
        nerf = raw["nerf_data"]
        self.frame_nums = np.asarray(raw["frame_nums"])
        images = self._preprocess_images(nerf["images"])
        intrinsics = nerf["intrinsics"].astype(np.float32).copy()
        h, w = nerf["resolution"]
        if self.downsampling_factor > 1:
            import cv2

            f = self.downsampling_factor
            h, w = h // f, w // f
            images = np.stack(
                [cv2.resize(im, (w, h), interpolation=cv2.INTER_AREA) for im in images]
            )
            intrinsics[:, :2] /= f
        self.resolution = (int(h), int(w))
        self.images = images.astype(np.float32)

        spherify = self.configs["data_loader"].get("spherify", False)
        if self.mode == "train":
            pp = pose_lib.preprocess_poses(
                nerf["extrinsics"],
                bounds=nerf["bounds"],
                bd_factor=self.bd_factor,
                recenter=self.configs["data_loader"].get("recenter_camera_poses", True),
                train_mode=True,
                spherify=spherify,
            )
            self.sc = pp["sc"]
            self.average_pose = pp["average_pose"]
            bounds = pp["bounds"]
        else:
            pp = pose_lib.preprocess_poses(
                nerf["extrinsics"],
                bounds=nerf["bounds"],
                translation_scale=self.model_configs["translation_scale"],
                avg_pose=np.array(self.model_configs["average_pose"]),
                train_mode=False,
                spherify=spherify,
                spherify_transform=self.model_configs.get("spherify_transform"),
            )
            self.sc = self.model_configs["translation_scale"]
            self.average_pose = np.array(self.model_configs["average_pose"])
            bounds = pp["bounds"]
        self.spherify_transform = pp.get("spherify_transform")
        self.render_poses = pp.get("render_poses")
        self.poses = pp["poses"]
        self.intrinsics = intrinsics
        self.bounds = np.asarray(bounds)

        if not self.ndc:
            self.near = float(self.bounds[0] * 0.9)
            self.far = float(self.bounds[1])
        else:
            bd = self.bd_factor if self.bd_factor is not None else 1.0
            self.near = float(self.bounds[0] * bd)
            self.far = float(self.bounds[1])
            self.near_ndc, self.far_ndc = 0.0, 1.0

        # Device-resident ray cache.
        self.cache = dict(
            _build_ray_cache(
                jnp.asarray(self.images),
                jnp.asarray(self.intrinsics),
                jnp.asarray(self.poses),
                self.near,
                *self.resolution,
                ndc=self.ndc,
            )
        )
        self.common = {
            "images": jnp.asarray(self.images),
            "poses": jnp.asarray(self.poses),
            "intrinsics": jnp.asarray(self.intrinsics),
        }

        n = len(self.images)
        self.num_frames = n
        if self.mip_nerf_needed:
            # Mip-NeRF pixel cone radii, cached like every other per-pixel
            # field (reference preprocess_mip_nerf_data,
            # DataPreprocessor01.py:396-412, gated at :33,236).
            h, w = self.resolution
            rd = self.cache["rays_d"].reshape(n, h, w, 3)
            self.cache["radii"] = ray_lib.get_radii(rd).reshape(n * h * w, 1)
            if self.ndc:
                ro = self.cache["rays_o_ndc"].reshape(n, h, w, 3)
                self.cache["radii_ndc"] = ray_lib.get_radii_ndc(ro).reshape(n * h * w, 1)
        self.sampler = EpochSampler(self._nerf_index_pool(iter_num=0), self.rng)

        if self.sparse_depth_needed and self.mode == "train":
            self._preprocess_sparse_depth(raw)
        if self.dense_depth_needed and self.mode == "train":
            self._preprocess_dense_depth(raw)
        if self.visibility_prior_needed and self.mode == "train":
            self._preprocess_visibility_prior(raw)
        self._pack_cache()

    def _pack_cache(self):
        """Pack the f32 per-ray cache planes into one (N, C) array.

        Per-field `jnp.take` produces ~10 narrow (nr, 1..3) gathers whose
        (8, 128) tile padding costs ~1.7 ms/step (scripts/glue_lab.py);
        one wide gather + lane slices is ~4x cheaper. The unpacked entries
        stay for the full-frame/validation paths; `gather_batch` uses the
        packed plane when given `packed_layout` (the train step does).
        Validation/test preprocessors never take the packed path, so they
        skip the pack (it would double the ray cache's HBM for nothing)."""
        if self.mode != "train":
            self.packed_layout = ()
            return
        keys = sorted(
            k for k, v in self.cache.items()
            if hasattr(v, "dtype") and v.dtype == jnp.float32 and v.ndim == 2
        )
        layout = []
        start = 0
        for k in keys:
            w = int(self.cache[k].shape[1])
            layout.append((k, start, w))
            start += w
        self.packed_layout = tuple(layout)
        if keys:
            self.cache["_packed"] = jnp.concatenate([self.cache[k] for k in keys], axis=1)

    def _preprocess_images(self, images: np.ndarray) -> np.ndarray:
        images = images.astype(np.float32) / 255.0
        if self.white_bkgd and images.shape[-1] == 4:
            images = images[..., :3] * images[..., 3:] + (1.0 - images[..., 3:])
        return images[..., :3]

    def _nerf_index_pool(self, iter_num: int) -> np.ndarray:
        """All-pixel index pool, optionally centre-cropped early in training
        (precrop, DataPreprocessor01.generate_indices :252-270)."""
        n = len(self.images)
        h, w = self.resolution
        dl = self.configs["data_loader"]
        frac = dl.get("precrop_fraction", 1)
        pc_iters = dl.get("precrop_iterations", -1)
        indices = np.arange(n * h * w)
        if frac < 1 and iter_num < pc_iters:
            h1 = int(round(h / 2 * (1 - frac)))
            h2 = int(round(h / 2 * (1 + frac)))
            w1 = int(round(w / 2 * (1 - frac)))
            w2 = int(round(w / 2 * (1 + frac)))
            indices = indices.reshape(n, h, w)[:, h1:h2, w1:w2].ravel()
        return indices

    def _preprocess_sparse_depth(self, raw: dict):
        h, w = self.resolution
        depths, errors = [], []
        for fn in self.frame_nums:
            depth = -np.ones((h, w), np.float32)
            err = -np.ones((h, w), np.float32)
            frame = raw.get("sparse_depth_data", {}).get(int(fn))
            if frame is not None:
                x = frame["x"].to_numpy() / self.downsampling_factor
                y = frame["y"].to_numpy() / self.downsampling_factor
                xi = np.clip(np.round(x), 0, w - 1).astype(int)
                yi = np.clip(np.round(y), 0, h - 1).astype(int)
                depth[yi, xi] = frame["depth"].to_numpy() * self.sc
                err[yi, xi] = frame["reprojection_error"].to_numpy()
            depths.append(depth)
            errors.append(err)
        depths = np.stack(depths).reshape(-1, 1)
        errors = np.stack(errors).reshape(-1, 1)
        self.cache["sparse_depth_values"] = jnp.asarray(depths)
        self.cache["sparse_depth_errors"] = jnp.asarray(errors)
        if self.ndc:
            d_ndc = np.array(
                projection.depth_to_ndc(
                    jnp.asarray(depths), self.cache["rays_o"], self.cache["rays_d"], near=1.0
                )
            )
            d_ndc[depths == -1] = -1
            self.cache["sparse_depth_values_ndc"] = jnp.asarray(d_ndc)

        sd_cfg = self.configs["data_loader"]["sparse_depth"]
        self.num_rays_sparse_depth = sd_cfg.get("num_rays", 2048)
        pool = np.where(depths[:, 0] > 0)[0]
        self.sparse_sampler = EpochSampler(pool, self.rng)

    def _preprocess_dense_depth(self, raw: dict):
        dd = raw["dense_depth_data"]
        depths = (dd["depth_values"] * self.sc).astype(np.float32).reshape(-1, 1)
        weights = dd["depth_weights"].astype(np.float32).reshape(-1, 1)
        self.cache["dense_depth_values"] = jnp.asarray(depths)
        self.cache["dense_depth_weights"] = jnp.asarray(weights)
        if self.ndc:
            d_ndc = np.array(
                projection.depth_to_ndc(
                    jnp.asarray(depths), self.cache["rays_o"], self.cache["rays_d"], near=self.near
                )
            )
            d_ndc[depths == -1] = -1
            self.cache["dense_depth_values_ndc"] = jnp.asarray(d_ndc)

    def _preprocess_visibility_prior(self, raw: dict):
        vp = raw["visibility_prior_data"]
        n = self.num_frames
        if "masks" in vp:
            masks = vp["masks"].astype(np.float32)  # (n, n-1, h, w)
            masks = np.transpose(masks, (0, 2, 3, 1)).reshape(-1, n - 1)
            self.cache["visibility_prior_masks"] = jnp.asarray(masks)
        if "weights" in vp:
            weights = vp["weights"].astype(np.float32)
            weights = np.transpose(weights, (0, 2, 3, 1)).reshape(-1, n - 1)
            self.cache["visibility_prior_weights"] = jnp.asarray(weights)

    # ------------------------------------------------------------------
    def _create_model_configs(self) -> dict:
        cfg = {
            "resolution": list(self.resolution),
            "bounds": np.asarray(self.bounds).tolist(),
            "translation_scale": float(self.sc),
            f"{self.mode}_frame_nums": np.asarray(self.frame_nums).tolist(),
            "intrinsic": np.mean(self.intrinsics, axis=0).tolist(),
            "average_pose": np.asarray(self.average_pose).tolist(),
            "near": self.near,
            "far": self.far,
        }
        if self.ndc:
            cfg["near_ndc"] = self.near_ndc
            cfg["far_ndc"] = self.far_ndc
        if self.spherify_transform is not None:
            # Persisted so test/video poses map into the same spherified
            # frame (see geometry.poses.preprocess_poses docstring).
            cfg["spherify_transform"] = self.spherify_transform
        return cfg

    def get_model_configs(self) -> dict:
        return self.model_configs

    # ------------------------------------------------------------------
    def next_indices(self, iter_num: int, image_num: Optional[int] = None):
        """Host-side index draw: (indices, mask_nerf, mask_sd) numpy arrays.

        With image_num set, yields every pixel of that frame (validation)."""
        dl = self.configs["data_loader"]
        if image_num is not None:
            h, w = self.resolution
            idx = np.where(self.frame_nums == image_num)[0].item()
            indices = np.arange(h * w) + idx * h * w
            mask_nerf = np.ones(len(indices), bool)
            return indices.astype(np.int32), mask_nerf, np.zeros(len(indices), bool)

        if iter_num == dl.get("precrop_iterations", -1):
            self.sampler.reset_pool(self._nerf_index_pool(iter_num))
        indices = self.sampler.next(self.num_rays)
        counts = [len(indices)]
        if self.sparse_depth_needed and self.mode == "train":
            sd = self.sparse_sampler.next(self.num_rays_sparse_depth)
            indices = np.concatenate([indices, sd])
            counts.append(len(sd))
        total = len(indices)
        mask_nerf = np.zeros(total, bool)
        mask_nerf[: counts[0]] = True
        mask_sd = ~mask_nerf
        return indices.astype(np.int32), mask_nerf, mask_sd

    def fast_forward(self, num_iters: int):
        """Advance the batch samplers past `num_iters` training draws.

        Called on checkpoint resume so the resumed run consumes the identical
        index stream an uninterrupted run would (the per-step RNG keys already
        fold in the absolute iteration, and loss weights/LR are pure functions
        of it — with this, resume ≡ continuous training bit-for-bit)."""
        if self.mode != "train" or num_iters <= 0:
            return
        dl = self.configs["data_loader"]
        precrop_it = dl.get("precrop_iterations", -1)
        sparse = self.sparse_depth_needed
        # The two samplers share one rng, so their wrap-time re-permutations
        # interleave; the replay must consume the rng in the same per-iteration
        # order as next_indices, not in two bulk skips.
        for it in range(num_iters):
            if it == precrop_it:
                self.sampler.reset_pool(self._nerf_index_pool(it))
            self.sampler.skip(self.num_rays)
            if sparse:
                self.sparse_sampler.skip(self.num_rays_sparse_depth)

    def batch_constants(self) -> dict:
        """Static per-scene scalars the gather step broadcasts per ray."""
        consts = {"near": self.near, "far": self.far}
        if self.ndc:
            consts["near_ndc"] = self.near_ndc
            consts["far_ndc"] = self.far_ndc
        return consts

    # ------------------------------------------------------------------
    def create_test_data(
        self,
        pose: np.ndarray,
        view_pose: Optional[np.ndarray] = None,
        secondary_poses: Optional[list] = None,
        preprocess_pose: bool = True,
        intrinsic: Optional[np.ndarray] = None,
        view_intrinsic: Optional[np.ndarray] = None,
    ) -> dict:
        """Full-image ray batch for an arbitrary camera pose.

        view_pose decouples the shading view-direction camera from the ray
        camera (static-camera view-dependence videos); secondary_poses supply
        the origins for expected secondary-view visibility.
        """
        mc = self.model_configs
        h, w = mc["resolution"]

        def norm(p):
            return pose_lib.preprocess_poses(
                np.asarray(p),
                translation_scale=mc["translation_scale"],
                avg_pose=np.array(mc["average_pose"]),
                train_mode=False,
                spherify="spherify_transform" in mc,
                spherify_transform=mc.get("spherify_transform"),
            )["poses"]

        proc = norm(pose[None])[0] if preprocess_pose else pose.astype(np.float32)
        K = np.asarray(intrinsic if intrinsic is not None else mc["intrinsic"], np.float32)
        rays_o, rays_d = ray_lib.get_rays(h, w, jnp.asarray(K), jnp.asarray(proc))
        if view_pose is not None:
            vproc = norm(view_pose[None])[0]
            vK = np.asarray(view_intrinsic if view_intrinsic is not None else mc["intrinsic"], np.float32)
            _, v_rays_d = ray_lib.get_rays(h, w, jnp.asarray(vK), jnp.asarray(vproc))
            view_dirs = ray_lib.get_view_dirs(v_rays_d)
        else:
            view_dirs = ray_lib.get_view_dirs(rays_d)

        nr = h * w
        batch = {
            "rays_o": rays_o.reshape(nr, 3),
            "rays_d": rays_d.reshape(nr, 3),
            "view_dirs": view_dirs.reshape(nr, 3),
            "near": jnp.full((nr, 1), mc["near"], jnp.float32),
            "far": jnp.full((nr, 1), mc["far"], jnp.float32),
        }
        if self.ndc:
            o_ndc, d_ndc = ray_lib.ndc_rays(
                batch["rays_o"], batch["rays_d"], h, w, K[0, 0], K[1, 1], mc["near"]
            )
            batch["rays_o_ndc"] = o_ndc
            batch["rays_d_ndc"] = d_ndc
            batch["near_ndc"] = jnp.full((nr, 1), mc["near_ndc"], jnp.float32)
            batch["far_ndc"] = jnp.full((nr, 1), mc["far_ndc"], jnp.float32)
        if self.mip_nerf_needed:
            # Deliberate divergence: the reference's test-batch metric-radii
            # line is an annotation-typo no-op (`input_batch['radii']:
            # torch.from_numpy(radii)`, DataPreprocessor01.py:888), so its
            # test batches carry only 'radii_ndc'. We emit both — the metric
            # key is what the line clearly intended (docs/PARITY.md).
            batch["radii"] = ray_lib.get_radii(rays_d[None]).reshape(nr, 1)
            if self.ndc:
                batch["radii_ndc"] = ray_lib.get_radii_ndc(
                    batch["rays_o_ndc"].reshape(1, h, w, 3)
                ).reshape(nr, 1)
        if secondary_poses is not None:
            sec = norm(np.stack(secondary_poses))
            origins = []
            for sp in sec:
                so, _ = ray_lib.get_rays(h, w, jnp.asarray(K), jnp.asarray(sp))
                origins.append(so.reshape(nr, 3))
            batch["rays_o2"] = jnp.stack(origins, axis=1)  # (nr, k, 3)
        return batch

    def retrieve_inference_outputs(self, outputs: dict) -> dict:
        """Reshape eval render outputs into images (fine if present)."""
        h, w = self.model_configs["resolution"]
        suffix = "_fine" if any(k.endswith("_fine") for k in outputs) else "_coarse"

        def img(key, ch=None):
            arr = np.asarray(outputs[f"{key}{suffix}"])
            return arr.reshape((h, w, ch) if ch else (h, w))

        out = {
            "image": np.clip(np.round(np.clip(img("rgb", 3), 0, 1) * 255), 0, 255).astype(np.uint8),
            "depth": np.clip(img("depth"), 0, np.inf),
            "depth_var": np.clip(img("depth_var"), 0, np.inf),
        }
        if self.ndc:
            out["depth_ndc"] = np.clip(img("depth_ndc"), 0, np.inf)
            out["depth_var_ndc"] = np.clip(img("depth_var_ndc"), 0, np.inf)
        key = f"visibility2{suffix}"
        if key in outputs:
            vis = np.asarray(outputs[key]).reshape(h, w, -1).transpose(2, 0, 1)
            out["visibility2"] = vis.astype(np.float32)
        return out


def gather_batch(cache: dict, common: dict, consts: dict, indices, mask_nerf, mask_sd,
                 packed_layout: tuple = ()) -> dict:
    """Pure device-side gather of a training batch from the ray cache.

    Called inside the jitted train step; `indices` is the only per-iteration
    host->device transfer. With `packed_layout` (the preprocessor's
    `(key, start, width)` tuple) the f32 fields come from ONE wide gather of
    the `_packed` plane + lane slices instead of ~10 narrow gathers.
    """
    cache = dict(cache)
    packed = cache.pop("_packed", None)
    batch = {}
    if packed is not None and packed_layout:
        rows = jnp.take(packed, indices, axis=0)
        for k, s, w in packed_layout:
            batch[k] = rows[:, s : s + w]
            cache.pop(k, None)
    batch.update({k: jnp.take(v, indices, axis=0) for k, v in cache.items()})
    nr = indices.shape[0]
    for key in ("radii", "radii_ndc"):
        # Radii exist only for NeRF rays; sparse-depth rows carry the
        # reference's -1 fill (load_mip_nerf_cached_batch :638-653).
        if key in batch:
            batch[key] = jnp.where(mask_nerf[:, None], batch[key], -1.0)
    for name, value in consts.items():
        batch[name] = jnp.full((nr, 1), value, jnp.float32)
    batch["indices_mask_nerf"] = mask_nerf
    if mask_sd is not None:
        batch["indices_mask_sparse_depth"] = mask_sd
    batch["common"] = common
    return batch
