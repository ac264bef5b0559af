"""Training harness: one fused jitted train step, driven by a host loop.

Per iteration the host draws ray indices and loss-schedule weights; the
device executes gather -> render (all MLPs) -> 9-loss stack -> grad -> Adam
as one XLA program. The reference's grad-accumulation sub-batching
(src/Trainer01.py:61-107) is unnecessary on TPU — the full 4096-ray batch
fits comfortably — and its loss arithmetic is reproduced exactly by the
masked single-pass computation (sub-batches were mask-disjoint, so the sum
of sub-batch losses equals the masked full-batch losses).

Parallelism: with a mesh, the index vector is sharded over the 'rays' axis
and params/optimizer/cache replicated; XLA partitions per-ray compute and
psums gradients over ICI (see simplenerf_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simplenerf_tpu import config as config_lib
from simplenerf_tpu.data import io
from simplenerf_tpu.data.preprocessor import ScenePreprocessor, gather_batch
from simplenerf_tpu.losses import LossComputer, LossContext
from simplenerf_tpu.parallel import mesh as mesh_lib
from simplenerf_tpu.render import renderer
from simplenerf_tpu.training import checkpoints
from simplenerf_tpu.training.logger import TrainLogger
from simplenerf_tpu.training.lr_decay import make_lr_schedule
from simplenerf_tpu.utils import profiling


def flat_adam(lr_schedule, b1: float = 0.9, b2: float = 0.999):
    """optax.adam over ONE flattened parameter vector.

    The SimpleNeRF ensemble is ~120 small tensors across 4 MLPs; per-tensor
    Adam pays (8, 128) tile padding and per-op overhead ~10x the arithmetic
    (measured 1.44 ms/step vs a ~0.15 ms roofline, scripts/glue_lab.py).
    Mathematically identical to per-leaf adam (adam is elementwise);
    optimizer-state checkpoints hold the flat vectors.

    Returns (tree-in/tree-out transformation, the inner flat optax.adam).
    Round-4 negative result: differentiating in the flat domain
    (loss(unravel(flat)), flat scan carry, one fused parameter add) was
    tried to shave the remaining ~0.9 ms of tree<->flat shuffle (glue lab
    2) and REVERTED — with params as slices of one buffer the whole-step
    bench showed no win over this formulation, and the known-good tree
    path keeps kernel operands as standalone arrays.
    """
    import jax.flatten_util

    inner = optax.adam(lr_schedule, b1=b1, b2=b2)

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None):
        flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
        flat_u, state = inner.update(flat_g, state, None)
        return unravel(flat_u), state

    return optax.GradientTransformation(init, update), inner


def loss_context_from_configs(configs: dict) -> LossContext:
    model = configs["model"]
    return LossContext(
        points_aug_fine="fine_mlp" in model.get("points_augmentation", {}),
        views_aug_fine="fine_mlp" in model.get("views_augmentation", {}),
        sparse_depth_enabled="sparse_depth" in configs["data_loader"],
    )


class Trainer:
    def __init__(
        self,
        configs: dict,
        output_dir: Path,
        train_pp: ScenePreprocessor,
        val_pp: Optional[ScenePreprocessor] = None,
        mesh=None,
        compute_dtype: Optional[str] = None,
    ):
        self.configs = configs
        self.output_dir = Path(output_dir)
        self.train_pp = train_pp
        self.val_pp = val_pp
        self.mesh = mesh

        self.render_cfg = config_lib.render_config_from_dict(configs, compute_dtype)
        self.loss_computer = LossComputer(configs["losses"], loss_context_from_configs(configs))
        opt_cfg = configs["optimizer"]
        self.lr_schedule = make_lr_schedule(opt_cfg, configs.get("num_iterations", 0))
        self.opt, self._inner_opt = flat_adam(
            self.lr_schedule, b1=opt_cfg.get("beta1", 0.9), b2=opt_cfg.get("beta2", 0.999)
        )

        seed = configs.get("seed", 0)
        self.base_key = jax.random.PRNGKey(seed)
        self.params = renderer.init(jax.random.PRNGKey(seed), self.render_cfg)
        self.opt_state = self.opt.init(self.params)
        self.start_iter = 0

        if configs.get("resume_training", True):
            latest = checkpoints.latest_checkpoint(self.output_dir / "saved_models")
            if latest is not None:
                self.start_iter, self.params, self.opt_state = checkpoints.load_checkpoint(
                    latest, self.params, self.opt_state
                )
                # Replay the host-side sampler streams so the resumed run
                # draws the same batches an uninterrupted run would — resume
                # is then bit-identical to continuous training (RNG keys and
                # loss weights are already pure functions of the iteration).
                self.train_pp.fast_forward(self.start_iter)

        if self.mesh is not None:
            self.params = mesh_lib.replicate(self.mesh, self.params)
            self.opt_state = mesh_lib.replicate(self.mesh, self.opt_state)
            if jax.process_count() > 1:
                # Multi-process jit requires every operand to be a global
                # jax.Array: promote the device-resident ray cache and the
                # scene's common data (identical on all hosts — same
                # database, same preprocessing) to replicated global arrays.
                self.train_pp.cache = mesh_lib.replicate(self.mesh, self.train_pp.cache)
                self.train_pp.common = mesh_lib.replicate(self.mesh, self.train_pp.common)

        self.logger = TrainLogger(self.output_dir / "logs")
        self.steps_per_call = int(configs.get("steps_per_call", 1))
        self._step = self._build_step()
        self._multi_step = self._build_multi_step()
        self._eval_step = build_eval_renderer(self.render_cfg)
        # Validation of train frames runs with sec_views_vis, like the
        # reference's `self.model(..., sec_views_vis=train_data)`
        # (Trainer01.py:194-196) — only a distinct program when a
        # visibility head exists, so reuse the plain eval step otherwise.
        self._eval_step_vis = (
            build_eval_renderer(self.render_cfg, sec_views_vis=True)
            if self.render_cfg.predict_visibility
            else self._eval_step
        )
        # Two validation loss programs: loss maps (incl. the full-frame
        # patch-reprojection arbitration) are only computed when the config
        # asks for them — the reference gates map computation the same way,
        # and each validation shape costs a minutes-long compile here.
        self._val_loss_step_maps = jax.jit(
            lambda batch, outputs, weights: self.loss_computer.compute(
                batch, outputs, weights, return_loss_maps=True
            )[1:]
        )
        self._val_loss_step = jax.jit(
            lambda batch, outputs, weights: self.loss_computer.compute(
                batch, outputs, weights
            )[1]
        )

    # ------------------------------------------------------------------
    def _build_step(self):
        """One fused step: gather -> render (all MLPs) -> 9 losses -> grad
        -> flat Adam -> tree update. Gradients ravel to one vector for the
        optimizer (see flat_adam); params stay a tree so the Pallas kernels
        consume standalone arrays (the flat-carry variant measured no
        better end-to-end — flat_adam docstring)."""
        import jax.flatten_util

        render_cfg = self.render_cfg
        loss_computer = self.loss_computer
        inner = self._inner_opt
        consts = self.train_pp.batch_constants()
        layout = getattr(self.train_pp, "packed_layout", ())

        def step(params, opt_state, cache, common, indices, mask_nerf, mask_sd, key, weights):
            batch = gather_batch(cache, common, consts, indices, mask_nerf, mask_sd,
                                 packed_layout=layout)

            def loss_fn(p):
                outputs = renderer.render_rays(p, render_cfg, batch, key, train=True)
                total, values = loss_computer.compute(batch, outputs, weights)
                return total, values

            (_, values), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
            updates, opt_state = inner.update(flat_g, opt_state, None)
            params = jax.tree.map(
                lambda p, u: p + u, params, unravel(updates)
            )
            return params, opt_state, values

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_multi_step(self):
        """K train steps under one lax.scan — one dispatch, no host round
        trips between steps. The per-step RNG keys fold in the absolute
        iteration number on device, matching the single-step path exactly."""
        import jax.flatten_util

        render_cfg = self.render_cfg
        loss_computer = self.loss_computer
        inner = self._inner_opt
        consts = self.train_pp.batch_constants()
        layout = getattr(self.train_pp, "packed_layout", ())
        base_key = self.base_key

        def body(carry, xs, cache, common):
            params, opt_state = carry
            indices, mask_nerf, mask_sd, iter_num, weights = xs
            key = jax.random.fold_in(base_key, iter_num)
            batch = gather_batch(cache, common, consts, indices, mask_nerf, mask_sd,
                                 packed_layout=layout)

            def loss_fn(p):
                outputs = renderer.render_rays(p, render_cfg, batch, key, train=True)
                total, values = loss_computer.compute(batch, outputs, weights)
                return total, values

            (_, values), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
            updates, opt_state = inner.update(flat_g, opt_state, None)
            params = jax.tree.map(lambda p, u: p + u, params, unravel(updates))
            return (params, opt_state), values

        def multi_step(params, opt_state, cache, common, indices_k, mask_nerf_k, mask_sd_k,
                       iter_nums_k, weights_k):
            (params, opt_state), values = jax.lax.scan(
                lambda c, xs: body(c, xs, cache, common),
                (params, opt_state),
                (indices_k, mask_nerf_k, mask_sd_k, iter_nums_k, weights_k),
            )
            return params, opt_state, values

        return jax.jit(multi_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def train_one_iter(self, iter_num: int):
        pp = self.train_pp
        indices, mask_nerf, mask_sd = pp.next_indices(iter_num)
        weights = jnp.asarray(self.loss_computer.weights_vector(iter_num))
        key = jax.random.fold_in(self.base_key, iter_num)
        indices = jnp.asarray(indices)
        mask_nerf_j = jnp.asarray(mask_nerf)
        mask_sd_j = jnp.asarray(mask_sd)
        if self.mesh is not None:
            if jax.process_count() > 1:
                # Multi-host: every process drew the same global batch from
                # the shared seed; feed only the local block. Small per-step
                # operands (weights vector, RNG key) become replicated
                # globals for the same every-operand-global jit requirement.
                rows = mesh_lib.process_local_rows(indices.shape[0])
                indices, mask_nerf_j, mask_sd_j = mesh_lib.shard_ray_batch_local(
                    self.mesh, (indices[rows], mask_nerf_j[rows], mask_sd_j[rows])
                )
                weights = mesh_lib.replicate(self.mesh, weights)
                key = mesh_lib.replicate(self.mesh, key)
            else:
                indices, mask_nerf_j, mask_sd_j = mesh_lib.shard_ray_batch(
                    self.mesh, (indices, mask_nerf_j, mask_sd_j)
                )
        self.params, self.opt_state, values = self._step(
            self.params, self.opt_state, pp.cache, pp.common,
            indices, mask_nerf_j, mask_sd_j, key, weights,
        )
        return values

    def train_many(self, start_iter: int, k: int):
        """Run k fused steps in one device call (scan). Returns the last
        step's loss values."""
        pp = self.train_pp
        draws = [pp.next_indices(start_iter + j) for j in range(k)]
        indices_k = jnp.asarray(np.stack([d[0] for d in draws]))
        mask_nerf_k = jnp.asarray(np.stack([d[1] for d in draws]))
        mask_sd_k = jnp.asarray(np.stack([d[2] for d in draws]))
        iter_nums_k = jnp.arange(start_iter, start_iter + k, dtype=jnp.uint32)
        weights_k = jnp.asarray(
            np.stack([self.loss_computer.weights_vector(start_iter + j) for j in range(k)])
        )
        if self.mesh is not None:
            sharding = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec(None, mesh_lib.RAY_AXIS))
            if jax.process_count() > 1:
                rows = mesh_lib.process_local_rows(indices_k.shape[1])
                indices_k, mask_nerf_k, mask_sd_k = (
                    jax.make_array_from_process_local_data(sharding, np.asarray(x[:, rows]))
                    for x in (indices_k, mask_nerf_k, mask_sd_k)
                )
                iter_nums_k = mesh_lib.replicate(self.mesh, iter_nums_k)
                weights_k = mesh_lib.replicate(self.mesh, weights_k)
            else:
                indices_k, mask_nerf_k, mask_sd_k = (
                    jax.device_put(indices_k, sharding),
                    jax.device_put(mask_nerf_k, sharding),
                    jax.device_put(mask_sd_k, sharding),
                )
        self.params, self.opt_state, values = self._multi_step(
            self.params, self.opt_state, pp.cache, pp.common,
            indices_k, mask_nerf_k, mask_sd_k, iter_nums_k, weights_k,
        )
        return {key: v[-1] for key, v in values.items()}

    def _next_boundary(self, it: int, num_iterations: int) -> int:
        """Largest chunk from `it` that crosses no log/val/save boundary."""
        nxt = num_iterations
        for interval in (
            self.configs.get("log_interval", 100),
            self.configs.get("validation_interval", 0),
            self.configs.get("model_save_interval", 10000),
        ):
            if interval:
                nxt = min(nxt, ((it // interval) + 1) * interval)
        return nxt

    def train(self, num_iterations: Optional[int] = None):
        num_iterations = num_iterations or self.configs["num_iterations"]
        val_interval = self.configs.get("validation_interval", 0)
        save_interval = self.configs.get("model_save_interval", 10000)
        log_interval = self.configs.get("log_interval", 100)
        # Optional XLA trace window: {"start_iter": N, "num_iters": K}
        # captures a jax.profiler trace into <run>/profile (SURVEY.md §5:
        # the reference has no tracing; this is its TPU-native equivalent).
        prof_cfg = self.configs.get("profiling") or {}
        prof_start = int(prof_cfg.get("start_iter", -1))
        prof_iters = int(prof_cfg.get("num_iters", 0))
        prof_ctx = None

        values = {}
        t_last = time.time()
        iters_since_log = 0
        rays_per_iter = self.train_pp.num_rays + getattr(self.train_pp, "num_rays_sparse_depth", 0)
        timer = profiling.StepTimer(rays_per_step=rays_per_iter)
        timer.tick(0)
        it = self.start_iter
        while it < num_iterations:
            if prof_iters and it == prof_start and prof_ctx is None:
                prof_ctx = profiling.trace(self.output_dir / "profile")
                prof_ctx.__enter__()
            chunk = max(1, min(self.steps_per_call, self._next_boundary(it, num_iterations) - it))
            if prof_ctx is not None:
                chunk = max(1, min(chunk, prof_start + prof_iters - it))
            if chunk == 1:
                values = self.train_one_iter(it)
            else:
                values = self.train_many(it, chunk)
            it += chunk
            iters_since_log += chunk
            if prof_ctx is not None and it >= prof_start + prof_iters:
                jax.block_until_ready(jax.tree.leaves(values))
                prof_ctx.__exit__(None, None, None)
                prof_ctx = None
            if it % log_interval == 0 or it == num_iterations:
                values = {k: float(v) for k, v in values.items()}
                dt = time.time() - t_last
                timer.tick(iters_since_log)
                scalars = dict(values)
                scalars["lr"] = float(self.lr_schedule(it - 1))
                scalars["rays_per_s"] = rays_per_iter * iters_since_log / max(dt, 1e-9)
                self.logger.log_scalars(it, scalars)
                t_last = time.time()
                iters_since_log = 0
            if val_interval and it % val_interval == 0:
                self.run_validation(it)
            if it % save_interval == 0 or it == num_iterations:
                self.save_checkpoint(it)
        if prof_ctx is not None:
            prof_ctx.__exit__(None, None, None)
        if timer.stats():
            timer.dump(self.output_dir / "logs/step_timing.json")
        return values

    # ------------------------------------------------------------------
    def save_checkpoint(self, iteration: int):
        checkpoints.save_checkpoint(
            self.output_dir / "saved_models", iteration,
            jax.device_get(self.params), jax.device_get(self.opt_state),
        )

    def run_validation(self, iteration: int):
        """Reference-style validation (src/Trainer01.py:109-263, 301-305).

        Renders EVERY frame of the train and validation loaders in eval mode,
        computes the FULL configured loss set on each rendered frame (losses
        whose inputs exist only in training batches — augmented outputs,
        sparse-depth masks — contribute 0, exactly like the reference's
        key-presence guards), saves per-level frames / depths / depth
        variances (+ NDC variants) and, when `validation_save_loss_maps` is
        set, every per-ray loss map reshaped to (h, w) as npy+png under
        samples/Losses (LossComputer01 `return_loss_maps`, LossUtils01.py:
        7-10 key grammar). Per-loss scalars averaged over frames are logged
        under validation/{train,val}_images plus the headline PSNR."""
        chunk = self.configs.get("validation_chunk_size", 64 * 1024)
        save_loss_maps = bool(self.configs.get("validation_save_loss_maps", False))
        weights = jnp.asarray(self.loss_computer.weights_vector(iteration))
        samples_dir = self.output_dir / "samples"
        jobs = [("train_images", self.train_pp, True)]
        if self.val_pp is not None:
            jobs.append(("val_images", self.val_pp, False))
        for tag, pp, is_train_data in jobs:
            h, w = pp.resolution
            eval_step = self._eval_step_vis if is_train_data else self._eval_step
            frame_nums = [int(f) for f in pp.frame_nums]
            totals: dict = {}
            psnr_sum = 0.0
            for frame_num in frame_nums:
                indices, mask_nerf, _ = pp.next_indices(0, image_num=frame_num)
                batch = gather_batch(
                    pp.cache, pp.common, pp.batch_constants(),
                    jnp.asarray(indices), jnp.asarray(mask_nerf), None,
                )
                outputs = render_in_chunks(eval_step, self.params, batch, chunk)
                if save_loss_maps:
                    values, maps = self._val_loss_step_maps(batch, outputs, weights)
                else:
                    values, maps = self._val_loss_step(batch, outputs, weights), {}
                for name, v in values.items():
                    totals[name] = totals.get(name, 0.0) + float(v)
                finest = "fine" if "rgb_fine" in outputs else "coarse"
                target = np.asarray(pp.images[np.where(pp.frame_nums == frame_num)[0].item()])
                frame_mse = float(
                    np.mean(
                        (np.asarray(outputs[f"rgb_{finest}"], np.float32).reshape(h, w, 3) - target)
                        ** 2
                    )
                )
                # Mean of per-frame PSNRs (the usual convention and the QA
                # suite's aggregation), not PSNR of the mean MSE.
                psnr_sum += -10.0 * np.log10(max(frame_mse, 1e-12))

                for mode in ("coarse", "fine"):
                    if f"rgb_{mode}" not in outputs:
                        continue
                    pred = np.asarray(outputs[f"rgb_{mode}"], np.float32).reshape(h, w, 3)
                    io.write_image(
                        samples_dir / f"predicted_frames/{frame_num:04}_{mode}_Iter{iteration:05}.png",
                        np.round(np.clip(pred, 0, 1) * 255).astype(np.uint8),
                    )
                    io.write_depth(
                        samples_dir / f"predicted_depths/{frame_num:04}_{mode}_Iter{iteration:05}",
                        np.asarray(outputs[f"depth_{mode}"], np.float32).reshape(h, w),
                    )
                    io.write_depth(
                        samples_dir / f"predicted_depths_variance/{frame_num:04}_{mode}_Iter{iteration:05}",
                        np.asarray(outputs[f"depth_var_{mode}"], np.float32).reshape(h, w),
                    )
                    for ndc_key, sub in (
                        (f"depth_ndc_{mode}", "predicted_depths"),
                        (f"depth_var_ndc_{mode}", "predicted_depths_variance"),
                    ):
                        if ndc_key in outputs:
                            io.write_depth(
                                samples_dir / f"{sub}/{frame_num:04}_{mode}_ndc_Iter{iteration:05}",
                                np.asarray(outputs[ndc_key], np.float32).reshape(h, w),
                            )
                    vis2_key = f"visibility2_{mode}"
                    if vis2_key in outputs:
                        vis2 = np.asarray(outputs[vis2_key], np.float32)
                        others = [f for f in frame_nums if f != frame_num]
                        for j, sec in enumerate(others[: vis2.shape[1]]):
                            io.write_depth(
                                samples_dir
                                / f"predicted_visibilities/{frame_num:04}_{sec:04}_{mode}_Iter{iteration:05}",
                                vis2[:, j].reshape(h, w),
                            )
                if save_loss_maps:
                    for map_name, loss_map in maps.items():
                        io.write_depth(
                            samples_dir / f"Losses/{map_name}_{frame_num:04}_Iter{iteration:05}",
                            np.asarray(loss_map, np.float32).reshape(h, w),
                        )

            n = max(len(frame_nums), 1)
            scalars = {f"validation/{tag}/{k}": v / n for k, v in totals.items()}
            scalars[f"validation/{tag}/psnr"] = psnr_sum / n
            self.logger.log_scalars(iteration, scalars)


def build_eval_renderer(render_cfg: renderer.RenderConfig, sec_views_vis: bool = False):
    """Jitted deterministic eval render of stacked ray chunks.

    Takes {key: (num_chunks, chunk, d)} and lax.maps the per-chunk render,
    so a full frame (or a whole video pose) is ONE device dispatch — chunk
    size bounds live memory, not dispatch count. (Per-chunk dispatch costs
    ~25 ms RTT on relay-attached TPUs; a 762k-ray LLFF frame is 12 chunks.)
    """

    def render_chunk(params, ray_chunk):
        return renderer.render_rays(
            params, render_cfg, ray_chunk, train=False, keep_per_sample=False,
            sec_views_vis=sec_views_vis,
        )

    def eval_step(params, stacked):
        return jax.lax.map(lambda rc: render_chunk(params, rc), stacked)

    return jax.jit(eval_step)


RAY_KEYS = (
    "rays_o", "rays_d", "view_dirs", "near", "far",
    "rays_o_ndc", "rays_d_ndc", "near_ndc", "far_ndc", "rays_o2",
)


def render_in_chunks(eval_step, params, ray_batch: dict, chunk: int) -> dict:
    """Full-image render: pad rays to a chunk multiple, loop one jitted chunk
    program (single compilation), concatenate, trim.

    The reference's serial `batchify_rays` python loop (SimpleNeRF01.py:81-106)
    with chunking as a *memory* knob; here the chunk is sized to keep the TPU
    busy (default 64k rays -> 12M samples in flight).
    """
    rays = {k: v for k, v in ray_batch.items() if k in RAY_KEYS}
    nr = rays["rays_o"].shape[0]
    chunk = min(chunk, max(-(-nr // 256) * 256, 256))
    num_chunks = -(-nr // chunk)
    padded = num_chunks * chunk
    if padded != nr:
        rays = {k: jnp.concatenate([v, jnp.repeat(v[-1:], padded - nr, axis=0)]) for k, v in rays.items()}
    stacked = {k: v.reshape(num_chunks, chunk, *v.shape[1:]) for k, v in rays.items()}
    out = eval_step(params, stacked)
    return {k: v.reshape(padded, *v.shape[2:])[:nr] for k, v in out.items()}
