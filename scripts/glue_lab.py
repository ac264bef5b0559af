"""Glue lab: attribute the ~11 ms of non-kernel step time.

breakdown_tpu.py (post PE-outside): render-minus-kernels 2.25 ms fwd,
losses 1.17 ms fwd, non-kernel backward ~5.4 ms, step-minus-grad 2.9 ms.
Subtraction experiments, all scanned REPS with host-read sync:

  grad_full      — value_and_grad of the 9-loss objective (reference point)
  grad_mse_only  — same render, losses = MSE01+SparseDepthMSE01 only
                   (difference = the 7 consistency/aug losses fwd+bwd)
  grad_render    — grad of a plane-sum WITHOUT losses/compositing teach
                   (kernels + sampling + compositing fwd/bwd only)
  adam_only      — optax.adam update on ready grads, scanned
  gather_only    — gather_batch from the device cache, scanned

Run: nohup python -c "exec(open('scripts/glue_lab.py').read())" > /tmp/glue_lab.log 2>&1 &
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simplenerf_tpu import config as config_lib
from simplenerf_tpu.data import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor, gather_batch
from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers.presets import simplenerf_config
from simplenerf_tpu.losses import LossComputer
from simplenerf_tpu.render import renderer
from simplenerf_tpu.training import trainer as trainer_lib

REPS = 20


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(name, program):
    np.asarray(program())
    t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
    ms = dt / REPS * 1e3
    log(f"{name:14s} {ms:8.2f} ms")
    return round(ms, 3)


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


root = Path("/tmp/breakdown_db")
generate_scene(root, scene_name="blobs", num_frames=3, h=189, w=252, num_train=3, seed=0)
cfg = simplenerf_config(scene_id="blobs", num_iterations=20000, compute_dtype="bfloat16", seed=0)
raw = get_data_loader(cfg, root, "train").load_data()
pp = ScenePreprocessor(cfg, "train", raw, seed=0)
render_cfg = config_lib.render_config_from_dict(cfg, "bfloat16")
lc_full = LossComputer(cfg["losses"], trainer_lib.loss_context_from_configs(cfg))
mse_specs = [s for s in cfg["losses"] if s["name"] in ("MSE01", "SparseDepthMSE01")]
lc_mse = LossComputer(mse_specs, trainer_lib.loss_context_from_configs(cfg))
w_full = jnp.asarray(lc_full.weights_vector(15000))
w_mse = jnp.asarray(lc_mse.weights_vector(15000))

consts = pp.batch_constants()
indices, mask_nerf, mask_sd = pp.next_indices(0)
batch = gather_batch(pp.cache, pp.common, consts,
                     jnp.asarray(indices), jnp.asarray(mask_nerf), jnp.asarray(mask_sd))
key0 = jax.random.PRNGKey(7)
params = renderer.init(jax.random.PRNGKey(0), render_cfg)

results = {}


def grad_body(lc, weights):
    def body(x):
        key = jax.random.fold_in(key0, x.astype(jnp.uint32))
        b = dict(batch)
        b["rays_o"] = b["rays_o"] + x * 1e-7

        def f(p):
            out = renderer.render_rays(p, render_cfg, b, key, train=True)
            total, _ = lc.compute(b, out, weights)
            return total

        v, g = jax.value_and_grad(f)(params)
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
    return body


results["grad_full"] = timed("grad_full", scan_reps(grad_body(lc_full, w_full)))
results["grad_mse_only"] = timed("grad_mse_only", scan_reps(grad_body(lc_mse, w_mse)))


def grad_render_body(x):
    key = jax.random.fold_in(key0, x.astype(jnp.uint32))
    b = dict(batch)
    b["rays_o"] = b["rays_o"] + x * 1e-7

    def f(p):
        out = renderer.render_rays(p, render_cfg, b, key, train=True)
        return sum(
            jnp.sum(out[k].astype(jnp.float32))
            for k in out
            if k.startswith(("rgb_", "depth_", "points_augmentation_", "views_augmentation_"))
            and "var" not in k
        )

    v, g = jax.value_and_grad(f)(params)
    return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))


results["grad_render"] = timed("grad_render", scan_reps(grad_render_body))

opt = optax.adam(5e-4)
opt_state = opt.init(params)
grads = jax.grad(
    lambda p: lc_full.compute(
        batch, renderer.render_rays(p, render_cfg, batch, key0, train=True), w_full
    )[0]
)(params)


def adam_program():
    def wrapped(carry, x):
        p, s = carry
        g = jax.tree.map(lambda a: a + x * 1e-9, grads)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), None
    (p, _), _ = jax.lax.scan(wrapped, (params, opt_state), jnp.arange(REPS, dtype=jnp.float32))
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(p))


results["adam_only"] = timed("adam_only", jax.jit(adam_program))


def gather_body(x):
    idx = (jnp.asarray(indices) + x.astype(jnp.uint32)) % pp.cache["rays_o"].shape[0]
    b = gather_batch(pp.cache, pp.common, consts, idx,
                     jnp.asarray(mask_nerf), jnp.asarray(mask_sd))
    return sum(
        jnp.sum(v.astype(jnp.float32))
        for k, v in b.items()
        if k != "common" and hasattr(v, "dtype")
    )


results["gather_only"] = timed("gather_only", scan_reps(gather_body))

results["derived"] = {
    "consistency/aug losses fwd+bwd (full - mse_only)": round(
        results["grad_full"] - results["grad_mse_only"], 2),
    "losses total fwd+bwd (full - render)": round(
        results["grad_full"] - results["grad_render"], 2),
}
print(json.dumps(results, indent=2))
