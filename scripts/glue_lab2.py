"""Round-4 glue lab: dispatch-debiased per-piece costs + rooflines.

VERDICT r3 weak #1: the ~11.7 ms of non-kernel step time entered the 77k
rays/s ceiling as a measured constant. This lab prices every glue piece
separately at REPS=100 (residual dispatch bias 0.23 ms subtracted — lab
11e) and emits a bytes-touched roofline per piece (v5e HBM ~819 GB/s), so
the ceiling has no silent constants: each piece is either within ~20% of
its memory bound or is an attack target.

Pieces (production shapes: 4096 rays, 64 coarse + 192 union samples, bf16
render config, real scene batch):
  gather          gather_batch from the packed device cache
  strat64         stratified coarse z_vals + (nr,64,3) point formation
  fine_union      fine_z_vals = sample_pdf (128) + union sort to 192
  sort_only       jnp.sort of the (4096,192) union (isolated)
  comp_fine       volume.composite on fine planes (fwd)
  comp_fine_fb    ... + backward to sigma/rgb planes
  losses_fwd      full 9-loss stack given render outputs (fwd)
  losses_fb       ... + backward to the render outputs
  adam_flat       flat-vector Adam on production-shaped grads
All big arrays are jit ARGUMENTS (no closure constants — round-3 lesson).

Run (chip idle):
  nohup python -c "exec(open('scripts/glue_lab2.py').read())" \
      > /tmp/glue_lab2.log 2>&1 &
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

from simplenerf_tpu import config as config_lib
from simplenerf_tpu.data import get_data_loader
from simplenerf_tpu.data.preprocessor import ScenePreprocessor, gather_batch
from simplenerf_tpu.data.synthetic import generate_scene
from simplenerf_tpu.drivers.presets import simplenerf_config
from simplenerf_tpu.losses import LossComputer
from simplenerf_tpu.render import renderer, sampling, volume
from simplenerf_tpu.training import trainer as trainer_lib

REPS = int(os.environ.get("LAB_REPS", "100"))
RESIDUAL_MS = 23.0 / REPS  # dispatch RTT / reps (lab 11e)
HBM_GBPS = 819.0  # v5e


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


results = {"reps": REPS}


def timed(name, program, args, bytes_touched=None):
    """program: jitted scan-of-REPS fn(*args) -> scalar. Times 3 runs, keeps
    the min, subtracts the residual dispatch bias, attaches the roofline."""
    try:
        np.asarray(program(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(program(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / REPS * 1e3 - RESIDUAL_MS
        entry = {"ms": round(ms, 3)}
        if bytes_touched is not None:
            roof = bytes_touched / (HBM_GBPS * 1e9) * 1e3
            entry["roofline_ms"] = round(roof, 4)
            entry["x_roofline"] = round(ms / roof, 1) if roof > 0 else None
            entry["MB"] = round(bytes_touched / 1e6, 1)
        results[name] = entry
        log(f"{name:14s} {ms:8.3f} ms   " +
            (f"roof {entry['roofline_ms']:7.3f} ms  ({entry['x_roofline']}x)"
             if bytes_touched else ""))
    except Exception as e:  # noqa: BLE001 — lab must report every piece
        log(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        results[name] = {"error": str(e)[:160]}


def scan_reps(body):
    """body(x, *args) -> scalar; scanned REPS times inside one dispatch."""
    def program(*args):
        def wrapped(c, x):
            return c + body(x, *args), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


def nbytes(tree):
    return sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "dtype"))


# ---------------------------------------------------------------- setup
# LAB_SMALL=1: tiny CPU smoke of the whole lab (validates every piece's API
# without chip time; numbers are meaningless there).
SMALL = os.environ.get("LAB_SMALL", "0") == "1"
root = Path("/tmp/breakdown_db_small" if SMALL else "/tmp/breakdown_db")
if SMALL:
    generate_scene(root, scene_name="blobs", num_frames=3, h=24, w=32,
                   num_train=3, seed=0)
    cfg = simplenerf_config(scene_id="blobs", num_iterations=20000,
                            compute_dtype="bfloat16", seed=0,
                            num_rays=64, sparse_depth_rays=64,
                            num_samples_coarse=16, num_samples_fine=32,
                            mlp_depth=2, mlp_width=64, views_width=32)
else:
    generate_scene(root, scene_name="blobs", num_frames=3, h=189, w=252,
                   num_train=3, seed=0)
    cfg = simplenerf_config(scene_id="blobs", num_iterations=20000,
                            compute_dtype="bfloat16", seed=0)
raw = get_data_loader(cfg, root, "train").load_data()
pp = ScenePreprocessor(cfg, "train", raw, seed=0)
render_cfg = config_lib.render_config_from_dict(cfg, "bfloat16")
lc = LossComputer(cfg["losses"], trainer_lib.loss_context_from_configs(cfg))
weights = jnp.asarray(lc.weights_vector(15000))

consts = pp.batch_constants()
layout = getattr(pp, "packed_layout", ())
idx_np, mask_nerf_np, mask_sd_np = pp.next_indices(0)
indices = jnp.asarray(idx_np)
mask_nerf = jnp.asarray(mask_nerf_np)
mask_sd = jnp.asarray(mask_sd_np)
batch = gather_batch(pp.cache, pp.common, consts, indices, mask_nerf, mask_sd,
                     packed_layout=layout)
key0 = jax.random.PRNGKey(7)
params = renderer.init(jax.random.PRNGKey(0), render_cfg)
outputs = jax.jit(
    lambda p, b, k: renderer.render_rays(p, render_cfg, b, k, train=True)
)(params, batch, key0)
outputs = jax.tree.map(lambda x: x, outputs)  # materialize

NR = cfg["data_loader"]["num_rays"] + cfg["data_loader"]["sparse_depth"]["num_rays"]
NS_C = cfg["model"]["coarse_mlp"]["num_samples"]
NS_F = cfg["model"]["fine_mlp"]["num_samples"]
NS_U = NS_C + NS_F

near = batch["near_ndc"] if render_cfg.ndc else batch["near"]
far = batch["far_ndc"] if render_cfg.ndc else batch["far"]
z_coarse = np.asarray(outputs["z_vals_coarse"])
w_coarse = np.asarray(outputs["weights_coarse"], np.float32)
z_union = np.asarray(outputs["z_vals_fine"])
sigma_fine = jnp.asarray(np.asarray(outputs["raw_sigma_fine"], np.float32))
rgb_fine = jnp.asarray(
    np.asarray(outputs["raw_rgb_fine"], np.float32).transpose(2, 0, 1)
)  # back to (3, nr, ns) planes
z_coarse = jnp.asarray(z_coarse)
w_coarse = jnp.asarray(w_coarse)
z_union = jnp.asarray(z_union)

# ---------------------------------------------------------------- pieces
cache_n = pp.cache["rays_o"].shape[0] if "rays_o" in pp.cache else (
    next(iter(pp.cache.values())).shape[0])


def gather_body(x, cache, common, idx, mn, ms):
    i = (idx + x.astype(jnp.int32)) % cache_n
    b = gather_batch(cache, common, consts, i, mn, ms, packed_layout=layout)
    return sum(jnp.sum(v.astype(jnp.float32)) for k, v in b.items()
               if k != "common" and hasattr(v, "dtype"))


timed("gather", scan_reps(gather_body),
      (pp.cache, pp.common, indices, mask_nerf, mask_sd),
      bytes_touched=2 * nbytes(batch) - nbytes(pp.common))


def strat_body(x, near_, far_, ro, rd):
    k = jax.random.fold_in(key0, x.astype(jnp.uint32))
    z = sampling.stratified_z_vals(k, near_ + x * 1e-9, far_, NS_C,
                                  render_cfg.lindisp, True)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    return jnp.sum(z) + jnp.sum(pts)


o_key = "rays_o_ndc" if render_cfg.ndc else "rays_o"
d_key = "rays_d_ndc" if render_cfg.ndc else "rays_d"
timed("strat64", scan_reps(strat_body),
      (near, far, batch[o_key], batch[d_key]),
      bytes_touched=4 * (NR * NS_C * 4 + NR * NS_C * 3 * 4))


def fine_body(x, zc, wc):
    k = jax.random.fold_in(key0, x.astype(jnp.uint32))
    z = sampling.fine_z_vals(k, zc + x * 1e-9, wc, NS_F, True)
    return jnp.sum(z)


timed("fine_union", scan_reps(fine_body), (z_coarse, w_coarse),
      bytes_touched=2 * NR * NS_C * 4 + 2 * NR * NS_U * 4)


def sort_body(x, z):
    return jnp.sum(jnp.sort(z + x * 1e-9, axis=-1))


timed("sort_only", scan_reps(sort_body), (z_union,),
      bytes_touched=2 * NR * NS_U * 4)


def comp_body(x, sig, rgb, z, rd, ro_w, rd_w):
    comp = volume.composite(sig + x * 1e-9, rgb, z, rd, ndc=render_cfg.ndc,
                            rays_o_world=ro_w, rays_d_world=rd_w,
                            white_bkgd=render_cfg.white_bkgd)
    return sum(jnp.sum(v.astype(jnp.float32)) for v in comp.values())


comp_args = (sigma_fine, rgb_fine, z_union, batch[d_key],
             batch["rays_o"] if render_cfg.ndc else None,
             batch["rays_d"] if render_cfg.ndc else None)
COMP_BYTES = (4 * NR * NS_U * 4  # sigma+rgb in
              + NR * NS_U * 4    # z in
              + 2 * NR * NS_U * 4  # weights/alpha out
              + 8 * NR * 4)      # per-ray outs
timed("comp_fine", scan_reps(comp_body), comp_args, bytes_touched=COMP_BYTES)


def comp_fb_body(x, sig, rgb, z, rd, ro_w, rd_w):
    def f(s, r):
        comp = volume.composite(s, r, z, rd, ndc=render_cfg.ndc,
                                rays_o_world=ro_w, rays_d_world=rd_w,
                                white_bkgd=render_cfg.white_bkgd)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in comp.values())
    v, (gs, gr) = jax.value_and_grad(f, argnums=(0, 1))(sig + x * 1e-9, rgb)
    return v + jnp.sum(gs) + jnp.sum(gr)


timed("comp_fine_fb", scan_reps(comp_fb_body), comp_args,
      bytes_touched=3 * COMP_BYTES)


def losses_fwd_body(x, b, out, w):
    out = dict(out)
    out["depth_fine"] = out["depth_fine"] + x * 1e-9
    total, _ = lc.compute(b, out, w)
    return total


timed("losses_fwd", scan_reps(losses_fwd_body), (batch, outputs, weights),
      bytes_touched=nbytes(outputs) // 3)


def losses_fb_body(x, b, out, w):
    diff = {k: v for k, v in out.items()
            if v.dtype.kind == "f" and not k.startswith("raw_")}
    rest = {k: v for k, v in out.items() if k not in diff}

    def f(d):
        merged = dict(rest)
        merged.update(d)
        total, _ = lc.compute(b, merged, w)
        return total

    diff = dict(diff)
    diff["depth_fine"] = diff["depth_fine"] + x * 1e-9
    v, g = jax.value_and_grad(f)(diff)
    return v + sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))


timed("losses_fb", scan_reps(losses_fb_body), (batch, outputs, weights),
      bytes_touched=nbytes(outputs))

# Adam on production-shaped grads (flat-vector path, state carried in-scan).
lr = trainer_lib.make_lr_schedule(cfg["optimizer"], cfg["num_iterations"])
opt, _ = trainer_lib.flat_adam(lr)
opt_state = opt.init(params)
grads = jax.jit(jax.grad(
    lambda p, b, k, w: lc.compute(
        b, renderer.render_rays(p, render_cfg, b, k, train=True), w)[0]
))(params, batch, key0, weights)
import optax  # noqa: E402


def adam_program(p0, s0, g):
    def wrapped(carry, x):
        p, s = carry
        g2 = jax.tree.map(lambda a: a + x * 1e-12, g)
        updates, s = opt.update(g2, s, p)
        return (optax.apply_updates(p, updates), s), None
    (p, _), _ = jax.lax.scan(wrapped, (p0, s0), jnp.arange(REPS, dtype=jnp.float32))
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(p))


PBYTES = nbytes(params)
timed("adam_flat", jax.jit(adam_program), (params, opt_state, grads),
      bytes_touched=7 * PBYTES)  # read p,m,v,g; write p,m,v

glue_total = sum(v["ms"] for k, v in results.items()
                 if isinstance(v, dict) and "ms" in v
                 and k in ("gather", "strat64", "fine_union", "comp_fine",
                           "losses_fwd", "adam_flat"))
results["derived"] = {
    "fwd_glue_sum_ms": round(glue_total, 2),
    "note": "comp for 3 coarse members ~ comp_fine * 3 * (64/192); "
            "bwd glue = losses_fb-losses_fwd + comp_fine_fb-comp_fine scaled",
}
print(json.dumps(results, indent=2))
