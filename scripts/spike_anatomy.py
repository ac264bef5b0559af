"""Spike anatomy: which rays, which loss, and is it the NDC z->1 pole?

VERDICT r2 item 1: if the full recipe still loses the RGB headline,
root-cause the late-training consistency spikes with evidence. This loads
selected snapshots of a finished full-recipe run, renders every TRAIN frame
in TRAIN mode (so the augmented-model outputs and therefore the
PointsAugmentation/ViewsAugmentation consistency losses exist — they are
absent from eval renders), computes the full per-ray loss-map set
(LossComputer `return_loss_maps`), and reports per snapshot x frame x loss:

  - the top-5 loss-map pixels and the MAIN-fine / aug-fine metric depth at
    those pixels, in units of the scene far plane (the pole test: the
    NDC z->1 pole maps to metric depth >> far, depth = 1/(1-z+1e-6) as in
    geometry/projection.py and the reference's ndc2world)
  - the fraction of pixels whose fine depth exceeds 1x / 2x / 10x far
    (2x far is the round-3 `depth_clip` guard threshold)

Run after the ablation study (the chip must be otherwise idle):
  ABLATION_ROOT=/tmp/ablation_r3_100k ANATOMY_ITERS=20000,30000,60000,100000 \
  nohup python -c "exec(open('scripts/spike_anatomy.py').read())" \
      > /tmp/spike_anatomy.log 2>&1 &
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
from simplenerf_tpu.losses.computer import LossComputer
from simplenerf_tpu.render import renderer
from simplenerf_tpu.training import checkpoints
from simplenerf_tpu.training.trainer import RAY_KEYS, loss_context_from_configs

ROOT = Path(os.environ.get("ABLATION_ROOT", "/tmp/ablation_r3_100k"))
DB = ROOT / "db"
TRAIN_NUM = int(os.environ.get("ANATOMY_TRAIN_NUM", "11"))
SCENE = os.environ.get("ANATOMY_SCENE", "blobs")
ITERS = [int(x) for x in os.environ.get("ANATOMY_ITERS", "20000,30000,60000,100000").split(",")]
CHUNK = int(os.environ.get("ANATOMY_CHUNK", "4096"))
TOPK = 5


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


run_dir = ROOT / f"runs/training/train{TRAIN_NUM:04}"
cfg = config_lib.load_configs(run_dir / "Configs.json")
cfg["data_loader"]["scene_id"] = SCENE
raw = get_data_loader(cfg, DB, "train").load_data()
pp = ScenePreprocessor(cfg, "train", raw, seed=cfg.get("seed", 0))
render_cfg = config_lib.render_config_from_dict(cfg)
loss_computer = LossComputer(cfg["losses"], loss_context_from_configs(cfg))
h, w = pp.resolution
params_target = renderer.init(jax.random.PRNGKey(0), render_cfg)
models_dir = run_dir / SCENE / "saved_models"


@jax.jit
def train_mode_chunks(params, stacked, key):
    def render_chunk(args):
        rays, k = args
        return renderer.render_rays(
            params, render_cfg, rays, key=k, train=True, keep_per_sample=False
        )

    keys = jax.random.split(key, stacked["rays_o"].shape[0])
    return jax.lax.map(render_chunk, (stacked, keys))


@jax.jit
def loss_maps_full(batch, outputs, weights):
    total, values, maps = loss_computer.compute(batch, outputs, weights, return_loss_maps=True)
    return values, maps


def render_frame_train_mode(params, batch, key):
    rays = {k: v for k, v in batch.items() if k in RAY_KEYS}
    nr = rays["rays_o"].shape[0]
    num_chunks = -(-nr // CHUNK)
    padded = num_chunks * CHUNK
    if padded != nr:
        rays = {
            k: jnp.concatenate([v, jnp.repeat(v[-1:], padded - nr, axis=0)])
            for k, v in rays.items()
        }
    stacked = {k: v.reshape(num_chunks, CHUNK, *v.shape[1:]) for k, v in rays.items()}
    out = train_mode_chunks(params, stacked, key)
    return {k: v.reshape(padded, *v.shape[2:])[:nr] for k, v in out.items()}


report = {}
for iteration in ITERS:
    ckpt = models_dir / f"Model_Iter{iteration:06}.msgpack"
    if not ckpt.exists():
        log(f"skip {iteration}: no {ckpt.name}")
        continue
    _, params, _ = checkpoints.load_checkpoint(ckpt, params_target)
    weights = jnp.asarray(loss_computer.weights_vector(iteration))
    snap = {}
    for frame_num in [int(f) for f in pp.frame_nums]:
        indices, mask_nerf, _ = pp.next_indices(0, image_num=frame_num)
        batch = gather_batch(
            pp.cache, pp.common, pp.batch_constants(),
            jnp.asarray(indices), jnp.asarray(mask_nerf), None,
        )
        outputs = render_frame_train_mode(params, batch, jax.random.fold_in(jax.random.PRNGKey(7), iteration))
        values, maps = loss_maps_full(batch, outputs, weights)
        far = float(np.asarray(batch["far"])[0, 0])

        frame_rep = {"losses": {k: round(float(v), 5) for k, v in values.items()}}
        depth_fine = np.asarray(outputs["depth_fine"], np.float32).reshape(-1)
        for thresh, tag in ((1.0, "gt_far"), (2.0, "gt_2far"), (10.0, "gt_10far")):
            frame_rep[f"frac_depth_{tag}"] = round(
                float(np.mean(depth_fine > thresh * far)), 6
            )
        frame_rep["max_depth_over_far"] = round(float(depth_fine.max() / far), 2)

        per_loss = {}
        for map_name, loss_map in maps.items():
            m = np.asarray(loss_map, np.float32).reshape(-1)
            if not np.any(m > 0):
                continue
            top = np.argsort(m)[::-1][:TOPK]
            entry = {
                "top_vals": [round(float(m[i]), 4) for i in top],
                "pix": [[int(i // w), int(i % w)] for i in top],
                "fine_depth_over_far": [
                    round(float(depth_fine[i] / far), 3) for i in top
                ],
            }
            for aug in ("points_augmentation", "views_augmentation"):
                k = f"{aug}_depth_coarse"
                if k in outputs and aug.split("_")[0] in map_name.lower():
                    d = np.asarray(outputs[k], np.float32).reshape(-1)
                    entry[f"{aug}_depth_over_far"] = [
                        round(float(d[i] / far), 3) for i in top
                    ]
            per_loss[map_name] = entry
        frame_rep["maps"] = per_loss
        snap[frame_num] = frame_rep
        log(f"iter {iteration} frame {frame_num}: "
            + json.dumps({k: v for k, v in frame_rep.items() if k != 'maps'}))
    report[iteration] = snap

out_path = ROOT / "spike_anatomy.json"
out_path.write_text(json.dumps(report, indent=2))
log(f"DONE -> {out_path}")
print(json.dumps(report, indent=2))
