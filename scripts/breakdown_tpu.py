"""Per-component train-step breakdown on the real TPU chip.

Times, at the published workload shape (4096 rays, 64 coarse + 192 fine
union samples, 4 MLPs, 9 losses), each layer of the step independently:

  fine_fwd / fine_fwdbwd       — fine-model fused Pallas kernel
  ens_fwd / ens_fwdbwd         — stacked coarse-ensemble kernel (3 members)
  render_fwd                   — full render_rays(train=True)
  loss_fwd                     — render + 9-loss stack
  grad                         — value_and_grad of the full objective
  step                         — production scanned train step (gather+Adam)

Every timing amortizes the ~25 ms relay dispatch over a lax.scan of REPS
in one program and synchronizes with a host read (np.asarray) — see
CLAUDE.md "Performance model". Inputs are perturbed per rep from the scan
xs so XLA cannot hoist the body (Pallas calls are never hoisted, but the
XLA-native sampling/compositing/losses would be).

Run in the background from the repo root:
  nohup python -c "exec(open('scripts/breakdown_tpu.py').read())" \
      > /tmp/breakdown_r2.log 2>&1 &
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
from simplenerf_tpu.fields import mlp as mlp_lib
from simplenerf_tpu.losses import LossComputer
from simplenerf_tpu.render import renderer
from simplenerf_tpu.training import trainer as trainer_lib

# REPS=20 carries a +1.14 ms/rep dispatch bias (labs 11e/12: ~23 ms relay
# RTT / scan length); REPS>=100 brings it under 0.25 ms/rep.
REPS = int(os.environ.get("BREAKDOWN_REPS", "100"))
NR = 4096
NS_COARSE = 64
NS_FINE = 192  # 64 coarse + 128 importance (union)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(name, program, flops=None):
    """program: jitted, returns a small array; runs REPS internally."""
    out = program()
    np.asarray(out)  # compile + warmup
    t0 = time.perf_counter()
    out = program()
    np.asarray(out)
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = program()
    np.asarray(out)
    dt = min(dt1, time.perf_counter() - t0)
    ms = dt / REPS * 1e3
    tf = (flops / (dt / REPS)) / 1e12 if flops else None
    log(f"{name:14s} {ms:8.2f} ms" + (f"  {tf:7.1f} TFLOPS(real)" if tf else ""))
    return {"ms": round(ms, 3), **({"tflops": round(tf, 1)} if tf else {})}


def mlp_flops(cfg: mlp_lib.MLPConfig, n: int, mult: int) -> float:
    """Same accounting as ops.fused_mlp cost estimates (trunk only)."""
    w, d, pe = cfg.points_net_width, cfg.points_net_depth, cfg.points_pe_degree
    return mult * n * w * (w * (d - 1) + 6 * pe + 3)


def main():
    root = Path("/tmp/breakdown_db")
    generate_scene(root, scene_name="blobs", num_frames=3, h=189, w=252, num_train=3, seed=0)
    cfg = simplenerf_config(scene_id="blobs", num_iterations=20000, compute_dtype="bfloat16", seed=0)
    cfg["steps_per_call"] = REPS
    raw = get_data_loader(cfg, root, "train").load_data()
    pp = ScenePreprocessor(cfg, "train", raw, seed=0)
    render_cfg = config_lib.render_config_from_dict(cfg, "bfloat16")
    lc = LossComputer(cfg["losses"], trainer_lib.loss_context_from_configs(cfg))
    weights = jnp.asarray(lc.weights_vector(15000))  # steady state: all 9 active

    t = trainer_lib.Trainer(cfg, Path("/tmp/breakdown_run"), pp)
    params = t.params
    consts = pp.batch_constants()
    indices, mask_nerf, mask_sd = pp.next_indices(0)
    batch = gather_batch(
        pp.cache, pp.common, consts,
        jnp.asarray(indices), jnp.asarray(mask_nerf), jnp.asarray(mask_sd),
    )
    key0 = jax.random.PRNGKey(7)

    results = {}

    # --- raw kernels at synthetic points --------------------------------
    pts_f = jax.random.uniform(key0, (NR * NS_FINE, 3), jnp.float32, -1.0, 1.0)
    pts_c = pts_f[: NR * NS_COARSE]
    vd = batch["view_dirs"]
    fine_cfg = render_cfg.fine_mlp
    ens_members = [
        ("coarse", render_cfg.coarse_mlp),
        ("points_aug_coarse", render_cfg.points_aug_coarse_mlp),
        ("views_aug_coarse", render_cfg.views_aug_coarse_mlp),
    ]

    def scan_reps(body):
        def program():
            def wrapped(carry, x):
                return carry + body(x), None
            out, _ = jax.lax.scan(
                wrapped, jnp.zeros((), jnp.float32), jnp.arange(REPS, dtype=jnp.float32)
            )
            return out
        return jax.jit(program)

    def fine_fwd_body(x):
        out = mlp_lib.apply_fused(
            params["fine"], fine_cfg, pts_f + x * 1e-6, view_dirs=vd,
            dtype=render_cfg.dtype, view_dirs_tile=NS_FINE,
        )
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(out))

    results["fine_fwd"] = timed(
        "fine_fwd", scan_reps(fine_fwd_body), flops=mlp_flops(fine_cfg, NR * NS_FINE, 2)
    )

    def fine_fwdbwd_body(x):
        def f(p):
            out = mlp_lib.apply_fused(
                p, fine_cfg, pts_f + x * 1e-6, view_dirs=vd,
                dtype=render_cfg.dtype, view_dirs_tile=NS_FINE,
            )
            return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(out))
        v, g = jax.value_and_grad(f)(params["fine"])
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))

    results["fine_fwdbwd"] = timed(
        "fine_fwdbwd", scan_reps(fine_fwdbwd_body), flops=mlp_flops(fine_cfg, NR * NS_FINE, 8)
    )

    def ens_fwd_body(x):
        nets = mlp_lib.apply_fused_ensemble(
            [(params[n], c) for n, c in ens_members],
            pts_c + x * 1e-6, view_dirs=vd, dtype=render_cfg.dtype, view_dirs_tile=NS_COARSE,
        )
        return sum(
            jnp.sum(v.astype(jnp.float32)) for net in nets for v in jax.tree_util.tree_leaves(net)
        )

    ens_flops = sum(mlp_flops(c, NR * NS_COARSE, 2) for _, c in ens_members)
    results["ens_fwd"] = timed("ens_fwd", scan_reps(ens_fwd_body), flops=ens_flops)

    def ens_fwdbwd_body(x):
        def f(ps):
            nets = mlp_lib.apply_fused_ensemble(
                [(p, c) for p, (_, c) in zip(ps, ens_members)],
                pts_c + x * 1e-6, view_dirs=vd, dtype=render_cfg.dtype, view_dirs_tile=NS_COARSE,
            )
            return sum(
                jnp.sum(v.astype(jnp.float32))
                for net in nets for v in jax.tree_util.tree_leaves(net)
            )
        v, g = jax.value_and_grad(f)([params[n] for n, _ in ens_members])
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))

    results["ens_fwdbwd"] = timed("ens_fwdbwd", scan_reps(ens_fwdbwd_body), flops=ens_flops * 4)

    # --- full render / loss / grad on the real batch --------------------
    def render_body(x):
        key = jax.random.fold_in(key0, x.astype(jnp.uint32))
        b = dict(batch)
        b["rays_o"] = b["rays_o"] + x * 1e-7
        out = renderer.render_rays(params, render_cfg, b, key, train=True)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(out))

    results["render_fwd"] = timed("render_fwd", scan_reps(render_body))

    def loss_body(x):
        key = jax.random.fold_in(key0, x.astype(jnp.uint32))
        b = dict(batch)
        b["rays_o"] = b["rays_o"] + x * 1e-7
        out = renderer.render_rays(params, render_cfg, b, key, train=True)
        total, _ = lc.compute(b, out, weights)
        return total

    results["loss_fwd"] = timed("loss_fwd", scan_reps(loss_body))

    def grad_body(x):
        key = jax.random.fold_in(key0, x.astype(jnp.uint32))
        b = dict(batch)
        b["rays_o"] = b["rays_o"] + x * 1e-7

        def f(p):
            out = renderer.render_rays(p, render_cfg, b, key, train=True)
            total, _ = lc.compute(b, out, weights)
            return total

        v, g = jax.value_and_grad(f)(params)
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))

    results["grad"] = timed("grad", scan_reps(grad_body))

    # --- production step (scan of REPS real steps) ----------------------
    def step_program():
        values = t.train_many(0, REPS)
        return values["TotalLoss"]

    results["step"] = timed("step", step_program)

    # Derived
    results["derived"] = {
        "sampling+compositing+glue (render - kernels fwd)": round(
            results["render_fwd"]["ms"] - results["fine_fwd"]["ms"] - results["ens_fwd"]["ms"], 2
        ),
        "losses (loss - render)": round(results["loss_fwd"]["ms"] - results["render_fwd"]["ms"], 2),
        "backward total (grad - loss)": round(results["grad"]["ms"] - results["loss_fwd"]["ms"], 2),
        "adam+gather+logging (step - grad)": round(results["step"]["ms"] - results["grad"]["ms"], 2),
        "rays_per_s_step": round(NR / (results["step"]["ms"] / 1e3), 1),
    }
    print(json.dumps(results, indent=2))


main()
