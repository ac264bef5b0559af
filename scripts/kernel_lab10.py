"""Round-3 kernel lab 10: A/B the production forward knobs on chip.

Times the production fine-forward and coarse-ensemble-forward (the two
passes lab8 showed are overhead-bound at 95/117 TFLOPS vs the 175 marginal
rate) under the env knobs added in ops/fused_mlp.py:

  - SIMPLENERF_FWD_PARALLEL_GRID=1 : dimension_semantics=("parallel",)
  - SIMPLENERF_TILE_RAYS=16|32     : bigger row tiles (amortize the ~1.8 ms
                                     fixed per-pass cost over more math)

plus fwd+bwd for the winning config (the bwd tile scales with the knob).
Each config re-traces through make_spec, so the env var is read fresh.

Run (chip idle):  nohup python -c "exec(open('scripts/kernel_lab10.py').read())" \
      > /tmp/kernel_lab10.log 2>&1 &
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.fields import mlp as mlp_lib

REPS = int(os.environ.get("LAB10_REPS", "20"))
NR = int(os.environ.get("LAB10_NR", "4096"))
NS_FINE = 192
NS_COARSE = 64
N_FINE = NR * NS_FINE


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


key = jax.random.PRNGKey(0)
fine_cfg = mlp_lib.MLPConfig(num_samples=NS_FINE)
params = mlp_lib.init(key, fine_cfg)
pts = jax.random.uniform(key, (N_FINE, 3), jnp.float32, -1.0, 1.0)
dirs = jax.random.normal(key, (NR, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

pa_cfg = mlp_lib.MLPConfig(num_samples=NS_COARSE, points_sigma_pe_degree=3)
va_cfg = mlp_lib.MLPConfig(num_samples=NS_COARSE, use_view_dirs=False, view_dependent_rgb=False)
co_cfg = mlp_lib.MLPConfig(num_samples=NS_COARSE)
co_params = [mlp_lib.init(jax.random.PRNGKey(i), c) for i, c in enumerate((co_cfg, pa_cfg, va_cfg))]
pts_c = jax.random.uniform(key, (NR * NS_COARSE, 3), jnp.float32, -1.0, 1.0)

FWD_TFLOP = 1.179e-6 * N_FINE  # lab8 exact count, fine member
BWD_TFLOP = 3.471e-6 * N_FINE


def timed(name, program):
    try:
        np.asarray(program())
        t0 = time.perf_counter(); np.asarray(program()); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program()); dt = min(d1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        log(f"{name:28s} {ms:8.3f} ms")
        return round(ms, 3)
    except Exception as e:
        log(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None


def scan_reps(body):
    def program():
        def wrapped(c, x):
            return c + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


def fine_fwd_body(x):
    out = mlp_lib.apply_fused(params, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
                              dtype=jnp.bfloat16, view_dirs_tile=NS_FINE)
    return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])


def ens_fwd_body(x):
    outs = mlp_lib.apply_fused_ensemble(
        [(p, c) for p, c in zip(co_params, (co_cfg, pa_cfg, va_cfg))],
        pts_c + x * 1e-6, view_dirs=dirs, dtype=jnp.bfloat16, view_dirs_tile=NS_COARSE)
    return sum(jnp.sum(o["sigma"]) for o in outs)


def fine_grad_body(x):
    def f(p):
        out = mlp_lib.apply_fused(p, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
                                  dtype=jnp.bfloat16, view_dirs_tile=NS_FINE)
        return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])
    g = jax.grad(f)(params)
    return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g))


CONFIGS = [
    ("base", {}),
    ("par", {"SIMPLENERF_FWD_PARALLEL_GRID": "1"}),
    ("t16", {"SIMPLENERF_TILE_RAYS": "16"}),
    ("t16_par", {"SIMPLENERF_TILE_RAYS": "16", "SIMPLENERF_FWD_PARALLEL_GRID": "1"}),
    ("t32", {"SIMPLENERF_TILE_RAYS": "32"}),
    ("t32_par", {"SIMPLENERF_TILE_RAYS": "32", "SIMPLENERF_FWD_PARALLEL_GRID": "1"}),
]

results = {}
for tag, env in CONFIGS:
    for k in ("SIMPLENERF_FWD_PARALLEL_GRID", "SIMPLENERF_TILE_RAYS"):
        os.environ.pop(k, None)
    os.environ.update(env)
    r = {}
    r["fine_fwd_ms"] = timed(f"fine_fwd[{tag}]", scan_reps(fine_fwd_body))
    r["ens_fwd_ms"] = timed(f"ens_fwd[{tag}]", scan_reps(ens_fwd_body))
    if r["fine_fwd_ms"]:
        r["fine_fwd_tflops"] = round(FWD_TFLOP / (r["fine_fwd_ms"] / 1e3), 1)
    results[tag] = r

# fwd+bwd for the best fine-fwd config and for base
best = min((t for t in results if results[t].get("fine_fwd_ms")),
           key=lambda t: results[t]["fine_fwd_ms"])
log(f"best fine fwd config: {best}")
for tag in {"base", best}:
    for k in ("SIMPLENERF_FWD_PARALLEL_GRID", "SIMPLENERF_TILE_RAYS"):
        os.environ.pop(k, None)
    os.environ.update(dict(CONFIGS[[t for t, _ in CONFIGS].index(tag)][1]))
    results[tag]["fine_fwdbwd_ms"] = timed(f"fine_fwdbwd[{tag}]", scan_reps(fine_grad_body))

print(json.dumps(results, indent=2))
