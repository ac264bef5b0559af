"""Kernel lab 7: re-tune tiling now that PE left the kernels.

halves=2 existed to hide in-kernel PE VPU work; with PE outside, sweep
forward halves/tile and backward tile at the fine shape, through the
production custom-VJP path.

Run: nohup python -c "exec(open('scripts/kernel_lab7.py').read())" > /tmp/kernel_lab7.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.fields import encoding, mlp as mlp_lib
from simplenerf_tpu.ops import fused_mlp as F

REPS = 20
NR = 4096
NS = 192
N = NR * NS


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


fine_cfg = mlp_lib.MLPConfig(num_samples=NS)
key = jax.random.PRNGKey(0)
params = mlp_lib.init(key, fine_cfg)
kp = F.kernel_params(params, fine_cfg)
pts = jax.random.uniform(key, (N, 3), jnp.float32, -1.0, 1.0)
dirs = jax.random.normal(key, (NR, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
spec0 = F.make_spec(fine_cfg, NS, jnp.bfloat16)
lo_pre, _ = mlp_lib._trunk_inputs(fine_cfg, pts, spec0.cdtype)

xv, sv, cv = encoding.encode_parts(dirs, fine_cfg.views_pe_degree)
enc_views = jnp.concatenate([xv, sv, cv], axis=-1)
hvx = jnp.dot(enc_views.astype(jnp.bfloat16), F.dirs_w(params, fine_cfg).astype(jnp.bfloat16),
              preferred_element_type=jnp.float32)

TRUNK_FLOPS = 2 * N * 256 * (256 * 7 + 63)


def timed(name, program, mult):
    try:
        np.asarray(program())
        t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        log(f"{name:16s} {ms:8.2f} ms   {TRUNK_FLOPS * mult / 2 / (dt / REPS) / 1e12:6.1f} TFLOPS")
        return round(ms, 3)
    except Exception as e:
        log(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return str(e)[:160]


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


def fwd_body(spec):
    def body(x):
        lo = lo_pre + (x * 1e-6).astype(lo_pre.dtype)
        return sum(jnp.sum(p) for p in F.fused_apply(spec, kp, lo, None, hvx))
    return body


def fwdbwd_body(spec):
    def body(x):
        lo = lo_pre + (x * 1e-6).astype(lo_pre.dtype)

        def f(kp_):
            return sum(jnp.sum(p) for p in F.fused_apply(spec, kp_, lo, None, hvx))

        v, g = jax.value_and_grad(f)(kp)
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
    return body


results = {}
# Forward sweeps. Note _fused_bwd derives its tile from spec (tile_rays //
# halves), so the fwdbwd sweeps cover backward tiles 8/16/32 implicitly.
for name, tr, hv in (("fwd_h2_t16", 16, 2), ("fwd_h1_t8", 8, 1), ("fwd_h1_t16", 16, 1)):
    spec = dataclasses.replace(spec0, tile_rays=tr, halves=hv)
    results[name] = timed(name, scan_reps(fwd_body(spec)), 2)
for name, tr, hv in (("fb_h2_t16", 16, 2), ("fb_h1_t16", 16, 1), ("fb_h1_t32", 32, 1),
                     ("fb_h4_t32", 32, 4)):
    spec = dataclasses.replace(spec0, tile_rays=tr, halves=hv)
    results[name] = timed(name, scan_reps(fwdbwd_body(spec)), 8)
print(json.dumps(results, indent=2))
