"""Kernel lab 4: where did the PE-outside win go in production?

lab2's lo64 (trunk-only, lo precomputed outside the timed loop) ran 3.3 ms
faster than in-kernel PE, but the production fine forward only improved
0.5 ms. Variants at the fine shape:

  prod        — mlp.apply_fused (XLA PE inside the timed body, as in training)
  kernel_only — fused_apply on a PREcomputed lo: pure kernel cost
  pe_only     — just the XLA-side lo construction (encode_parts+concat+cast)
  pe_fused    — lo built from rays (o + z*d fused into PE) like the real step

Run: nohup python -c "exec(open('scripts/kernel_lab4.py').read())" > /tmp/kernel_lab4.log 2>&1 &
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

xv, sv, cv = encoding.encode_parts(dirs, fine_cfg.views_pe_degree)
enc_views = jnp.concatenate([xv, sv, cv], axis=-1)
hvx = jnp.dot(enc_views.astype(jnp.bfloat16), F.dirs_w(params, fine_cfg).astype(jnp.bfloat16),
              preferred_element_type=jnp.float32)
lo_pre, _ = mlp_lib._trunk_inputs(fine_cfg, pts, spec0.cdtype)

TRUNK_FLOPS = 2 * N * 256 * (256 * 7 + 63)


def timed(name, program):
    np.asarray(program())
    t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
    ms = dt / REPS * 1e3
    log(f"{name:12s} {ms:8.2f} ms   {TRUNK_FLOPS / (dt / REPS) / 1e12:6.1f} trunk-TFLOPS")
    return round(ms, 3)


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


results = {}

def prod_body(x):
    out = mlp_lib.apply_fused(params, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
                              dtype=jnp.bfloat16, view_dirs_tile=NS)
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(out))

results["prod"] = timed("prod", scan_reps(prod_body))

def kernel_only_body(x):
    lo = lo_pre + (x * 1e-6).astype(lo_pre.dtype)
    planes = F.fused_apply(spec0, kp, lo, None, hvx)
    return sum(jnp.sum(p) for p in planes)

results["kernel_only"] = timed("kernel_only", scan_reps(kernel_only_body))

def pe_only_body(x):
    lo, _ = mlp_lib._trunk_inputs(fine_cfg, pts + x * 1e-6, spec0.cdtype)
    return jnp.sum(lo.astype(jnp.float32))

results["pe_only"] = timed("pe_only", scan_reps(pe_only_body))

rays_o = jax.random.uniform(key, (NR, 3), jnp.float32)
rays_d = jax.random.normal(key, (NR, 3), jnp.float32)
z = jnp.linspace(0.0, 1.0, NS)[None, :]

def pe_fused_body(x):
    p = (rays_o[:, None, :] + rays_d[:, None, :] * (z[..., None] + x * 1e-6)).reshape(N, 3)
    lo, _ = mlp_lib._trunk_inputs(fine_cfg, p, spec0.cdtype)
    return jnp.sum(lo.astype(jnp.float32))

results["pe_fused"] = timed("pe_fused", scan_reps(pe_fused_body))

print(json.dumps(results, indent=2))
