"""Forward-kernel lab round 3: plain-XLA MLP vs the Pallas fused kernel.

TPU cores are in-order VLIW: Mosaic (Pallas) lowers each matmul as a
macro-op and does not co-schedule our between-layer VPU epilogues into the
MXU loop, so the fused forward serializes MXU and VPU (labs 1-2). XLA's own
fusion DOES bundle elementwise epilogues into matmul loops. This lab times
the repo's blocked XLA path (fields/mlp.apply + to_planes) at the fine
shape, forward and forward+backward (both default and jax.checkpoint remat)
against the Pallas numbers (10.40 / 28.06 ms).

Run: nohup python -c "exec(open('scripts/kernel_lab3.py').read())" > /tmp/kernel_lab3.log 2>&1 &
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

REPS = 20
NR = 4096
NS = 192
N = NR * NS


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


fine_cfg = mlp_lib.MLPConfig(num_samples=NS)
key = jax.random.PRNGKey(0)
params = mlp_lib.init(key, fine_cfg)
pts = jax.random.uniform(key, (N, 3), jnp.float32, -1.0, 1.0)
dirs = jax.random.normal(key, (NR, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

TRUNK_FLOPS = 2 * N * 256 * (256 * 7 + 63)


def timed(name, program, flops):
    np.asarray(program())
    t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
    ms = dt / REPS * 1e3
    tf = flops / (dt / REPS) / 1e12
    log(f"{name:16s} {ms:8.2f} ms   {tf:6.1f} trunk-TFLOPS")
    return {"ms": round(ms, 3), "trunk_tflops": round(tf, 1)}


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


def xla_eval(p, x):
    raw = mlp_lib.apply(p, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
                        dtype=jnp.bfloat16, view_dirs_tile=NS)
    out = mlp_lib.to_planes(raw, NR, NS)
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(out))


xla_eval_remat = jax.checkpoint(xla_eval)

def fwdbwd_body(f):
    def body(x):
        v, g = jax.value_and_grad(f)(params, x)
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
    return body


results = {}
results["xla_fwd"] = timed("xla_fwd", scan_reps(lambda x: xla_eval(params, x)), TRUNK_FLOPS)
results["xla_fwdbwd"] = timed(
    "xla_fwdbwd", scan_reps(fwdbwd_body(xla_eval)), TRUNK_FLOPS * 4
)
results["xla_fwdbwd_remat"] = timed(
    "xla_fwdbwd_remat", scan_reps(fwdbwd_body(xla_eval_remat)), TRUNK_FLOPS * 4
)
print(json.dumps(results, indent=2))
