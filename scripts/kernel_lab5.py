"""Kernel lab 5: split-matmul in-kernel PE (no concat relayout, no XLA PE).

lab4: kernel with precomputed lo = 7.46 ms but the XLA-side lo build costs
2.07 ms (unfused sin/cos/concat materializations). Candidate: compute
sincos IN-kernel (cheap transcendentals) and feed layer0/skip as THREE
matmuls against row-split weights — x@W0x + s@W0s + c@W0c — so the (T,63)
concat relayout (the suspected in-kernel hog from lab2) never happens and
no lo ever touches HBM.

  lo_pre    — reference: production kernel on precomputed lo (7.46 ms)
  split_pe  — trunk+head, split-matmul PE in-kernel, pts input

Run: nohup python -c "exec(open('scripts/kernel_lab5.py').read())" > /tmp/kernel_lab5.log 2>&1 &
"""

import dataclasses
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplenerf_tpu.fields import mlp as mlp_lib
from simplenerf_tpu.ops import fused_mlp as F

REPS = 20
NR = 4096
NS = 192
N = NR * NS
D = 10


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


fine_cfg = mlp_lib.MLPConfig(num_samples=NS)
key = jax.random.PRNGKey(0)
params = mlp_lib.init(key, fine_cfg)
kp_full = F.kernel_params(params, fine_cfg)
pts = jax.random.uniform(key, (N, 3), jnp.float32, -1.0, 1.0)
spec0 = F.make_spec(fine_cfg, NS, jnp.bfloat16)
TRUNK_FLOPS = 2 * N * 256 * (256 * 7 + 63)


def timed(name, program):
    try:
        np.asarray(program())
        t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        log(f"{name:10s} {ms:8.2f} ms   {TRUNK_FLOPS / (dt / REPS) / 1e12:6.1f} trunk-TFLOPS")
        return round(ms, 3)
    except Exception as e:
        log(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return str(e)[:200]


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


# split weights from the lo-layout w0i/w5i: rows [x(3) | s(30) | c(30)].
kp_split = {
    "w0x": kp_full["w0i"][0:3], "w0s": kp_full["w0i"][3:33], "w0c": kp_full["w0i"][33:63],
    "w5x": kp_full["w5i"][0:3], "w5s": kp_full["w5i"][3:33], "w5c": kp_full["w5i"][33:63],
    "b0": kp_full["b0"], "wpo_t": kp_full["wpo_t"][:1], "bpo": kp_full["bpo"][:, :1],
}
for i in range(1, 8):
    kp_split[f"w{i}"] = kp_full[f"w{i}"]
    kp_split[f"b{i}"] = kp_full[f"b{i}"]
SPLIT_KEYS = sorted(kp_split.keys())


def split_pe_kernel(spec, nkp, *refs):
    pts_ref = refs[0]
    kp = {k: r[:] for k, r in zip(SPLIT_KEYS, refs[1 : 1 + nkp])}
    out_ref = refs[1 + nkp]
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)

    def mm(a, b):
        return jnp.dot(a.astype(sub.cdtype), b.astype(sub.cdtype),
                       preferred_element_type=jnp.float32)

    for hh in range(nh):
        pts32 = pts_ref[hh * t_h : (hh + 1) * t_h, :]
        x = pts32.astype(sub.cdtype)
        z = jnp.dot(pts32, F._freq_matrix(D), preferred_element_type=jnp.float32)
        s = jnp.sin(z).astype(sub.cdtype)
        c = jnp.cos(z).astype(sub.cdtype)
        h = jax.nn.relu(mm(x, kp["w0x"]) + mm(s, kp["w0s"]) + mm(c, kp["w0c"]) + kp["b0"])
        h = h.astype(sub.cdtype)
        for i in range(1, 8):
            acc = mm(h, kp[f"w{i}"])
            if i == 5:
                acc = acc + mm(x, kp["w5x"]) + mm(s, kp["w5s"]) + mm(c, kp["w5c"])
            h = jax.nn.relu(acc + kp[f"b{i}"]).astype(sub.cdtype)
        plane = F._head_planes(sub, h, kp["wpo_t"], kp["bpo"], 1)[0]
        out_ref[hh * tr_h : (hh + 1) * tr_h, :] = plane


def run_split(pts_in):
    n = pts_in.shape[0]
    grid = n // spec0.tile
    in_specs = [F._row_spec(spec0.tile, 3)] + [F._weight_spec()] * len(SPLIT_KEYS)
    inputs = [pts_in] + [kp_split[k] for k in SPLIT_KEYS]
    return pl.pallas_call(
        functools.partial(split_pe_kernel, spec0, len(SPLIT_KEYS)),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[F._plane_spec(spec0)],
        out_shape=[jax.ShapeDtypeStruct((n // NS, NS), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(flops=TRUNK_FLOPS, bytes_accessed=n * 12,
                                      transcendentals=n * 60),
    )(*inputs)


results = {}
results["split_pe"] = timed(
    "split_pe", scan_reps(lambda x: jnp.sum(run_split(pts + x * 1e-6)[0]))
)

# Reference: production fused_apply on precomputed lo (sigma head only not
# available through the public API, so compare against lab4's kernel_only
# 7.46 ms for the full head set; split_pe here is sigma-only like lab2's
# 9.64 ms in-kernel-PE / 6.35 ms lo-precomputed pair).
print(json.dumps(results, indent=2))
