"""Forward-kernel microbench lab: isolate where fused-MLP fwd time goes.

Breakdown (scripts/breakdown_tpu.py) shows the fwd kernel at ~72 trunk-
TFLOPS vs ~127 for fwd+bwd and ~150 for a bare matmul chain — the forward
is VPU-bound: per-layer bias+relu+cast epilogues, the lane-reduction heads,
and the views branch cost as much VPU time as the trunk costs MXU time.
This script measures variants of the fine-shape forward to attribute the
gap and pick fixes:

  full        — production kernel (fused_apply), halves=2 tile_rays=16
  noviews     — same trunk+heads, views branch and its 3 rgb planes removed
  sigmaonly   — trunk + 1-channel head only
  bf16epi     — per-layer epilogue (bias+relu) computed in bf16
  mmheads     — heads via (T,W)x(W,out) MXU matmul + plane relayout
  halves1/2/4 — chain-interleave sweep (tile_rays 8/16/32)

Run: nohup python -c "exec(open('scripts/kernel_lab.py').read())" > /tmp/kernel_lab.log 2>&1 &
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


fine_cfg = mlp_lib.MLPConfig(num_samples=NS)
key = jax.random.PRNGKey(0)
params = mlp_lib.init(key, fine_cfg)
kp_full = jax.tree.map(lambda x: x, F.kernel_params(params, fine_cfg))
pts = jax.random.uniform(key, (N, 3), jnp.float32, -1.0, 1.0)
dirs = jax.random.normal(key, (NR, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

spec0 = F.make_spec(fine_cfg, NS, jnp.bfloat16)
log(f"base spec: tile_rays={spec0.tile_rays} halves={spec0.halves} tile={spec0.tile}")

# hvx input for the views branch (same as mlp.apply_fused builds).
from simplenerf_tpu.fields import encoding

xv, sv, cv = encoding.encode_parts(dirs, fine_cfg.views_pe_degree)
enc_views = jnp.concatenate([xv, sv, cv], axis=-1)
hvx = jnp.dot(enc_views.astype(jnp.bfloat16), F.dirs_w(params, fine_cfg).astype(jnp.bfloat16),
              preferred_element_type=jnp.float32)

TRUNK_FLOPS = 2 * N * spec0.width * (spec0.width * (spec0.depth - 1) + 6 * spec0.pe_degree + 3)


def timed(name, program):
    try:
        out = program()
        np.asarray(out)
        t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        tf = TRUNK_FLOPS / (dt / REPS) / 1e12
        log(f"{name:12s} {ms:8.2f} ms   {tf:6.1f} trunk-TFLOPS")
        return {"ms": round(ms, 3), "trunk_tflops": round(tf, 1)}
    except Exception as e:  # compile-helper crashes on some tiles: record, continue
        log(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return {"error": str(e)[:200]}


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


def run_call(spec, kp, kernel_fn, use_hvx=True, pts_in=pts, hvx_in=None):
    """pallas_call with the production plumbing for an experimental kernel."""
    n = pts_in.shape[0]
    grid = n // spec.tile
    keys = spec.param_keys()
    in_specs = [F._row_spec(spec.tile, 3)]
    inputs = [pts_in]
    if spec.has_hvx and use_hvx:
        in_specs.append(F._row_spec(spec.tile_rays, spec.views_width))
        inputs.append(hvx_in)
    in_specs += [F._weight_spec()] * len(keys)
    inputs += [kp[k] for k in keys]
    out_shape = [jax.ShapeDtypeStruct((n // spec.ns, spec.ns), jnp.float32)] * spec.n_planes
    out_specs = [F._plane_spec(spec)] * spec.n_planes
    return pl.pallas_call(
        functools.partial(kernel_fn, spec, len(keys)),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=TRUNK_FLOPS // (N // n), bytes_accessed=n * 32,
            transcendentals=n * 6 * spec.pe_degree,
        ),
    )(*inputs)


results = {}

# ---- production baseline + halves/tile sweep ------------------------------
def full_body(spec):
    def body(x):
        planes = F.fused_apply(spec, kp_full, pts + x * 1e-6, hvx)
        return sum(jnp.sum(p) for p in planes)
    return body

results["full_h2_t16"] = timed("full_h2_t16", scan_reps(full_body(spec0)))
results["full_h1_t8"] = timed(
    "full_h1_t8", scan_reps(full_body(dataclasses.replace(spec0, tile_rays=8, halves=1)))
)
results["full_h4_t32"] = timed(
    "full_h4_t32", scan_reps(full_body(dataclasses.replace(spec0, tile_rays=32, halves=4)))
)
results["full_h2_t32"] = timed(
    "full_h2_t32", scan_reps(full_body(dataclasses.replace(spec0, tile_rays=32, halves=2)))
)

# ---- ablated kernels -------------------------------------------------------
def noviews_kernel(spec, nkp, *refs):
    """Trunk + sigma head only (views branch elided)."""
    pts_ref = refs[0]
    kp_refs = refs[1 : 1 + nkp]
    out_refs = refs[1 + nkp :]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)
    for h in range(nh):
        lo, _ = F._encode_tile(sub, pts_ref[h * t_h : (h + 1) * t_h, :])
        hs = F._trunk_forward(sub, kp, lo)
        planes = F._head_planes(sub, hs[-1], kp["wpo_t"], kp["bpo"], sub.out_p)
        for j in range(sub.out_p):
            out_refs[j][h * tr_h : (h + 1) * tr_h, :] = planes[j]


spec_nv = dataclasses.replace(
    spec0, views_depth=0, out_v=0, has_extra=False, has_hvx=False
)
kp_nv = {k: kp_full[k] for k in spec_nv.param_keys()}
results["noviews"] = timed(
    "noviews", scan_reps(lambda x: sum(
        jnp.sum(p) for p in run_call(spec_nv, kp_nv, noviews_kernel, use_hvx=False,
                                     pts_in=pts + x * 1e-6)))
)

spec_s1 = dataclasses.replace(spec_nv, out_p=1)
kp_s1 = dict(kp_nv)
kp_s1["wpo_t"] = kp_full["wpo_t"][:1]
kp_s1["bpo"] = kp_full["bpo"][:, :1]
results["sigmaonly"] = timed(
    "sigmaonly", scan_reps(lambda x: sum(
        jnp.sum(p) for p in run_call(spec_s1, kp_s1, noviews_kernel, use_hvx=False,
                                     pts_in=pts + x * 1e-6)))
)


def bf16epi_kernel(spec, nkp, *refs):
    """Full kernel but per-layer epilogue (bias+relu) in bf16."""
    pts_ref, hvx_ref = refs[0], refs[1]
    kp_refs = refs[2 : 2 + nkp]
    out_refs = refs[2 + nkp :]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)

    def epi(acc, b):
        return jnp.maximum(acc.astype(sub.cdtype) + b.astype(sub.cdtype),
                           jnp.zeros((), sub.cdtype))

    encs, hcur = [], []
    for h in range(nh):
        enc = F._encode_tile(sub, pts_ref[h * t_h : (h + 1) * t_h, :])
        encs.append(enc)
        hcur.append(epi(F._mm(enc[0], kp["w0i"], sub), kp["b0"]))
    for i in range(1, sub.depth):
        acc = [F._mm(h, kp[f"w{i}"], sub) for h in hcur]
        if (i - 1) in sub.skip_layers:
            acc = [a + F._mm(enc[0], kp[f"w{i}i"], sub) for a, enc in zip(acc, encs)]
        hcur = [epi(a, kp[f"b{i}"]) for a in acc]
    for h in range(nh):
        rr = slice(h * tr_h, (h + 1) * tr_h)
        planes = F._head_planes(sub, hcur[h], kp["wpo_t"], kp["bpo"], sub.out_p)
        for j in range(sub.out_p):
            out_refs[j][rr, :] = planes[j]
        hvx_t = F._hvx_broadcast(sub, hvx_ref[rr, :])
        _, hvs = F._views_forward(sub, kp, hcur[h], encs[h][1], hvx_t)
        v_planes = F._head_planes(sub, hvs[-1], kp["wvo_t"], kp["bvo"], sub.out_v)
        for j in range(sub.out_v):
            out_refs[sub.out_p + j][rr, :] = v_planes[j]


results["bf16epi"] = timed(
    "bf16epi", scan_reps(lambda x: sum(
        jnp.sum(p) for p in run_call(spec0, kp_full, bf16epi_kernel,
                                     pts_in=pts + x * 1e-6, hvx_in=hvx)))
)


def mmheads_kernel(spec, nkp, *refs):
    """Full kernel with heads as one MXU matmul + column->plane relayout."""
    pts_ref, hvx_ref = refs[0], refs[1]
    kp_refs = refs[2 : 2 + nkp]
    out_refs = refs[2 + nkp :]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)

    def heads_mm(h, wt, b, n_out):
        # (T, W) @ (W, n_out) on the MXU, then per-channel (T,) -> (tr, ns).
        cols = F._mm(h, wt.T, sub) + b  # (T, n_out) f32
        return [cols[:, j].reshape(tr_h, sub.ns) for j in range(n_out)]

    encs, hcur = [], []
    for h in range(nh):
        enc = F._encode_tile(sub, pts_ref[h * t_h : (h + 1) * t_h, :])
        encs.append(enc)
        hcur.append(
            jax.nn.relu(F._mm(enc[0], kp["w0i"], sub) + kp["b0"]).astype(sub.cdtype)
        )
    for i in range(1, sub.depth):
        acc = [F._mm(h, kp[f"w{i}"], sub) for h in hcur]
        if (i - 1) in sub.skip_layers:
            acc = [a + F._mm(enc[0], kp[f"w{i}i"], sub) for a, enc in zip(acc, encs)]
        hcur = [jax.nn.relu(a + kp[f"b{i}"]).astype(sub.cdtype) for a in acc]
    for h in range(nh):
        rr = slice(h * tr_h, (h + 1) * tr_h)
        planes = heads_mm(hcur[h], kp["wpo_t"], kp["bpo"], sub.out_p)
        for j in range(sub.out_p):
            out_refs[j][rr, :] = planes[j]
        hvx_t = F._hvx_broadcast(sub, hvx_ref[rr, :])
        _, hvs = F._views_forward(sub, kp, hcur[h], encs[h][1], hvx_t)
        v_planes = heads_mm(hvs[-1], kp["wvo_t"], kp["bvo"], sub.out_v)
        for j in range(sub.out_v):
            out_refs[sub.out_p + j][rr, :] = v_planes[j]


results["mmheads"] = timed(
    "mmheads", scan_reps(lambda x: sum(
        jnp.sum(p) for p in run_call(spec0, kp_full, mmheads_kernel,
                                     pts_in=pts + x * 1e-6, hvx_in=hvx)))
)

print(json.dumps(results, indent=2))
