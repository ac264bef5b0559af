"""Forward-kernel lab round 2: is it the PE encode, the epilogues, or the MXU?

kernel_lab.py established: views branch + rgb heads ≈ 0.8 ms of 10.5;
sigma-only trunk still runs at 77 trunk-TFLOPS; bf16 epilogues and MXU
heads change nothing; halves interleave changes nothing. This round
decomposes the trunk itself at the fine shape (N=786k, 8x256):

  sigmaonly    — re-measured reference point (PE in kernel)
  lo64         — PE precomputed OUTSIDE (XLA), kernel reads (N,64) bf16 rows
  purechain    — (N,256) bf16 input; 8x(mm+bias+relu), no PE, no skip
  norelu       — same minus bias+relu: bare matmul chain = MXU ceiling
  noout        — purechain writing only an 8-row summary: output-write cost

Run: nohup python -c "exec(open('scripts/kernel_lab2.py').read())" > /tmp/kernel_lab2.log 2>&1 &
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
kp_full = F.kernel_params(params, fine_cfg)
pts = jax.random.uniform(key, (N, 3), jnp.float32, -1.0, 1.0)

spec0 = F.make_spec(fine_cfg, NS, jnp.bfloat16)
TRUNK_FLOPS = 2 * N * spec0.width * (spec0.width * (spec0.depth - 1) + 6 * spec0.pe_degree + 3)
CHAIN_FLOPS = 2 * N * 256 * 256 * 8


def timed(name, program, flops):
    try:
        np.asarray(program())
        t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        tf = flops / (dt / REPS) / 1e12
        log(f"{name:12s} {ms:8.2f} ms   {tf:6.1f} TFLOPS")
        return {"ms": round(ms, 3), "tflops": round(tf, 1)}
    except Exception as e:
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


results = {}

# ---- sigmaonly reference (same as lab 1) -----------------------------------
def sigmaonly_kernel(spec, nkp, *refs):
    pts_ref = refs[0]
    kp_refs = refs[1 : 1 + nkp]
    out_ref = refs[1 + nkp]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)
    for h in range(nh):
        lo, _ = F._encode_tile(sub, pts_ref[h * t_h : (h + 1) * t_h, :])
        hs = F._trunk_forward(sub, kp, lo)
        planes = F._head_planes(sub, hs[-1], kp["wpo_t"], kp["bpo"], 1)
        out_ref[h * tr_h : (h + 1) * tr_h, :] = planes[0]


spec_s1 = dataclasses.replace(spec0, views_depth=0, out_v=0, has_extra=False,
                              has_hvx=False, out_p=1)
kp_s1 = {k: kp_full[k] for k in spec_s1.param_keys()}
kp_s1["wpo_t"] = kp_full["wpo_t"][:1]
kp_s1["bpo"] = kp_full["bpo"][:, :1]


def call_rows(spec, kp, kernel_fn, row_input, in_cols, n_out_planes=1):
    n = row_input.shape[0]
    grid = n // spec.tile
    keys = spec.param_keys()
    in_specs = [F._row_spec(spec.tile, in_cols)] + [F._weight_spec()] * len(keys)
    inputs = [row_input] + [kp[k] for k in keys]
    out_shape = [jax.ShapeDtypeStruct((n // spec.ns, spec.ns), jnp.float32)] * n_out_planes
    out_specs = [F._plane_spec(spec)] * n_out_planes
    return pl.pallas_call(
        functools.partial(kernel_fn, spec, len(keys)),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(flops=CHAIN_FLOPS, bytes_accessed=n * in_cols * 2,
                                      transcendentals=0),
    )(*inputs)


results["sigmaonly"] = timed(
    "sigmaonly",
    scan_reps(lambda x: jnp.sum(
        call_rows(spec_s1, kp_s1, sigmaonly_kernel, pts + x * 1e-6, 3)[0])),
    TRUNK_FLOPS,
)

# ---- lo64: PE precomputed outside the kernel --------------------------------
from simplenerf_tpu.fields import encoding

# lo = [x | sin | cos] (N, 63) padded to 64 cols, bf16 rows in HBM.
def build_lo64(p):
    s_c = jnp.dot(p, F._freq_matrix(10), preferred_element_type=jnp.float32)
    lo = jnp.concatenate([p, jnp.sin(s_c), jnp.cos(s_c),
                          jnp.zeros((p.shape[0], 1), jnp.float32)], axis=-1)
    return lo.astype(jnp.bfloat16)


def lo64_kernel(spec, nkp, *refs):
    lo_ref = refs[0]
    kp_refs = refs[1 : 1 + nkp]
    out_ref = refs[1 + nkp]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)
    for h in range(nh):
        lo = lo_ref[h * t_h : (h + 1) * t_h, :]
        hs = F._trunk_forward(sub, kp, lo)
        planes = F._head_planes(sub, hs[-1], kp["wpo_t"], kp["bpo"], 1)
        out_ref[h * tr_h : (h + 1) * tr_h, :] = planes[0]


# w0i/w5i padded 63 -> 64 rows to match.
kp_64 = dict(kp_s1)
kp_64["w0i"] = jnp.concatenate([kp_s1["w0i"], jnp.zeros((1, 256), kp_s1["w0i"].dtype)])
kp_64["w5i"] = jnp.concatenate([kp_s1["w5i"], jnp.zeros((1, 256), kp_s1["w5i"].dtype)])
lo64 = build_lo64(pts)
results["lo64"] = timed(
    "lo64",
    scan_reps(lambda x: jnp.sum(
        call_rows(spec_s1, kp_64, lo64_kernel, lo64 + (x * 1e-6).astype(jnp.bfloat16), 64)[0])),
    TRUNK_FLOPS,
)

# ---- pure chains from a (N, 256) bf16 input ---------------------------------
h0 = jax.random.normal(key, (N, 256), jnp.bfloat16) * 0.1
ws = [kp_full[f"w{i}"] for i in range(1, 8)] + [kp_full["w1"]]
bs = [kp_full[f"b{i}"] for i in range(1, 8)] + [kp_full["b1"]]
kp_chain = {f"cw{i}": w for i, w in enumerate(ws)}
kp_chain.update({f"cb{i}": b for i, b in enumerate(bs)})


class ChainSpec:
    """Minimal stand-in exposing what call_rows/_mm need."""

    def __init__(self, base, relu=True, bias=True, writeout=True):
        self.tile_rays = base.tile_rays
        self.ns = base.ns
        self.tile = base.tile
        self.halves = base.halves
        self.cdtype = base.cdtype
        self.relu = relu
        self.bias = bias
        self.writeout = writeout

    def param_keys(self):
        keys = [f"cw{i}" for i in range(8)]
        if self.bias:
            keys += [f"cb{i}" for i in range(8)]
        return keys


def chain_kernel(spec, nkp, *refs):
    h_ref = refs[0]
    kp_refs = refs[1 : 1 + nkp]
    out_ref = refs[1 + nkp]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    for hh in range(nh):
        h = h_ref[hh * t_h : (hh + 1) * t_h, :]
        for i in range(8):
            acc = jnp.dot(h.astype(spec.cdtype), kp[f"cw{i}"].astype(spec.cdtype),
                          preferred_element_type=jnp.float32)
            if spec.bias:
                acc = acc + kp[f"cb{i}"]
            if spec.relu:
                h = jax.nn.relu(acc).astype(spec.cdtype)
            else:
                h = acc.astype(spec.cdtype)
        if spec.writeout:
            out_ref[hh * tr_h : (hh + 1) * tr_h, :] = (
                h.astype(jnp.float32).reshape(tr_h, spec.ns, -1).sum(-1)
            )
        else:
            out_ref[hh * tr_h : (hh + 1) * tr_h, :] = jnp.float32(0) * jnp.zeros(
                (tr_h, spec.ns), jnp.float32
            ) + jnp.sum(h.astype(jnp.float32))


for name, kwargs in (
    ("purechain", dict(relu=True, bias=True)),
    ("nobias", dict(relu=True, bias=False)),
    ("norelu", dict(relu=False, bias=False)),
):
    cs = ChainSpec(spec0, **kwargs)
    results[name] = timed(
        name,
        scan_reps(lambda x, cs=cs: jnp.sum(
            call_rows(cs, kp_chain, chain_kernel, h0, 256)[0]) + x * 0),
        CHAIN_FLOPS,
    )

print(json.dumps(results, indent=2))
