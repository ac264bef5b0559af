"""Round-3 kernel lab 9: isolate the fused-MLP forward's fixed per-pass cost.

lab8's depth sweep showed the marginal 256x256 trunk layer runs at
~180 TFLOPS (near the 197 peak) while the whole pass sits at ~95-120: the
gap is a ~2 ms FIXED per-pass cost, not slow matmuls. Experiments:

  io_only    — kernel that reads the lo tile and writes one plane, no
               matmuls: the pure input-DMA + output + grid floor
  head_only  — io_only + the sigma head-plane VPU reduction over a
               broadcast activation: prices _head_planes
  tileN      — trunk_d8 at tile_rays 8/16/32 (halves=1): does the
               intercept amortize with bigger tiles or scale with them?
  par        — trunk_d8 with dimension_semantics=("parallel",) vs default:
               does Mosaic pipeline the grid better when told it's
               parallel?
  chainX     — lab8's bare-chain variants with the input passed as a jit
               ARGUMENT (lab8 captured a 402 MB constant -> remote-compile
               HTTP 413): bias+relu+cast epilogue pricing at T=1536
  novw       — production fine fwd with view_dirs=None (sigma+rgb from
               trunk only): prices the views branch + its extra IO

Run (chip idle):  nohup python -c "exec(open('scripts/kernel_lab9.py').read())" \
      > /tmp/kernel_lab9.log 2>&1 &
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

REPS = int(os.environ.get("LAB9_REPS", "20"))
NR = int(os.environ.get("LAB9_NR", "4096"))
NS_FINE = 192
N_FINE = NR * NS_FINE


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


fine_cfg = mlp_lib.MLPConfig(num_samples=NS_FINE)
key = jax.random.PRNGKey(0)
params = mlp_lib.init(key, fine_cfg)
spec_fine = F.make_spec(fine_cfg, NS_FINE, jnp.bfloat16)
kp_fine = F.kernel_params(params, fine_cfg)
pts = jax.random.uniform(key, (N_FINE, 3), jnp.float32, -1.0, 1.0)
dirs = jax.random.normal(key, (NR, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
lo_fine, _ = mlp_lib._trunk_inputs(fine_cfg, pts, jnp.bfloat16)
lo_fine = np.asarray(jax.device_get(lo_fine))  # host copy -> pass as jit arg

results = {}


def timed(name, program, *args, flops=None):
    """program is jitted over *args; scans REPS bodies inside. Host-read sync.

    Args are device_put ONCE up front: passing numpy arrays directly would
    re-ship them host->device over the network relay on EVERY call, and
    dt/REPS would smear that fixed transfer over the reps (first lab9 run
    printed 84 ms for a pure-IO kernel this way — all transfer).
    """
    try:
        args = [jax.device_put(a) for a in args]
        np.asarray(program(*args))  # warmup also drains the device_put queue
        t0 = time.perf_counter(); np.asarray(program(*args)); dt1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program(*args)); dt = min(dt1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        entry = {"ms": round(ms, 3)}
        msg = f"{name:16s} {ms:8.3f} ms"
        if flops:
            entry["tflops"] = round(flops / (dt / REPS) / 1e12, 1)
            msg += f"   {entry['tflops']:6.1f} TFLOPS"
        log(msg)
    except Exception as e:
        log(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:180]}")
        entry = {"error": str(e)[:180]}
    results[name] = entry
    return entry


def scan_reps(body):
    """jit(program)(x0, ...): scan REPS reps of body(x, *args) perturbing x."""

    def program(x0, *args):
        def wrapped(carry, i):
            return carry + body(x0, i, *args), None

        out, _ = jax.lax.scan(
            wrapped, jnp.zeros((), jnp.float32), jnp.arange(REPS, dtype=jnp.float32)
        )
        return out

    return jax.jit(program)


def cparams():
    return None if F._interpret() else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


# ---- io_only / head_only: the no-matmul floor -----------------------------
def io_kernel(spec, *refs):
    lo_ref, out_ref = refs
    out_ref[:] = jnp.sum(
        lo_ref[:].reshape(spec.tile_rays, spec.ns, -1).astype(jnp.float32), axis=-1
    )


def head_kernel(spec, *refs):
    lo_ref, wt_ref, b_ref, out_ref = refs
    # broadcast the lo tile up to width-256 rows, then run the real head math
    h = jnp.tile(lo_ref[:], (1, -(-256 // lo_ref.shape[1])))[:, :256]
    planes = F._head_planes(spec, h, wt_ref[:], b_ref[:], 1)
    out_ref[:] = planes[0]


for name, kern, extra in (
    ("io_only", io_kernel, ()),
    ("head_only", head_kernel, (np.asarray(jax.device_get(kp_fine["wpo_t"][:1])),
                                np.asarray(jax.device_get(kp_fine["bpo"][:, :1])))),
):
    dspec = dataclasses.replace(
        spec_fine, halves=1, tile_rays=spec_fine.tile_rays // spec_fine.halves
    )

    def body(x, i, *args, dspec=dspec, kern=kern):
        lo = x + (i * 1e-6).astype(jnp.bfloat16)
        in_specs = [F._row_spec(dspec.tile, dspec.in_lo)] + [F._weight_spec()] * (len(args))
        out = pl.pallas_call(
            functools.partial(kern, dspec),
            grid=(N_FINE // dspec.tile,),
            in_specs=in_specs,
            out_specs=F._plane_spec(dspec),
            out_shape=jax.ShapeDtypeStruct((N_FINE // dspec.ns, dspec.ns), jnp.float32),
            interpret=F._interpret(),
            compiler_params=cparams(),
        )(lo, *args)
        return jnp.sum(out)

    timed(name, scan_reps(body), lo_fine, *extra)


# ---- trunk_d8 at tile_rays 8/16/32, parallel vs default -------------------
def trunk_kernel(spec, nkp, *refs):
    lo_ref = refs[0]
    kp_refs = refs[1 : 1 + nkp]
    out_ref = refs[1 + nkp]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    hs = F._trunk_forward(spec, kp, lo_ref[:])
    out_ref[:] = jnp.sum(
        hs[-1].reshape(spec.tile_rays, spec.ns, -1).astype(jnp.float32), axis=-1
    )


TRUNK_FLOPS = (2 * 63 * 256 * 2 + 2 * 256 * 256 * 7) * N_FINE
trunk_keys = None
for tile_rays in (8, 16, 32):
    for par in (False, True):
        dspec = dataclasses.replace(
            spec_fine, views_depth=0, out_v=0, has_extra=False, has_hvx=False,
            halves=1, tile_rays=tile_rays,
        )
        keys_d = [k for k in dspec.param_keys() if not (k.startswith("wpo") or k.startswith("bpo"))]
        kp_d = {k: np.asarray(jax.device_get(kp_fine[k])) for k in keys_d}
        kp_d["wpo_t"] = np.asarray(jax.device_get(kp_fine["wpo_t"][:1]))
        kp_d["bpo"] = np.asarray(jax.device_get(kp_fine["bpo"][:, :1]))
        keys_full = dspec.param_keys()

        def body(x, i, *ws, dspec=dspec, keys_full=keys_full, par=par):
            lo = x + (i * 1e-6).astype(jnp.bfloat16)
            cp = (
                None
                if F._interpret()
                else pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024,
                    dimension_semantics=("parallel",) if par else None,
                )
            )
            out = pl.pallas_call(
                functools.partial(trunk_kernel, dspec, len(keys_full)),
                grid=(N_FINE // dspec.tile,),
                in_specs=[F._row_spec(dspec.tile, dspec.in_lo)]
                + [F._weight_spec()] * len(keys_full),
                out_specs=F._plane_spec(dspec),
                out_shape=jax.ShapeDtypeStruct((N_FINE // dspec.ns, dspec.ns), jnp.float32),
                interpret=F._interpret(),
                compiler_params=cp,
            )(lo, *ws)
            return jnp.sum(out)

        tag = f"trunk_t{tile_rays}" + ("_par" if par else "")
        timed(tag, scan_reps(body), lo_fine, *[kp_d[k] for k in keys_full], flops=TRUNK_FLOPS)

# ---- bare chain with input as ARG (lab8 413 fix) ---------------------------
W = 256
DEPTH = 8
chain_ws = [
    np.asarray((jax.random.normal(jax.random.PRNGKey(10 + i), (W, W), jnp.float32) * 0.05
                ).astype(jnp.bfloat16))
    for i in range(DEPTH)
]
chain_bs = [np.full((1, W), 0.01 * i, np.float32) for i in range(DEPTH)]
x_chain = np.asarray(
    jax.device_get(jax.random.normal(key, (N_FINE, W), jnp.float32).astype(jnp.bfloat16))
)
CHAIN_FLOPS = 2 * N_FINE * W * W * DEPTH
TILE = 1536


def chain_base(nkp, *refs):
    x = refs[0][:]
    for i in range(DEPTH):
        w = refs[1 + i][:]
        b = refs[1 + DEPTH + i][:]
        x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=jnp.float32) + b).astype(jnp.bfloat16)
    refs[-1][:] = x.astype(jnp.float32)


def chain_mm_only(nkp, *refs):
    x = refs[0][:]
    for i in range(DEPTH):
        w = refs[1 + i][:]
        x = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    refs[-1][:] = x.astype(jnp.float32)


def chain_no_cast(nkp, *refs):
    x = refs[0][:].astype(jnp.float32)
    for i in range(DEPTH):
        w = refs[1 + i][:]
        b = refs[1 + DEPTH + i][:]
        x = jax.nn.relu(jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32) + b)
    refs[-1][:] = x


for name, kern in (
    ("chain_base", chain_base),
    ("chain_mm_only", chain_mm_only),
    ("chain_no_cast", chain_no_cast),
):

    def body(x, i, *ws, kern=kern):
        xp = x + (i * 1e-6).astype(jnp.bfloat16)
        out = pl.pallas_call(
            functools.partial(kern, len(ws)),
            grid=(N_FINE // TILE,),
            in_specs=[F._row_spec(TILE, W)] + [F._weight_spec()] * len(ws),
            out_specs=F._row_spec(TILE, W),
            out_shape=jax.ShapeDtypeStruct((N_FINE, W), jnp.float32),
            interpret=F._interpret(),
            compiler_params=cparams(),
        )(xp, *ws)
        return jnp.sum(out)

    timed(name, scan_reps(body), x_chain, *chain_ws, *chain_bs, flops=CHAIN_FLOPS)

# ---- production fine fwd without views branch ------------------------------
novw_cfg = mlp_lib.MLPConfig(num_samples=NS_FINE, use_view_dirs=False, view_dependent_rgb=False)
novw_params = mlp_lib.init(key, novw_cfg)
NOVW_FLOPS = (2 * 63 * 256 * 2 + 2 * 256 * 256 * 7) * N_FINE


def novw_body(x, i):
    out = mlp_lib.apply_fused(
        novw_params, novw_cfg, x + i * 1e-6, view_dirs=None,
        dtype=jnp.bfloat16, view_dirs_tile=NS_FINE,
    )
    return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])


timed("prod_fine_novw", scan_reps(novw_body), np.asarray(jax.device_get(pts)), flops=NOVW_FLOPS)

print(json.dumps(results, indent=2))
