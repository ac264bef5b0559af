"""Round-3 kernel lab 11: is the 2.2 ms per-pass fixed cost the row->plane
RELAYOUT, and does an MXU-matmul relayout remove it?

lab9's io_only kernel (read (1536,64) lo tile, write one (8,192) plane via
lane-reduce + reshape) costs 2.20 ms with ZERO matmuls — tile-invariant,
far above HBM time. The plane write moves the per-(ray,sample) value from
SUBLANE position (rows of the 1536-row tile) to LANE position (the
ns=192 axis of the (8,192) plane): a classic Mosaic relayout. Variants:

  io_only      — lab9 baseline: lane-reduce + reshape relayout  (2.20 ms)
  in_reduce    — same input, output one (1,128) f32 block per step (full
                 scalar reduce, no plane): prices input DMA + grid alone
  plane_norel  — same input read, plane computed from a native (8,192)
                 iota (+ lo[0,0] so input DMA isn't DCE'd): prices plane
                 OUTPUT DMA without any relayout
  plane_mm     — plane computed via two small MXU matmuls instead of the
                 shuffle relayout: M = (lo32 @ ones(64,192)) * sel_mask,
                 plane = S(8,1536) @ M with S/sel one-hot iota masks.
                 Same math as io_only (row-sums placed at [k//192, k%192]).

If plane_mm ~= plane_norel << io_only, the fixed cost is the relayout and
_head_planes should switch to the matmul trick (fwd heads + bwd dp3).

Run (chip idle):  nohup python -c "exec(open('scripts/kernel_lab11.py').read())" \
      > /tmp/kernel_lab11.log 2>&1 &
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplenerf_tpu.fields import mlp as mlp_lib
from simplenerf_tpu.ops import fused_mlp as F

REPS = int(os.environ.get("LAB11_REPS", "20"))
NR = int(os.environ.get("LAB11_NR", "4096"))
NS = 192
N = NR * NS
TILE_RAYS = 8
TILE = TILE_RAYS * NS  # 1536
IN_LO = 64

results = {}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(name, program, *args):
    try:
        args = [jax.device_put(a) for a in args]
        np.asarray(program(*args))
        t0 = time.perf_counter(); np.asarray(program(*args)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program(*args)); dt = min(d1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        log(f"{name:14s} {ms:8.3f} ms")
        results[name] = round(ms, 3)
    except Exception as e:
        log(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:180]}")
        results[name] = str(e)[:120]


def scan_reps(body):
    def program(x0):
        def wrapped(c, i):
            return c + body(x0, i), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.float32))
        return out
    return jax.jit(program)


def cparams():
    return None if F._interpret() else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


key = jax.random.PRNGKey(0)
lo = np.asarray(jax.device_get(
    jax.random.normal(key, (N, IN_LO), jnp.float32).astype(jnp.bfloat16)))


def io_only_kernel(refs0, refs1):
    refs1[:] = jnp.sum(
        refs0[:].reshape(TILE_RAYS, NS, -1).astype(jnp.float32), axis=-1)


def in_reduce_kernel(refs0, refs1):
    refs1[:] = jnp.full((8, 128), jnp.sum(refs0[:].astype(jnp.float32)))


def plane_norel_kernel(refs0, refs1):
    v = refs0[0, 0].astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_RAYS, NS), 1)
    refs1[:] = iota.astype(jnp.float32) + v


def plane_mm_kernel(refs0, refs1):
    lo32 = refs0[:].astype(jnp.float32)
    rows = jnp.dot(lo32, jnp.ones((IN_LO, NS), jnp.float32),
                   preferred_element_type=jnp.float32)  # (TILE, NS) all=rowsum
    # one-hot masks from iota (no relayout): sel[k, s] = (k % NS == s);
    # s_mat[r, k] = (k // NS == r)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (TILE, NS), 0)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (TILE, NS), 1)
    sel = (k_col % NS == s_col).astype(jnp.float32)
    r_row = jax.lax.broadcasted_iota(jnp.int32, (TILE_RAYS, TILE), 0)
    k_row = jax.lax.broadcasted_iota(jnp.int32, (TILE_RAYS, TILE), 1)
    s_mat = (k_row // NS == r_row).astype(jnp.float32)
    m = rows * sel                                       # keep col k%NS only
    refs1[:] = jnp.dot(s_mat, m, preferred_element_type=jnp.float32)


def make_body(kern, n_extra=0, out_block=(TILE_RAYS, NS), out_rows=None):
    out_rows = out_rows if out_rows is not None else N // NS

    def body(x, i):
        xp = x + (i * 1e-6).astype(jnp.bfloat16)
        out = pl.pallas_call(
            kern,
            grid=(N // TILE,),
            in_specs=[F._row_spec(TILE, IN_LO)],
            out_specs=pl.BlockSpec(out_block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_rows, out_block[1]), jnp.float32),
            interpret=F._interpret(),
            compiler_params=cparams(),
        )(xp)
        return jnp.sum(out)

    return body


timed("io_only", scan_reps(make_body(io_only_kernel)), lo)
timed("in_reduce", scan_reps(make_body(in_reduce_kernel, out_block=(8, 128), out_rows=8 * (N // TILE))), lo)


# --- discriminate per-byte vs per-call vs lane-width ----------------------
def make_reduce_body(n_rows, in_cols):
    def body(x, i):
        xp = x + (i * 1e-6).astype(jnp.bfloat16)

        def kern(r0, r1):
            r1[:] = jnp.full((8, 128), jnp.sum(r0[:].astype(jnp.float32)))

        out = pl.pallas_call(
            kern,
            grid=(n_rows // TILE,),
            in_specs=[F._row_spec(TILE, in_cols)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8 * (n_rows // TILE), 128), jnp.float32),
            interpret=F._interpret(),
            compiler_params=cparams(),
        )(xp)
        return jnp.sum(out)

    return body


lo_q = lo[: N // 4]
lo128 = np.asarray(jax.device_get(
    jax.random.normal(key, (N, 128), jnp.float32).astype(jnp.bfloat16)))
timed("in_quarter", scan_reps(make_reduce_body(N // 4, IN_LO)), lo_q)
timed("in_w128", scan_reps(make_reduce_body(N, 128)), lo128)


def split2_body(x, i):
    # same total rows as in_reduce, but TWO pallas_calls: if the 1.25 ms
    # is per-call fixed cost, this costs one extra fixed unit (~3.4 ms)
    half = make_reduce_body(N // 2, IN_LO)
    return half(x[: N // 2], i) + half(x[N // 2 :], i)


timed("in_split2", scan_reps(split2_body), lo)
timed("in_tiny", scan_reps(make_reduce_body(TILE, IN_LO)), lo[:TILE])
if os.environ.get("LAB11_NOREL", "0") == "1":
    # crashes the remote compile helper (HTTP 500) — int-iota plane with a
    # scalar add fails somewhere in Mosaic; superseded by in_reduce anyway
    timed("plane_norel", scan_reps(make_body(plane_norel_kernel)), lo)
timed("plane_mm", scan_reps(make_body(plane_mm_kernel)), lo)

# correctness: plane_mm must equal io_only exactly (both are row-sums
# placed at [k // NS, k % NS])
if os.environ.get("LAB11_CHECK", "1") == "1":
    a = jax.jit(make_body(io_only_kernel))(jax.device_put(lo), jnp.zeros((), jnp.float32))
    b = jax.jit(make_body(plane_mm_kernel))(jax.device_put(lo), jnp.zeros((), jnp.float32))
    log(f"check io_only sum {float(a):.4f} vs plane_mm sum {float(b):.4f}")

print(json.dumps(results, indent=2))
