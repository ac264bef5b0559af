"""Round-4 kernel lab 14: patch-gather lowering shootout.

Glue lab 2 found the consistency losses' 5x5 patch gather at 72x the HBM
roofline (1.43 ms of the loss stack's forward). The first rewrite (vmapped
dynamic_slice -> lax.gather of (5,15) spans) was committed unmeasured and
the full step REGRESSED 57.6 -> 78 ms — this lab measures every candidate
in isolation at the production call-site shape so the winner is chosen by
data, not plausibility.

Variants (each gathers (nr, 5, 5, 3) patches from (n, h, w, 3) images,
nr=4096 rays x 9 call sites per step):
  take25      original: 25 unrolled jnp.take of (nr, 3) rows
  slice2d     vmapped dynamic_slice of (5, 15) spans from (n*h, w*c)
  take_flat   ONE jnp.take of (nr*25, 3) rows (indices precomputed)
  take_rows   5 vmapped dynamic_slice of (1, 15) row spans, stacked
  take_pad8   ONE jnp.take of (nr*25, 8) rows from channel-padded images

Run (chip idle):
  nohup python -c "exec(open('scripts/kernel_lab14.py').read())" \
      > /tmp/kernel_lab14.log 2>&1 &
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

REPS = int(os.environ.get("LAB_REPS", "100"))
RESIDUAL_MS = 23.0 / REPS
NR = 4096
N, H, W, C = 3, 189, 252, 3
PY = PX = 5
HY, HX = 2, 2
SITES = 9  # patch-gather call sites per train step (3 losses x 3 patches)

key = jax.random.PRNGKey(0)
images = jax.random.uniform(key, (N, H, W, C), jnp.float32)
ids = jax.random.randint(jax.random.PRNGKey(1), (NR,), 0, N)
xs = jax.random.randint(jax.random.PRNGKey(2), (NR,), HX, W - HX)
ys = jax.random.randint(jax.random.PRNGKey(3), (NR,), HY, H - HY)

results = {"reps": REPS, "sites_per_step": SITES}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(name, body, *args):
    def program(*a):
        def wrapped(c, i):
            return c + body(i, *a), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(REPS, dtype=jnp.int32))
        return out

    p = jax.jit(program)
    try:
        np.asarray(p(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(p(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / REPS * 1e3 - RESIDUAL_MS
        results[name] = {"ms": round(ms, 4), "step_ms_9sites": round(ms * SITES, 3)}
        log(f"{name:10s} {ms:8.4f} ms/site  ({ms * SITES:6.3f} ms/step x9)")
    except Exception as e:  # noqa: BLE001
        log(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:150]}")
        results[name] = {"error": str(e)[:140]}


def checksum(p):
    return jnp.sum(p)


def take25(i, imgs, ids_, xs_, ys_):
    flat = imgs.reshape(N * H * W, C)
    x = (xs_ + i) % (W - PX) + HX
    rows = []
    for dy in range(-HY, HY + 1):
        yy = jnp.clip(ys_ + dy, 0, H - 1)
        cols = []
        for dx in range(-HX, HX + 1):
            xx = jnp.clip(x + dx, 0, W - 1)
            idx = ids_ * (H * W) + yy * W + xx
            cols.append(jnp.take(flat, idx, axis=0))
        rows.append(jnp.stack(cols, axis=1))
    return checksum(jnp.stack(rows, axis=1))


def slice2d(i, imgs, ids_, xs_, ys_):
    rows2 = imgs.reshape(N * H, W * C)
    x = (xs_ + i) % (W - PX) + HX
    sy = ids_ * H + jnp.clip(ys_ - HY, 0, H - PY)
    sx = jnp.clip(x - HX, 0, W - PX) * C

    def one(a, b):
        return jax.lax.dynamic_slice(rows2, (a, b), (PY, PX * C))

    return checksum(jax.vmap(one)(sy, sx))


def take_flat(i, imgs, ids_, xs_, ys_):
    flat = imgs.reshape(N * H * W, C)
    x = (xs_ + i) % (W - PX) + HX
    dy = jnp.arange(-HY, HY + 1)
    dx = jnp.arange(-HX, HX + 1)
    yy = jnp.clip(ys_[:, None] + dy[None, :], 0, H - 1)  # (nr, 5)
    xx = jnp.clip(x[:, None] + dx[None, :], 0, W - 1)  # (nr, 5)
    idx = (ids_[:, None, None] * (H * W) + yy[:, :, None] * W + xx[:, None, :])
    return checksum(jnp.take(flat, idx.reshape(-1), axis=0))


def take_rows(i, imgs, ids_, xs_, ys_):
    rows2 = imgs.reshape(N * H, W * C)
    x = (xs_ + i) % (W - PX) + HX
    sx = jnp.clip(x - HX, 0, W - PX) * C

    def one_row(r, b):
        return jax.lax.dynamic_slice(rows2, (r, b), (1, PX * C))

    outs = []
    for dy in range(-HY, HY + 1):
        ry = ids_ * H + jnp.clip(ys_ + dy, 0, H - 1)
        outs.append(jax.vmap(one_row)(ry, sx))
    return checksum(jnp.stack(outs, axis=1))


imgs_pad8 = jnp.pad(images, ((0, 0), (0, 0), (0, 0), (0, 5)))


def take_pad8(i, imgs8, ids_, xs_, ys_):
    flat = imgs8.reshape(N * H * W, 8)
    x = (xs_ + i) % (W - PX) + HX
    dy = jnp.arange(-HY, HY + 1)
    dx = jnp.arange(-HX, HX + 1)
    yy = jnp.clip(ys_[:, None] + dy[None, :], 0, H - 1)
    xx = jnp.clip(x[:, None] + dx[None, :], 0, W - 1)
    idx = (ids_[:, None, None] * (H * W) + yy[:, :, None] * W + xx[:, None, :])
    return checksum(jnp.take(flat, idx.reshape(-1), axis=0)[:, :C])


timed("take25", take25, images, ids, xs, ys)
timed("slice2d", slice2d, images, ids, xs, ys)
timed("take_flat", take_flat, images, ids, xs, ys)
timed("take_rows", take_rows, images, ids, xs, ys)
timed("take_pad8", take_pad8, imgs_pad8, ids, xs, ys)

print(json.dumps(results, indent=2))
