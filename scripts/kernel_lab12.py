"""Round-3 kernel lab 12: dispatch-bias-free production pass timings.

lab11e found every REPS=20 scanned-timing lab carries a +1.14 ms/rep
additive bias: the relay backend's ~23 ms dispatch RTT divided by REPS
(tiny-pallas and tiny-XLA scan bodies both time 1.14 ms/rep at REPS=20
and 0.23 at REPS=100 — identical, so it is the dispatch, not the work).
This lab re-times the four production passes at REPS=20 AND REPS=100;
the REPS=100 numbers (bias 0.23) are the honest per-pass costs, and the
20-vs-100 delta must be ~0.91 ms if the bias model is right.

Run (chip idle):  nohup python -c "exec(open('scripts/kernel_lab12.py').read())" \
      > /tmp/kernel_lab12.log 2>&1 &
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

NR = 4096
NS_FINE = 192
NS_COARSE = 64
N_FINE = NR * NS_FINE

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

results = {}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(name, body, reps):
    def program():
        def wrapped(c, i):
            return c + body(i), None
        out, _ = jax.lax.scan(wrapped, jnp.zeros((), jnp.float32),
                              jnp.arange(reps, dtype=jnp.float32))
        return out

    p = jax.jit(program)
    try:
        np.asarray(p())
        t0 = time.perf_counter(); np.asarray(p()); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(p()); dt = min(d1, time.perf_counter() - t0)
        ms = dt / reps * 1e3
        log(f"{name:24s} r{reps:<4d} {ms:8.3f} ms/rep")
        results[f"{name}_r{reps}"] = round(ms, 3)
    except Exception as e:
        log(f"{name:24s} r{reps:<4d} FAILED: {type(e).__name__}: {str(e)[:150]}")
        results[f"{name}_r{reps}"] = str(e)[:120]


def fine_fwd(i):
    out = mlp_lib.apply_fused(params, fine_cfg, pts + i * 1e-6, view_dirs=dirs,
                              dtype=jnp.bfloat16, view_dirs_tile=NS_FINE)
    return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])


def ens_fwd(i):
    outs = mlp_lib.apply_fused_ensemble(
        [(p, c) for p, c in zip(co_params, (co_cfg, pa_cfg, va_cfg))],
        pts_c + i * 1e-6, view_dirs=dirs, dtype=jnp.bfloat16, view_dirs_tile=NS_COARSE)
    return sum(jnp.sum(o["sigma"]) for o in outs)


def fine_grad(i):
    def f(p):
        out = mlp_lib.apply_fused(p, fine_cfg, pts + i * 1e-6, view_dirs=dirs,
                                  dtype=jnp.bfloat16, view_dirs_tile=NS_FINE)
        return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])
    g = jax.grad(f)(params)
    return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g))


def ens_grad(i):
    def f(ps):
        outs = mlp_lib.apply_fused_ensemble(
            [(p, c) for p, c in zip(ps, (co_cfg, pa_cfg, va_cfg))],
            pts_c + i * 1e-6, view_dirs=dirs, dtype=jnp.bfloat16, view_dirs_tile=NS_COARSE)
        return sum(jnp.sum(o["sigma"]) + jnp.sum(o["rgb"]) for o in outs)
    g = jax.grad(f)(co_params)
    return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g))


for reps in (20, 100):
    timed("fine_fwd", fine_fwd, reps)
    timed("ens_fwd", ens_fwd, reps)
    timed("fine_fwdbwd", fine_grad, reps)
    timed("ens_fwdbwd", ens_grad, reps)

# Exact MXU-FLOP accounting (same formulas as kernel_lab8.py) so every
# quoted rate in RESULTS.md is derived in-script, not by hand.
from simplenerf_tpu.ops import fused_mlp as F  # noqa: E402


def _fwd_flops_per_point(spec):
    w, wv = spec.width, spec.views_width
    f = 2 * spec.in_lo * w
    f += 2 * w * w * (spec.depth - 1)
    f += 2 * spec.in_lo * w * len(spec.skip_layers)
    if spec.has_views:
        f += 2 * w * w + 2 * w * wv
        if spec.has_extra:
            f += 2 * spec.in_hi * wv
        f += 2 * wv * wv * (spec.views_depth - 1)
    return f


def _bwd_flops_per_point(spec):
    w, wv = spec.width, spec.views_width
    f = 2 * _fwd_flops_per_point(spec)  # recompute + dW
    f += 2 * w * w * (spec.depth - 1)  # dX trunk
    if spec.has_views:
        f += 2 * w * w + 2 * w * wv + 2 * wv * wv * (spec.views_depth - 1)
    return f


_spec_fine = F.make_spec(fine_cfg, NS_FINE, jnp.bfloat16)
_ens_specs = [F.make_spec(c, NS_COARSE, jnp.bfloat16) for c in (co_cfg, pa_cfg, va_cfg)]
PASS_TFLOP = {
    "fine_fwd": _fwd_flops_per_point(_spec_fine) * N_FINE / 1e12,
    "fine_fwdbwd": (_fwd_flops_per_point(_spec_fine) + _bwd_flops_per_point(_spec_fine))
    * N_FINE / 1e12,
    "ens_fwd": sum(_fwd_flops_per_point(s) for s in _ens_specs) * NR * NS_COARSE / 1e12,
    "ens_fwdbwd": sum(_fwd_flops_per_point(s) + _bwd_flops_per_point(s) for s in _ens_specs)
    * NR * NS_COARSE / 1e12,
}
RESIDUAL_BIAS_MS = 0.23  # 23 ms dispatch RTT / 100 reps (lab 11e)
for name, tflop in PASS_TFLOP.items():
    ms = results.get(f"{name}_r100")
    if isinstance(ms, float):
        debiased_ms = ms - RESIDUAL_BIAS_MS
        results[f"{name}_debiased_ms"] = round(debiased_ms, 3)
        results[f"{name}_tflops_r100"] = round(tflop / (debiased_ms / 1e3), 1)
print(json.dumps(results, indent=2))
