"""Round-3 kernel lab: exact FLOP accounting + per-layer attribution of the
forward/backward fused-MLP kernels, chain-ceiling decomposition, and the
f32-matmul precision question.

VERDICT r2 weak#1: fwd kernels ~100 TFLOPS vs the bare-chain ~150 — find
the 1.5x or prove the residual structural. Experiments:

  flops     — exact MXU-FLOP table for the production passes (host math)
  prod      — production fine fwd / fwd+bwd, coarse-ensemble fwd / fwd+bwd
              (streamed-PE path, bf16), real TFLOPS from the exact table
  depthN    — trunk-only kernels at depth 2/4/6/8 (streamed lo, no heads,
              no views): slope = ms per 256x256 layer, intercept = fixed
              per-pass cost (input DMA, writes, pipeline fill)
  chain     — bare (T,256)@(256,256) chain x8 variants: bias+relu baseline,
              matmul-only, bias folded into an appended ones-column, no
              bf16 re-cast (f32 activations, cast inside mm) -> decomposes
              the 197-peak -> ~150 chain gap into feed vs epilogue
  f32       — production fine fwd with dtype=float32: time (is f32 matmul
              half rate or default-precision bf16?) and numerics vs an
              XLA HIGHEST-precision f32 reference

Run (chip must be otherwise idle):
  nohup python -c "exec(open('scripts/kernel_lab8.py').read())" \
      > /tmp/kernel_lab8.log 2>&1 &
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

from simplenerf_tpu.fields import encoding
from simplenerf_tpu.fields import mlp as mlp_lib
from simplenerf_tpu.ops import fused_mlp as F

REPS = int(os.environ.get("LAB8_REPS", "20"))
NR = int(os.environ.get("LAB8_NR", "4096"))
NS_FINE = 192
NS_COARSE = 64
N_FINE = NR * NS_FINE


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Exact MXU FLOPs per pass (2*M*K*N per matmul; heads are VPU, not counted).
# --------------------------------------------------------------------------
def fwd_flops_per_point(spec: F.FusedSpec) -> int:
    w, wv = spec.width, spec.views_width
    f = 2 * spec.in_lo * w  # w0i
    f += 2 * w * w * (spec.depth - 1)  # w1..w{D-1}
    f += 2 * spec.in_lo * w * len(spec.skip_layers)  # skip joins
    if spec.has_views:
        f += 2 * w * w  # wf
        f += 2 * w * wv  # wv0f
        if spec.has_extra:
            f += 2 * spec.in_hi * wv
        f += 2 * wv * wv * (spec.views_depth - 1)
    return f


def bwd_flops_per_point(spec: F.FusedSpec) -> int:
    """Recompute (1x fwd) + dW (a^T g per layer ~= 1x) + dX (g w^T, one less
    chain link) — all the matmuls _bwd_kernel actually issues."""
    w, wv = spec.width, spec.views_width
    f = fwd_flops_per_point(spec)  # recompute
    # dW mirrors every fwd matmul
    f += fwd_flops_per_point(spec)
    # dX: trunk layers D-1..1 (w{i}), plus views back-chain + wf
    f += 2 * w * w * (spec.depth - 1)
    if spec.has_views:
        f += 2 * w * w  # df -> dh through wf
        f += 2 * w * wv  # g -> df through wv0f
        f += 2 * wv * wv * (spec.views_depth - 1)
    return f


fine_cfg = mlp_lib.MLPConfig(num_samples=NS_FINE)
key = jax.random.PRNGKey(0)
params = mlp_lib.init(key, fine_cfg)
spec_fine = F.make_spec(fine_cfg, NS_FINE, jnp.bfloat16)

FWD_PP = fwd_flops_per_point(spec_fine)
BWD_PP = bwd_flops_per_point(spec_fine)
log(
    f"fine spec: in_lo={spec_fine.in_lo} tile_rays={spec_fine.tile_rays} "
    f"halves={spec_fine.halves}; fwd {FWD_PP/1e6:.3f} MFLOP/pt, "
    f"bwd {BWD_PP/1e6:.3f} MFLOP/pt, fine pass fwd {FWD_PP*N_FINE/1e12:.3f} TFLOP"
)

results = {
    "flops": {
        "fwd_MFLOP_per_pt": FWD_PP / 1e6,
        "bwd_MFLOP_per_pt": BWD_PP / 1e6,
        "fine_fwd_TFLOP": FWD_PP * N_FINE / 1e12,
        "fine_bwd_TFLOP": BWD_PP * N_FINE / 1e12,
    }
}


def timed(name, program, flops):
    """Median-ish of 2 timed scans after a warmup; host-read sync."""
    try:
        np.asarray(program())
        t0 = time.perf_counter(); np.asarray(program()); dt1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(program()); dt = min(dt1, time.perf_counter() - t0)
        ms = dt / REPS * 1e3
        # flops already counts all REPS bodies; dt covers one program() call.
        tf = flops / dt / 1e12
        log(f"{name:18s} {ms:8.2f} ms   {tf:6.1f} TFLOPS (exact)")
        return {"ms": round(ms, 3), "tflops": round(tf, 1)}
    except Exception as e:
        log(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return {"error": str(e)[:200]}


def scan_reps(body):
    def program():
        def wrapped(carry, x):
            return carry + body(x), None
        out, _ = jax.lax.scan(
            wrapped, jnp.zeros((), jnp.float32), jnp.arange(REPS, dtype=jnp.float32)
        )
        return out
    return jax.jit(program)


pts = jax.random.uniform(key, (N_FINE, 3), jnp.float32, -1.0, 1.0)
dirs = jax.random.normal(key, (NR, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

# ---- prod: production fine fwd and fwd+bwd (streamed PE, bf16) -----------
def prod_fwd_body(x):
    out = mlp_lib.apply_fused(
        params, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
        dtype=jnp.bfloat16, view_dirs_tile=NS_FINE,
    )
    return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])


results["prod_fine_fwd"] = timed(
    "prod_fine_fwd", scan_reps(prod_fwd_body), REPS * FWD_PP * N_FINE
)


def prod_grad_body(x):
    def f(p):
        out = mlp_lib.apply_fused(
            p, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
            dtype=jnp.bfloat16, view_dirs_tile=NS_FINE,
        )
        return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])

    g = jax.grad(f)(params)
    return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g))


results["prod_fine_fwdbwd"] = timed(
    "prod_fine_fwdbwd", scan_reps(prod_grad_body), REPS * (FWD_PP + BWD_PP) * N_FINE
)

# ---- coarse ensemble (3 members, shared PE) ------------------------------
pa_cfg = mlp_lib.MLPConfig(num_samples=NS_COARSE, points_sigma_pe_degree=3)
va_cfg = mlp_lib.MLPConfig(num_samples=NS_COARSE, use_view_dirs=False, view_dependent_rgb=False)
co_cfg = mlp_lib.MLPConfig(num_samples=NS_COARSE)
co_params = [mlp_lib.init(jax.random.PRNGKey(i), c) for i, c in enumerate((co_cfg, pa_cfg, va_cfg))]
pts_c = jax.random.uniform(key, (NR * NS_COARSE, 3), jnp.float32, -1.0, 1.0)

ens_specs = [
    F.make_spec(c, NS_COARSE, jnp.bfloat16) for c in (co_cfg, pa_cfg, va_cfg)
]
ENS_FWD = sum(fwd_flops_per_point(s) for s in ens_specs) * NR * NS_COARSE
ENS_BWD = sum(bwd_flops_per_point(s) for s in ens_specs) * NR * NS_COARSE
results["flops"]["ens_fwd_TFLOP"] = ENS_FWD / 1e12
results["flops"]["ens_bwd_TFLOP"] = ENS_BWD / 1e12


def ens_fwd_body(x):
    outs = mlp_lib.apply_fused_ensemble(
        [(p, c) for p, c in zip(co_params, (co_cfg, pa_cfg, va_cfg))],
        pts_c + x * 1e-6, view_dirs=dirs, dtype=jnp.bfloat16,
        view_dirs_tile=NS_COARSE,
    )
    return sum(jnp.sum(o["sigma"]) for o in outs)


results["prod_ens_fwd"] = timed("prod_ens_fwd", scan_reps(ens_fwd_body), REPS * ENS_FWD)


def ens_grad_body(x):
    def f(plist):
        outs = mlp_lib.apply_fused_ensemble(
            [(p, c) for p, c in zip(plist, (co_cfg, pa_cfg, va_cfg))],
            pts_c + x * 1e-6, view_dirs=dirs, dtype=jnp.bfloat16,
            view_dirs_tile=NS_COARSE,
        )
        return sum(jnp.sum(o["sigma"]) + jnp.sum(o["rgb"]) for o in outs)

    g = jax.grad(f)(co_params)
    return sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g))


results["prod_ens_fwdbwd"] = timed(
    "prod_ens_fwdbwd", scan_reps(ens_grad_body), REPS * (ENS_FWD + ENS_BWD)
)

# ---- depth sweep: trunk-only kernel, streamed lo, no heads/views ----------
def trunk_kernel(spec, nkp, *refs):
    lo_ref = refs[0]
    kp_refs = refs[1 : 1 + nkp]
    out_ref = refs[1 + nkp]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}
    hs = F._trunk_forward(spec, kp, lo_ref[:])
    # one cheap plane so nothing is dead-code eliminated
    out_ref[:] = jnp.sum(
        hs[-1].reshape(spec.tile_rays, spec.ns, -1).astype(jnp.float32), axis=-1
    )


kp_fine = F.kernel_params(params, fine_cfg)
lo_fine, _ = mlp_lib._trunk_inputs(fine_cfg, pts, jnp.bfloat16)

for depth in (2, 4, 6, 8):
    dspec = dataclasses.replace(
        spec_fine, depth=depth, views_depth=0, out_v=0, has_extra=False,
        has_hvx=False, halves=1, tile_rays=spec_fine.tile_rays // spec_fine.halves,
        skip_layers=(4,) if depth > 5 else (),
    )
    keys_d = [k for k in dspec.param_keys() if not (k.startswith("wpo") or k.startswith("bpo"))]
    kp_d = {k: kp_fine[k] for k in keys_d}
    kp_d["wpo_t"] = kp_fine["wpo_t"][:1]
    kp_d["bpo"] = kp_fine["bpo"][:, :1]
    keys_full = dspec.param_keys()

    def trunk_call(x, dspec=dspec, kp_d=kp_d, keys_full=keys_full):
        n = lo_fine.shape[0]
        in_specs = [F._row_spec(dspec.tile, dspec.in_lo)] + [F._weight_spec()] * len(keys_full)
        inputs = [lo_fine + x * 1e-6] + [kp_d[k] for k in keys_full]
        out = pl.pallas_call(
            functools.partial(trunk_kernel, dspec, len(keys_full)),
            grid=(n // dspec.tile,),
            in_specs=in_specs,
            out_specs=F._plane_spec(dspec),
            out_shape=jax.ShapeDtypeStruct((n // dspec.ns, dspec.ns), jnp.float32),
            interpret=F._interpret(),
            compiler_params=None if F._interpret() else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * 256 * 256 * depth, bytes_accessed=n * 32, transcendentals=0
            ),
        )(*inputs)
        return jnp.sum(out)

    dflops = (
        2 * dspec.in_lo * 256 * (1 + len(dspec.skip_layers)) + 2 * 256 * 256 * (depth - 1)
    ) * N_FINE
    results[f"trunk_d{depth}"] = timed(f"trunk_d{depth}", scan_reps(trunk_call), REPS * dflops)

# ---- bare chain variants ---------------------------------------------------
W = 256
DEPTH = 8
chain_ws = [
    jax.random.normal(jax.random.PRNGKey(10 + i), (W, W), jnp.float32).astype(jnp.bfloat16) * 0.05
    for i in range(DEPTH)
]
chain_bs = [jnp.zeros((1, W), jnp.float32) + 0.01 * i for i in range(DEPTH)]
x_chain = jax.random.normal(key, (N_FINE, W), jnp.float32).astype(jnp.bfloat16)
CHAIN_FLOPS = 2 * N_FINE * W * W * DEPTH
TILE = 1536


def chain_call(kernel_fn, extra=(), name=""):
    def body(x):
        inputs = [x_chain] + list(chain_ws) + list(chain_bs) + list(extra)
        in_specs = (
            [F._row_spec(TILE, W)]
            + [F._weight_spec()] * (2 * DEPTH)
            + [F._weight_spec()] * len(extra)
        )
        out = pl.pallas_call(
            kernel_fn,
            grid=(N_FINE // TILE,),
            in_specs=in_specs,
            out_specs=F._row_spec(TILE, W),
            out_shape=jax.ShapeDtypeStruct((N_FINE, W), jnp.float32),
            interpret=F._interpret(),
            compiler_params=None if F._interpret() else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=CHAIN_FLOPS, bytes_accessed=N_FINE * 2 * W * 2, transcendentals=0
            ),
        )(inputs[0] + (x * 1e-6).astype(jnp.bfloat16), *inputs[1:])
        return jnp.sum(out)

    return scan_reps(body)


def chain_base(*refs):
    x = refs[0][:]
    for i in range(DEPTH):
        w = refs[1 + i][:]
        b = refs[1 + DEPTH + i][:]
        x = jax.nn.relu(
            jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        ).astype(jnp.bfloat16)
    refs[-1][:] = x.astype(jnp.float32)


def chain_mm_only(*refs):
    x = refs[0][:]
    for i in range(DEPTH):
        w = refs[1 + i][:]
        x = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    refs[-1][:] = x.astype(jnp.float32)


def chain_no_cast(*refs):
    # keep activations f32; cast to bf16 only at the matmul input
    x = refs[0][:].astype(jnp.float32)
    for i in range(DEPTH):
        w = refs[1 + i][:]
        b = refs[1 + DEPTH + i][:]
        x = jax.nn.relu(
            jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32) + b
        )
    refs[-1][:] = x


def chain_relu_only(*refs):
    # bias dropped: mm + relu + cast
    x = refs[0][:]
    for i in range(DEPTH):
        w = refs[1 + i][:]
        x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    refs[-1][:] = x.astype(jnp.float32)


results["chain_base"] = timed("chain_base", chain_call(chain_base), REPS * CHAIN_FLOPS)
results["chain_mm_only"] = timed("chain_mm_only", chain_call(chain_mm_only), REPS * CHAIN_FLOPS)
results["chain_no_cast"] = timed("chain_no_cast", chain_call(chain_no_cast), REPS * CHAIN_FLOPS)
results["chain_relu_only"] = timed(
    "chain_relu_only", chain_call(chain_relu_only), REPS * CHAIN_FLOPS
)

# ---- f32 production fwd: time + precision semantics ------------------------
def prod_fwd_f32_body(x):
    out = mlp_lib.apply_fused(
        params, fine_cfg, pts + x * 1e-6, view_dirs=dirs,
        dtype=jnp.float32, view_dirs_tile=NS_FINE,
    )
    return jnp.sum(out["sigma"]) + jnp.sum(out["rgb"])


results["prod_fine_fwd_f32"] = timed(
    "prod_fine_fwd_f32", scan_reps(prod_fwd_f32_body), REPS * FWD_PP * N_FINE
)

# Numerics: kernel f32 vs XLA HIGHEST f32 blocked path on a subset.
n_sub = min(spec_fine.tile * 4, N_FINE)
pts_sub = pts[:n_sub]
dirs_sub = dirs[: n_sub // NS_FINE]
out_k32 = mlp_lib.apply_fused(
    params, fine_cfg, pts_sub, view_dirs=dirs_sub, dtype=jnp.float32, view_dirs_tile=NS_FINE
)
out_k16 = mlp_lib.apply_fused(
    params, fine_cfg, pts_sub, view_dirs=dirs_sub, dtype=jnp.bfloat16, view_dirs_tile=NS_FINE
)
with jax.default_matmul_precision("highest"):
    raw_ref = mlp_lib.apply(
        params, fine_cfg, pts_sub, view_dirs=dirs_sub, dtype=jnp.float32,
        view_dirs_tile=NS_FINE,
    )
    out_ref = mlp_lib.to_planes(raw_ref, n_sub // NS_FINE, NS_FINE)


def max_rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b) + 1e-3)))


results["f32_numerics"] = {
    "kernel_f32_vs_highest_sigma": max_rel(out_k32["sigma"], out_ref["sigma"]),
    "kernel_bf16_vs_highest_sigma": max_rel(out_k16["sigma"], out_ref["sigma"]),
    "kernel_f32_vs_highest_rgb": max_rel(out_k32["rgb"], out_ref["rgb"]),
    "kernel_bf16_vs_highest_rgb": max_rel(out_k16["rgb"], out_ref["rgb"]),
}
log(json.dumps(results["f32_numerics"]))

print(json.dumps(results, indent=2))
