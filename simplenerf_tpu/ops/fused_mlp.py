"""Fully-fused NeRF field MLP as a Pallas TPU kernel (forward + custom VJP).

Why: at the published workload (786k points x 8x256 trunk, reference
src/NerfLlffTrainerTester01.py:257-267,273) each XLA layer round-trips its
(N, 256) activation through HBM — ~0.8 GB of traffic per layer against only
0.1 TFLOP of matmul, i.e. ~4x under the v5e memory roofline. This kernel
evaluates positional encoding + trunk + heads for a tile of points entirely
in VMEM: the only HBM traffic is the (N, 3) points in and the per-quantity
output planes, while every weight matrix (~1.3 MB bf16) stays resident
across grid steps. The backward kernel recomputes activations per tile
(VMEM-resident) and accumulates f32 dW across the sequential grid, so
training needs no stashed (N, W) residuals at all.

TPU-first output layout: every head quantity (sigma, r, g, b, visibility)
is emitted as its own **(num_rays, num_samples) plane** — the natural TPU
shape (samples on the 128-lane axis). Narrow (N, 1)/(N, 3) arrays tile to
(8, 128) in HBM, a 128x/42x physical blow-up that costs ~10 ms/step in
epilogue+compositing traffic at the published shape (measured on v5e); the
plane layout eliminates those arrays everywhere between the kernel and the
per-ray compositing outputs. In-kernel, head channels are computed as VPU
lane-reductions over the (tile_rays, ns, W) view of the trunk activation,
so no (T, 1) column ever exists.

Semantics match `fields.mlp.apply` (the blocked evaluation, itself verified
against the reference transcription of src/models/SimpleNeRF01.py:560-715):

- PE is computed in-kernel: z = pts @ B (one small matmul), one wide sin,
  one wide cos, assembled into the blocked [x | sin | cos] channel layout.
- The trunk-input and skip joins are SINGLE matmuls against row-merged
  weights (`kernel_params` pre-permutes rows to the blocked order), so no
  concatenation with canonical-layout weights and no K=3/K=30 matmul salvo.
- The per-ray view-direction contribution to the views branch is the ONLY
  piece left outside: `hv_extra = enc(view_dirs) @ Wv0_dirs` is an
  (num_rays, Wv) matmul — tiny — whose cotangent the backward kernel emits
  so autodiff reaches the dirs rows of the first views-branch weight.
- Sigma noise / ReLU / sigmoids stay in the XLA epilogue, now elementwise
  on (num_rays, ns) planes (fully lane-utilized; XLA fuses them into the
  consumers).

No gradients are produced for the points themselves: sample positions are
detached in the reference too (z-vals from stop-gradient importance
sampling; rays are data).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplenerf_tpu.fields import encoding

# Flat, order-deterministic kernel parameter keys are built by plan(); the
# kernels receive them positionally.


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fwd_grid_semantics():
    """Forward grids are embarrassingly parallel over row tiles (each grid
    step writes its own output block); telling Mosaic so lets it pipeline
    the steps more aggressively. The backward must stay sequential — its
    weight-grad outputs revisit the same block every step (accumulation).
    Env-gated for on-chip A/B (`SIMPLENERF_FWD_PARALLEL_GRID=1` enables;
    default off until measured).
    """
    if os.environ.get("SIMPLENERF_FWD_PARALLEL_GRID", "0") == "1":
        return ("parallel",)
    return None


def _tile_rays_override() -> Optional[int]:
    """Env override for the forward/backward ray-tile size sweep
    (`SIMPLENERF_TILE_RAYS`; must keep tile_rays*ns rows a multiple of 8)."""
    v = os.environ.get("SIMPLENERF_TILE_RAYS")
    return int(v) if v else None


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Static shape/architecture info the kernels close over (hashable)."""

    depth: int
    width: int
    views_depth: int  # 0 = no views branch
    views_width: int
    pe_degree: int  # full points PE degree d
    sigma_pe_degree: int  # ds <= d; trunk sees frequencies < ds
    skip_layers: tuple[int, ...]
    out_p: int  # points-head output channels (1 or 4)
    out_v: int  # views-head output channels (0, 3 or 4)
    has_extra: bool  # high-freq channels routed to views branch (ds < d)
    has_hvx: bool  # per-ray hv_extra input present (use_view_dirs)
    ns: int  # samples per ray = plane lane width; 1 = per-point
    tile_rays: int  # rays per tile; tile rows T = tile_rays * ns
    dtype: str  # matmul input precision: "float32" | "bfloat16"
    # Forward-only: process the tile as `halves` independent row-chains so
    # Mosaic can overlap one chain's VPU work (PE sin/cos, head reductions)
    # with the other's MXU matmuls. 1 = single chain.
    halves: int = 1
    # Ensemble mode: all members read ONE shared full-degree lo block
    # [x | s f<D | c f<D]; the member's input joins (w0i/w{i}i/wv0i) carry
    # zero rows for the frequencies outside its own window (kernel_params
    # `shared_degree`), so no per-member lane slicing or input stream exists.
    shared_pe_degree: Optional[int] = None

    @property
    def tile(self) -> int:
        return self.tile_rays * self.ns

    @property
    def cdtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def has_views(self) -> bool:
        return self.views_depth > 0 or self.out_v > 0

    @property
    def in_lo(self) -> int:
        """Trunk input channels: [x | sin f<ds | cos f<ds] (or shared full)."""
        d = self.shared_pe_degree if self.shared_pe_degree is not None else self.sigma_pe_degree
        return 3 + 6 * d

    @property
    def in_hi(self) -> int:
        """Views-branch extra channels: [sin f>=ds | cos f>=ds] (or shared full)."""
        if not self.has_extra:
            return 0
        if self.shared_pe_degree is not None:
            return 3 + 6 * self.shared_pe_degree
        return 6 * (self.pe_degree - self.sigma_pe_degree)

    @property
    def n_planes(self) -> int:
        return self.out_p + self.out_v

    def param_keys(self) -> list[str]:
        """Kernel parameter names, in kernel argument order."""
        keys = ["w0i", "b0"]
        for i in range(1, self.depth):
            keys += [f"w{i}", f"b{i}"]
            if (i - 1) in self.skip_layers:
                keys += [f"w{i}i"]
        keys += ["wpo_t", "bpo"]
        if self.has_views:
            keys += ["wf", "bf", "wv0f", "bv0"]
            if self.has_extra:
                keys += ["wv0i"]
            for i in range(1, self.views_depth):
                keys += [f"wv{i}", f"bv{i}"]
            keys += ["wvo_t", "bvo"]
        return keys


def make_spec(cfg, ns: int, dtype) -> FusedSpec:
    """Build the static spec for one `fields.mlp.MLPConfig` evaluation.

    ns is the hvx grouping: samples per ray when view dirs are per-ray,
    else 1. tile_rays gives ~1024-row tiles; callers pad the ray count up
    to a multiple of it. (tile_rays=8, T=1536 measured fastest for the
    published fine shape on v5e; larger tiles gain nothing and risk VMEM.)
    """
    # Mosaic block sublane constraint: per-ray blocks need >=8 rows.
    target = max(8, 1024 // ns)
    tile_rays = 8
    while tile_rays * 2 <= target:
        tile_rays *= 2
    tile_rays = _tile_rays_override() or tile_rays
    # Forward tiles carry two interleaved chains (measured ~3% faster on
    # the fine shape: one chain's PE/head VPU work hides behind the other's
    # matmuls); the backward runs the halved single-chain tile (_fused_bwd).
    halves = 2 if ns > 1 else 1
    tile_rays *= halves
    return FusedSpec(
        halves=halves,
        depth=cfg.points_net_depth,
        width=cfg.points_net_width,
        views_depth=cfg.views_net_depth if cfg.view_dep_outputs else 0,
        views_width=cfg.views_net_width,
        pe_degree=cfg.points_pe_degree,
        sigma_pe_degree=cfg.sigma_pe_degree,
        skip_layers=tuple(cfg.skip_layers),
        out_p=cfg.points_output_dim,
        out_v=cfg.views_output_dim if cfg.view_dep_outputs else 0,
        has_extra=cfg.extra_views_dim > 0,
        has_hvx=bool(cfg.use_view_dirs and cfg.view_dep_outputs),
        ns=ns,
        tile_rays=tile_rays,
        dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
    )


def kernel_params(params, cfg, shared_degree: Optional[int] = None) -> dict:
    """Re-slice canonical (reference-layout) params into kernel layout.

    Pure jnp gathers/transposes on weight ROWS — differentiable, so dW
    flows back to the canonical pytree through the inverse scatter. Input
    joins are row-merged to the blocked [x | sin | cos] order (single
    matmul per join); head weights are transposed so the kernel reads
    per-channel (1, W) rows. The dirs rows of the first views-branch weight
    are NOT included (see `hv_extra` / `dirs_w`).

    `shared_degree=D`: ensemble mode — the joins are zero-row padded to the
    shared full-degree blocked layout [x | s f<D | c f<D] so every member
    consumes the SAME lo block. Zero rows are literals; their dW is dropped
    by the concat VJP, so gradients to the canonical pytree are unchanged.
    """
    ds = cfg.sigma_pe_degree
    d = cfg.points_pe_degree
    p = cfg.points_input_dim
    perm_lo = np.asarray(encoding.blocked_to_reference_perm(ds))

    def pad_lo(w):
        """(3+6ds, W) [x|s<ds|c<ds] -> (3+6D, W) with zeros at f >= ds."""
        if shared_degree is None or shared_degree == ds:
            return w
        z = jnp.zeros((3 * (shared_degree - ds), w.shape[1]), w.dtype)
        return jnp.concatenate([w[: 3 + 3 * ds], z, w[3 + 3 * ds :], z])

    def pad_hi(w):
        """(6(d-ds), W) [s ds..d | c ds..d] -> (3+6D, W) full-layout pad."""
        if shared_degree is None:
            return w
        D = shared_degree
        nsd = 3 * (d - ds)
        cols = w.shape[1]
        z_head = jnp.zeros((3 + 3 * ds, cols), w.dtype)
        z_tail = jnp.zeros((3 * (D - d), cols), w.dtype)
        z_mid = jnp.zeros((3 * ds, cols), w.dtype)
        return jnp.concatenate([z_head, w[:nsd], z_tail, z_mid, w[nsd:], z_tail])

    kp: dict = {}
    w0 = params["pts"][0]
    kp["w0i"] = pad_lo(w0["w"][perm_lo])
    kp["b0"] = w0["b"][None]
    for i in range(1, cfg.points_net_depth):
        layer = params["pts"][i]
        if (i - 1) in cfg.skip_layers:
            kp[f"w{i}i"] = pad_lo(layer["w"][:p][perm_lo])
            kp[f"w{i}"] = layer["w"][p:]
        else:
            kp[f"w{i}"] = layer["w"]
        kp[f"b{i}"] = layer["b"][None]
    kp["wpo_t"] = params["pts_out"]["w"].T
    kp["bpo"] = params["pts_out"]["b"][None]

    if cfg.view_dep_outputs:
        kp["wf"] = params["feature"]["w"]
        kp["bf"] = params["feature"]["b"][None]
        wv0 = params["views"][0]
        wp, e = cfg.points_net_width, cfg.extra_views_dim
        kp["wv0f"] = wv0["w"][:wp]
        kp["bv0"] = wv0["b"][None]
        if e:
            from simplenerf_tpu.fields.mlp import _extra_rows_perm

            kp["wv0i"] = pad_hi(wv0["w"][wp : wp + e][np.asarray(_extra_rows_perm(cfg))])
        for i in range(1, cfg.views_net_depth):
            kp[f"wv{i}"] = params["views"][i]["w"]
            kp[f"bv{i}"] = params["views"][i]["b"][None]
        kp["wvo_t"] = params["views_out"]["w"].T
        kp["bvo"] = params["views_out"]["b"][None]
    return kp


def dirs_w(params, cfg):
    """Blocked dirs-rows of the first views-branch weight (for hv_extra)."""
    wp, e = cfg.points_net_width, cfg.extra_views_dim
    perm = np.asarray(encoding.blocked_to_reference_perm(cfg.views_pe_degree))
    return params["views"][0]["w"][wp + e :][perm]


def _freq_matrix(degree: int):
    """B (3, 3*degree), B[j, 3i+j] = 2^i — built from iota so the kernel
    doesn't capture a host constant."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * degree), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * degree), 1)
    return jnp.where(cols % 3 == rows, jnp.exp2((cols // 3).astype(jnp.float32)), 0.0)


def _sincos(degree: int, pts32):
    """One wide sin + one wide cos over all PE frequencies (f32)."""
    if degree == 0:
        return None, None
    z = jnp.dot(pts32, _freq_matrix(degree), preferred_element_type=jnp.float32)
    return jnp.sin(z), jnp.cos(z)


def _member_encode(spec: FusedSpec, pts32, s, c):
    """Blocked PE slices for one member from shared sin/cos planes.

    s/c may span MORE frequencies than spec.pe_degree (ensemble max); the
    member reads only its own static prefix, so encoding is computed once
    per tile however many models consume it.
    """
    x = pts32.astype(spec.cdtype)
    if spec.pe_degree == 0:
        return x, None
    d, ds = spec.pe_degree, spec.sigma_pe_degree
    lo = jnp.concatenate(
        [x, s[:, : 3 * ds].astype(spec.cdtype), c[:, : 3 * ds].astype(spec.cdtype)], axis=-1
    )
    hi = None
    if spec.has_extra:
        hi = jnp.concatenate(
            [s[:, 3 * ds : 3 * d].astype(spec.cdtype), c[:, 3 * ds : 3 * d].astype(spec.cdtype)],
            axis=-1,
        )
    return lo, hi


def _encode_tile(spec: FusedSpec, pts32):
    """In-kernel blocked PE.

    Returns (xsc_lo (T, 3+6ds) trunk input, sc_hi (T, 6(d-ds)) | None
    views-branch extra), both in cdtype.
    """
    s, c = _sincos(spec.pe_degree, pts32)
    return _member_encode(spec, pts32, s, c)


def _mm(a, b, spec):
    return jnp.dot(a.astype(spec.cdtype), b.astype(spec.cdtype), preferred_element_type=jnp.float32)


def _mm_tn(a, b, spec):
    """a^T @ b with f32 accumulation (for dW)."""
    return jax.lax.dot_general(
        a.astype(spec.cdtype),
        b.astype(spec.cdtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _relu_mask(h):
    # Mosaic can't lower bf16 vector compares; mask in f32.
    return h.astype(jnp.float32) > 0


def _mm_nt(a, b, spec):
    """a @ b^T with f32 accumulation (for dX)."""
    return jax.lax.dot_general(
        a.astype(spec.cdtype),
        b.astype(spec.cdtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _trunk_forward(spec: FusedSpec, kp: dict, lo):
    """Shared trunk: returns list of post-ReLU activations h_0..h_{D-1}."""
    hs = []
    h = jax.nn.relu(_mm(lo, kp["w0i"], spec) + kp["b0"]).astype(spec.cdtype)
    hs.append(h)
    for i in range(1, spec.depth):
        acc = _mm(h, kp[f"w{i}"], spec)
        if (i - 1) in spec.skip_layers:
            acc = acc + _mm(lo, kp[f"w{i}i"], spec)
        h = jax.nn.relu(acc + kp[f"b{i}"]).astype(spec.cdtype)
        hs.append(h)
    return hs


def _views_forward(spec: FusedSpec, kp: dict, h, hi, hvx_tile):
    """Views branch: returns (feature, [hv_0..])."""
    f = (_mm(h, kp["wf"], spec) + kp["bf"]).astype(spec.cdtype)
    acc = _mm(f, kp["wv0f"], spec) + kp["bv0"]
    if spec.has_extra:
        acc = acc + _mm(hi, kp["wv0i"], spec)
    if hvx_tile is not None:
        acc = acc + hvx_tile
    hvs = [jax.nn.relu(acc).astype(spec.cdtype)]
    for i in range(1, spec.views_depth):
        hvs.append(jax.nn.relu(_mm(hvs[-1], kp[f"wv{i}"], spec) + kp[f"bv{i}"]).astype(spec.cdtype))
    return f, hvs


def _hvx_broadcast(spec: FusedSpec, hvx):
    """(tile_rays, Wv) per-ray block -> (T, Wv) per-point rows."""
    if spec.ns == 1:
        return hvx
    r, wv = hvx.shape
    return jnp.broadcast_to(hvx[:, None, :], (r, spec.ns, wv)).reshape(r * spec.ns, wv)


def _head_planes(spec: FusedSpec, h, wt, b, n_out):
    """Head channels as (tile_rays, ns) planes via VPU lane-reduction.

    h (T, W); wt (n_out, W) transposed head weight; b (1, n_out). Channel j:
    plane_j[r, s] = sum_k h3[r, s, k] * wt[j, k] + b[j] — no (T, 1) column
    and no N=1 matmul is ever formed.
    """
    h3 = h.reshape(spec.tile_rays, spec.ns, -1).astype(jnp.float32)
    planes = []
    for j in range(n_out):
        w_row = wt[j : j + 1, :].reshape(1, 1, -1).astype(jnp.float32)
        plane = jnp.sum(h3 * w_row, axis=-1) + b[0:1, j : j + 1]
        planes.append(plane)
    return planes


def _head_backward(spec: FusedSpec, h, wt, d_planes):
    """VJP of `_head_planes`: (dh (T, W) f32, dwt (n_out, W) f32, db (1, n_out) f32)."""
    tr, ns = spec.tile_rays, spec.ns
    h3 = h.reshape(tr, ns, -1).astype(jnp.float32)
    dh3 = jnp.zeros_like(h3)
    dwt_rows = []
    db_cols = []
    for j, dp in enumerate(d_planes):
        dp3 = dp.reshape(tr, ns, 1)
        w_row = wt[j : j + 1, :].reshape(1, 1, -1).astype(jnp.float32)
        dh3 = dh3 + dp3 * w_row
        dwt_rows.append(jnp.sum(h3 * dp3, axis=(0, 1), keepdims=False).reshape(1, -1))
        db_cols.append(jnp.sum(dp).reshape(1, 1))
    dh = dh3.reshape(tr * ns, -1)
    dwt = jnp.concatenate(dwt_rows, axis=0)
    db = jnp.concatenate(db_cols, axis=1)
    return dh, dwt, db


def _parse_io_refs(spec: FusedSpec, refs):
    """(lo_ref, hi_ref|None, hvx_ref|None, rest) from the flat ref list."""
    pos = 0
    lo_ref = refs[pos]
    pos += 1
    hi_ref = None
    if spec.has_extra:
        hi_ref = refs[pos]
        pos += 1
    hvx_ref = None
    if spec.has_hvx:
        hvx_ref = refs[pos]
        pos += 1
    return lo_ref, hi_ref, hvx_ref, refs[pos:]


def _fwd_kernel(spec: FusedSpec, nkp: int, *refs):
    lo_ref, hi_ref, hvx_ref, rest = _parse_io_refs(spec, refs)
    kp_refs = rest[:nkp]
    out_refs = rest[nkp:]
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}

    # `halves` independent row-chains, interleaved LAYER-BY-LAYER so the
    # scheduler can hide one chain's VPU work behind the other's matmuls.
    nh = spec.halves
    tr_h = spec.tile_rays // nh
    t_h = tr_h * spec.ns
    sub = dataclasses.replace(spec, tile_rays=tr_h, halves=1)
    rows = [slice(h * t_h, (h + 1) * t_h) for h in range(nh)]
    rrows = [slice(h * tr_h, (h + 1) * tr_h) for h in range(nh)]

    # PE is precomputed OUTSIDE the kernel (XLA fuses sincos+concat into the
    # producer; in-kernel encode measured +52% fwd time — the narrow-lane
    # sin/cos and concat relayouts serialize against the MXU, see
    # scripts/kernel_lab2.py `lo64`). The kernel reads (T, in_lo)/(T, in_hi)
    # cdtype rows straight into the first matmul.
    enc = [(lo_ref[r, :], hi_ref[r, :] if hi_ref is not None else None) for r in rows]
    hcur = [
        jax.nn.relu(_mm(lo, kp["w0i"], sub) + kp["b0"]).astype(sub.cdtype) for lo, _ in enc
    ]
    for i in range(1, sub.depth):
        acc = [_mm(h, kp[f"w{i}"], sub) for h in hcur]
        if (i - 1) in sub.skip_layers:
            acc = [a + _mm(lo, kp[f"w{i}i"], sub) for a, (lo, _) in zip(acc, enc)]
        hcur = [jax.nn.relu(a + kp[f"b{i}"]).astype(sub.cdtype) for a in acc]

    for h in range(nh):
        p_planes = _head_planes(sub, hcur[h], kp["wpo_t"], kp["bpo"], sub.out_p)
        for j in range(sub.out_p):
            out_refs[j][rrows[h], :] = p_planes[j]
    if sub.has_views:
        for h in range(nh):
            hvx = _hvx_broadcast(sub, hvx_ref[rrows[h], :]) if hvx_ref is not None else None
            _, hvs = _views_forward(sub, kp, hcur[h], enc[h][1], hvx)
            v_planes = _head_planes(sub, hvs[-1], kp["wvo_t"], kp["bvo"], sub.out_v)
            for j in range(sub.out_v):
                out_refs[sub.out_p + j][rrows[h], :] = v_planes[j]


def _bwd_kernel(spec: FusedSpec, nkp: int, *refs):
    lo_ref, hi_ref, hvx_ref, rest = _parse_io_refs(spec, refs)
    kp_refs = rest[:nkp]
    dplane_refs = rest[nkp : nkp + spec.n_planes]
    out_refs = list(rest[nkp + spec.n_planes :])
    kp = {k: r[:] for k, r in zip(spec.param_keys(), kp_refs)}

    grads: dict = {}

    def acc_grad(key, val):
        grads[key] = grads.get(key, 0.0) + val

    # --- recompute forward (activations stay in VMEM; PE read, not redone) ---
    lo = lo_ref[:]
    hi = hi_ref[:] if hi_ref is not None else None
    hs = _trunk_forward(spec, kp, lo)

    dh = None  # cotangent flowing into hs[-1] (f32)

    if spec.has_views:
        hvx = _hvx_broadcast(spec, hvx_ref[:]) if hvx_ref is not None else None
        f, hvs = _views_forward(spec, kp, hs[-1], hi, hvx)
        d_v_planes = [dplane_refs[spec.out_p + j][:] for j in range(spec.out_v)]
        g, dwvo_t, dbvo = _head_backward(spec, hvs[-1], kp["wvo_t"], d_v_planes)
        acc_grad("wvo_t", dwvo_t)
        acc_grad("bvo", dbvo)
        g = g * _relu_mask(hvs[-1])
        for i in range(spec.views_depth - 1, 0, -1):
            acc_grad(f"wv{i}", _mm_tn(hvs[i - 1], g, spec))
            acc_grad(f"bv{i}", jnp.sum(g, axis=0, keepdims=True))
            g = _mm_nt(g, kp[f"wv{i}"], spec) * _relu_mask(hvs[i - 1])
        # g = d(pre-activation of views layer 0)
        if hvx_ref is not None:
            r, wv = hvx_ref.shape
            dhvx = g.reshape(r, spec.ns, wv).sum(axis=1) if spec.ns > 1 else g
        acc_grad("bv0", jnp.sum(g, axis=0, keepdims=True))
        acc_grad("wv0f", _mm_tn(f, g, spec))
        if spec.has_extra:
            acc_grad("wv0i", _mm_tn(hi, g, spec))
        df = _mm_nt(g, kp["wv0f"], spec)
        acc_grad("wf", _mm_tn(hs[-1], df, spec))
        acc_grad("bf", jnp.sum(df, axis=0, keepdims=True))
        dh = _mm_nt(df, kp["wf"], spec)

    d_p_planes = [dplane_refs[j][:] for j in range(spec.out_p)]
    dpo_h, dwpo_t, dbpo = _head_backward(spec, hs[-1], kp["wpo_t"], d_p_planes)
    acc_grad("wpo_t", dwpo_t)
    acc_grad("bpo", dbpo)
    dh = dpo_h if dh is None else dh + dpo_h

    for i in range(spec.depth - 1, 0, -1):
        g = dh * _relu_mask(hs[i])
        acc_grad(f"w{i}", _mm_tn(hs[i - 1], g, spec))
        acc_grad(f"b{i}", jnp.sum(g, axis=0, keepdims=True))
        if (i - 1) in spec.skip_layers:
            acc_grad(f"w{i}i", _mm_tn(lo, g, spec))
        dh = _mm_nt(g, kp[f"w{i}"], spec)
    g = dh * _relu_mask(hs[0])
    acc_grad("w0i", _mm_tn(lo, g, spec))
    acc_grad("b0", jnp.sum(g, axis=0, keepdims=True))

    # --- write accumulated grads (sequential grid revisits block 0) ---
    first = pl.program_id(0) == 0
    vals = [grads[k] for k in spec.param_keys()]
    if spec.has_hvx:
        vals = vals + [dhvx]  # per-tile rows: written, not accumulated

    for idx, (ref, val) in enumerate(zip(out_refs, vals)):
        is_hvx_out = spec.has_hvx and idx == len(vals) - 1
        if is_hvx_out:
            ref[:] = val
        else:

            @pl.when(first)
            def _(ref=ref, val=val):
                ref[:] = val

            @pl.when(jnp.logical_not(first))
            def _(ref=ref, val=val):
                ref[:] = ref[:] + val


def _weight_spec():
    return pl.BlockSpec(index_map=lambda i: (0, 0), memory_space=pltpu.VMEM)


def _row_spec(block_rows, cols):
    return pl.BlockSpec((block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _plane_spec(spec: FusedSpec):
    return pl.BlockSpec((spec.tile_rays, spec.ns), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_apply(
    spec: FusedSpec,
    kp: dict,
    lo: jnp.ndarray,
    hi: Optional[jnp.ndarray],
    hvx: Optional[jnp.ndarray],
):
    """Fused field evaluation -> tuple of `spec.n_planes` output planes.

    lo: (N, in_lo) cdtype trunk input [x | sin f<ds | cos f<ds] with
    N % spec.tile == 0 (PE precomputed in XLA — see _fwd_kernel note);
    hi: (N, in_hi) cdtype high-frequency views-branch extra, required iff
    spec.has_extra; hvx: (N // ns, Wv) f32 per-ray views-branch addend
    (enc dirs @ dirs rows), required iff spec.has_hvx.
    Returns (N // ns, ns) f32 planes, points-head channels first — raw
    linear head outputs; noise/activations are the caller's epilogue.
    """
    return _fused_fwd_call(spec, kp, lo, hi, hvx)


def _io_specs_inputs(spec: FusedSpec, lo, hi, hvx):
    in_specs = [_row_spec(spec.tile, spec.in_lo)]
    inputs = [lo]
    if spec.has_extra:
        in_specs.append(_row_spec(spec.tile, spec.in_hi))
        inputs.append(hi)
    if spec.has_hvx:
        in_specs.append(_row_spec(spec.tile_rays, spec.views_width))
        inputs.append(hvx)
    return in_specs, inputs


def _fused_fwd_call(spec: FusedSpec, kp, lo, hi, hvx):
    n = lo.shape[0]
    t = spec.tile
    assert n % t == 0, (n, t)
    nr = n // spec.ns
    grid = n // t
    keys = spec.param_keys()
    nkp = len(keys)

    in_specs, inputs = _io_specs_inputs(spec, lo, hi, hvx)
    in_specs += [_weight_spec()] * nkp
    inputs += [kp[k] for k in keys]

    out_shape = [jax.ShapeDtypeStruct((nr, spec.ns), jnp.float32)] * spec.n_planes
    out_specs = [_plane_spec(spec)] * spec.n_planes

    flops_trunk = 2 * n * spec.width * (spec.width * (spec.depth - 1) + 6 * spec.pe_degree + 3)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, nkp),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=_fwd_grid_semantics(),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_trunk, bytes_accessed=n * 32, transcendentals=0  # PE precomputed in XLA
        ),
    )(*inputs)
    return tuple(outs)


def _fused_fwd(spec, kp, lo, hi, hvx):
    out = _fused_fwd_call(spec, kp, lo, hi, hvx)
    return out, (kp, lo, hi, hvx)


def _fused_bwd(spec, residuals, cotangents):
    # The backward gains nothing from interleaved chains (its dW matmuls
    # already provide the ILP) and prefers the smaller single-chain tile.
    spec = dataclasses.replace(spec, tile_rays=spec.tile_rays // spec.halves, halves=1)
    kp, lo, hi, hvx = residuals
    d_planes = cotangents
    n = lo.shape[0]
    t = spec.tile
    grid = n // t
    keys = spec.param_keys()
    nkp = len(keys)

    in_specs, inputs = _io_specs_inputs(spec, lo, hi, hvx)
    in_specs += [_weight_spec()] * nkp
    inputs += [kp[k] for k in keys]
    in_specs += [_plane_spec(spec)] * spec.n_planes
    inputs += list(d_planes)

    out_shape = [jax.ShapeDtypeStruct(kp[k].shape, jnp.float32) for k in keys]
    out_specs = [_weight_spec() for _ in keys]
    if spec.has_hvx:
        out_shape.append(jax.ShapeDtypeStruct(hvx.shape, jnp.float32))
        out_specs.append(_row_spec(spec.tile_rays, spec.views_width))

    flops_trunk = 6 * n * spec.width * (spec.width * (spec.depth - 1) + 6 * spec.pe_degree + 3)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, nkp),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_trunk, bytes_accessed=n * 32, transcendentals=0  # PE precomputed in XLA
        ),
    )(*inputs)

    dkp = {k: g.astype(kp[k].dtype) for k, g in zip(keys, outs[:nkp])}
    dhvx = outs[nkp] if spec.has_hvx else None
    # Sample positions carry no gradient, so neither do their encodings.
    dlo = jnp.zeros_like(lo)
    dhi = jnp.zeros_like(hi) if hi is not None else None
    return dkp, dlo, dhi, dhvx


fused_apply.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Stacked ensemble kernel: several field MLPs over the SAME sample points in
# ONE pallas_call (fwd and bwd). This is the TPU-native replacement for the
# reference's three separate coarse evaluations at identical z-vals
# (src/models/SimpleNeRF01.py:170-199): PE sin/cos is computed once per tile
# and shared, the member trunks run as layer-interleaved chains (one chain's
# VPU work hides behind another's MXU matmuls — the same scheduling trick
# the single-model forward plays with `halves`), and every member's weights
# and dW accumulators stay VMEM-resident across the grid.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EnsembleSpec:
    """Static spec for a stacked multi-model evaluation (hashable).

    All members share the tile geometry (ns, tile_rays) and consume the same
    points; architectures may differ (depth/width/heads/views branch/PE
    split), covering the published main + points-aug + Lambertian views-aug
    coarse trio.
    """

    members: tuple[FusedSpec, ...]

    @property
    def ns(self) -> int:
        return self.members[0].ns

    @property
    def tile_rays(self) -> int:
        return self.members[0].tile_rays

    @property
    def tile(self) -> int:
        return self.members[0].tile

    @property
    def pe_degree(self) -> int:
        return max(m.pe_degree for m in self.members)

    @property
    def n_planes(self) -> int:
        return sum(m.n_planes for m in self.members)

    @property
    def hvx_members(self) -> tuple[int, ...]:
        return tuple(i for i, m in enumerate(self.members) if m.has_hvx)


def make_ensemble_spec(cfgs, ns: int, dtype, tile_rays: int = 32) -> EnsembleSpec:
    """Spec for evaluating `cfgs` jointly at shared points.

    tile_rays is shared; member chains already provide the instruction-level
    parallelism, so members run single-chain (halves=1). All members read
    one shared full-degree lo block (shared_pe_degree + zero-padded joins).
    Default 32 (T=2048 at ns=64): best of the round-4 tile sweep
    (scripts/kernel_lab13.py — fwd 6.18->5.94 ms, fwd+bwd 22.2->21.5 ms vs
    the old 8; no tile recovers the fine kernel's 185 TFLOPS because the
    member mix includes trunk-only work and 3 dW accumulator sets).
    """
    tile_rays = _tile_rays_override() or tile_rays
    d_max = max(cfg.points_pe_degree for cfg in cfgs)
    members = tuple(
        dataclasses.replace(
            make_spec(cfg, ns, dtype), tile_rays=tile_rays, halves=1,
            shared_pe_degree=d_max,
        )
        for cfg in cfgs
    )
    return EnsembleSpec(members=members)


def _parse_ens_refs(ens: EnsembleSpec, nkps, refs):
    """Split the flat kernel ref list into ([(lo, hi)], {mi: hvx}, [kp dicts], rest).

    One SHARED full-degree lo block serves every member's trunk AND (via the
    zero-padded wv0i) the views-branch extra input."""
    pos = 0
    lo_ref = refs[pos]
    pos += 1
    enc = [(lo_ref, lo_ref if m.has_extra else None) for m in ens.members]
    hvx_refs = {}
    for mi in ens.hvx_members:
        hvx_refs[mi] = refs[pos]
        pos += 1
    kps = []
    for m, nk in zip(ens.members, nkps):
        kp_refs = refs[pos : pos + nk]
        pos += nk
        kps.append({k: r[:] for k, r in zip(m.param_keys(), kp_refs)})
    return enc, hvx_refs, kps, list(refs[pos:])


def _ens_fwd_kernel(ens: EnsembleSpec, nkps, *refs):
    enc_refs, hvx_refs, kps, out_refs = _parse_ens_refs(ens, nkps, refs)

    # Per-member PE inputs precomputed in XLA (shared sincos there); the
    # kernel reads (T, in_lo)/(T, in_hi) rows directly (see _fwd_kernel).
    enc = [
        (lo_ref[:], hi_ref[:] if hi_ref is not None else None)
        for lo_ref, hi_ref in enc_refs
    ]

    # Trunks interleaved layer-by-layer across members.
    hcur = [
        jax.nn.relu(_mm(enc[mi][0], kps[mi]["w0i"], m) + kps[mi]["b0"]).astype(m.cdtype)
        for mi, m in enumerate(ens.members)
    ]
    for i in range(1, max(m.depth for m in ens.members)):
        acc = [
            _mm(hcur[mi], kps[mi][f"w{i}"], m) if i < m.depth else None
            for mi, m in enumerate(ens.members)
        ]
        acc = [
            a + _mm(enc[mi][0], kps[mi][f"w{i}i"], m)
            if a is not None and (i - 1) in m.skip_layers
            else a
            for mi, (m, a) in enumerate(zip(ens.members, acc))
        ]
        hcur = [
            jax.nn.relu(a + kps[mi][f"b{i}"]).astype(m.cdtype) if a is not None else hcur[mi]
            for mi, (m, a) in enumerate(zip(ens.members, acc))
        ]

    out_pos = 0
    for mi, m in enumerate(ens.members):
        p_planes = _head_planes(m, hcur[mi], kps[mi]["wpo_t"], kps[mi]["bpo"], m.out_p)
        for j in range(m.out_p):
            out_refs[out_pos + j][...] = p_planes[j]
        out_pos += m.out_p
        if m.has_views:
            hvx = _hvx_broadcast(m, hvx_refs[mi][:]) if mi in hvx_refs else None
            _, hvs = _views_forward(m, kps[mi], hcur[mi], enc[mi][1], hvx)
            v_planes = _head_planes(m, hvs[-1], kps[mi]["wvo_t"], kps[mi]["bvo"], m.out_v)
            for j in range(m.out_v):
                out_refs[out_pos + j][...] = v_planes[j]
            out_pos += m.out_v


def _ens_bwd_kernel(ens: EnsembleSpec, nkps, *refs):
    enc_refs, hvx_refs, kps, rest = _parse_ens_refs(ens, nkps, refs)
    dplane_refs = rest[: ens.n_planes]
    out_refs = rest[ens.n_planes :]

    first = pl.program_id(0) == 0
    grad_vals = []  # per member: list of dW in param_keys() order
    dhvx_vals = {}  # mi -> per-tile rows

    plane_pos = 0
    for mi, m in enumerate(ens.members):
        kp = kps[mi]
        grads: dict = {}

        def acc_grad(key, val, grads=grads):
            grads[key] = grads.get(key, 0.0) + val

        # --- recompute member forward (VMEM-resident; PE read, not redone) ---
        lo_ref, hi_ref = enc_refs[mi]
        lo = lo_ref[:]
        hi = hi_ref[:] if hi_ref is not None else None
        hs = _trunk_forward(m, kp, lo)

        dh = None
        if m.has_views:
            hvx = _hvx_broadcast(m, hvx_refs[mi][:]) if mi in hvx_refs else None
            f, hvs = _views_forward(m, kp, hs[-1], hi, hvx)
            d_v_planes = [
                dplane_refs[plane_pos + m.out_p + j][...] for j in range(m.out_v)
            ]
            g, dwvo_t, dbvo = _head_backward(m, hvs[-1], kp["wvo_t"], d_v_planes)
            acc_grad("wvo_t", dwvo_t)
            acc_grad("bvo", dbvo)
            g = g * _relu_mask(hvs[-1])
            for i in range(m.views_depth - 1, 0, -1):
                acc_grad(f"wv{i}", _mm_tn(hvs[i - 1], g, m))
                acc_grad(f"bv{i}", jnp.sum(g, axis=0, keepdims=True))
                g = _mm_nt(g, kp[f"wv{i}"], m) * _relu_mask(hvs[i - 1])
            if mi in hvx_refs:
                r, wv = hvx_refs[mi].shape
                dhvx_vals[mi] = g.reshape(r, m.ns, wv).sum(axis=1) if m.ns > 1 else g
            acc_grad("bv0", jnp.sum(g, axis=0, keepdims=True))
            acc_grad("wv0f", _mm_tn(f, g, m))
            if m.has_extra:
                acc_grad("wv0i", _mm_tn(hi, g, m))
            df = _mm_nt(g, kp["wv0f"], m)
            acc_grad("wf", _mm_tn(hs[-1], df, m))
            acc_grad("bf", jnp.sum(df, axis=0, keepdims=True))
            dh = _mm_nt(df, kp["wf"], m)

        d_p_planes = [dplane_refs[plane_pos + j][...] for j in range(m.out_p)]
        dpo_h, dwpo_t, dbpo = _head_backward(m, hs[-1], kp["wpo_t"], d_p_planes)
        acc_grad("wpo_t", dwpo_t)
        acc_grad("bpo", dbpo)
        dh = dpo_h if dh is None else dh + dpo_h
        plane_pos += m.n_planes

        for i in range(m.depth - 1, 0, -1):
            g = dh * _relu_mask(hs[i])
            acc_grad(f"w{i}", _mm_tn(hs[i - 1], g, m))
            acc_grad(f"b{i}", jnp.sum(g, axis=0, keepdims=True))
            if (i - 1) in m.skip_layers:
                acc_grad(f"w{i}i", _mm_tn(lo, g, m))
            dh = _mm_nt(g, kp[f"w{i}"], m)
        g = dh * _relu_mask(hs[0])
        acc_grad("w0i", _mm_tn(lo, g, m))
        acc_grad("b0", jnp.sum(g, axis=0, keepdims=True))

        grad_vals.append([grads[k] for k in m.param_keys()])

    # --- write: dW accumulated across the sequential grid, dhvx per-tile ---
    pos = 0
    for mi, m in enumerate(ens.members):
        for val in grad_vals[mi]:
            ref = out_refs[pos]
            pos += 1

            @pl.when(first)
            def _(ref=ref, val=val):
                ref[...] = val

            @pl.when(jnp.logical_not(first))
            def _(ref=ref, val=val):
                ref[...] = ref[...] + val

    for mi in ens.hvx_members:
        out_refs[pos][...] = dhvx_vals[mi]
        pos += 1


def _ens_inputs(ens: EnsembleSpec, kps, lo, hvxs):
    """Shared input plumbing for the ensemble fwd/bwd pallas_calls.

    lo: the ONE shared full-degree (N, 3+6*d_max) PE block."""
    t = ens.tile
    in_specs = [_row_spec(t, ens.members[0].in_lo)]
    inputs = [lo]
    for slot, mi in enumerate(ens.hvx_members):
        in_specs.append(_row_spec(ens.tile_rays, ens.members[mi].views_width))
        inputs.append(hvxs[slot])
    nkps = []
    for m, kp in zip(ens.members, kps):
        keys = m.param_keys()
        nkps.append(len(keys))
        in_specs += [_weight_spec()] * len(keys)
        inputs += [kp[k] for k in keys]
    return in_specs, inputs, tuple(nkps)


def _ens_flops(ens: EnsembleSpec, n: int, mult: int):
    return sum(
        mult * n * m.width * (m.width * (m.depth - 1) + 6 * m.pe_degree + 3)
        for m in ens.members
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_apply_ensemble(ens: EnsembleSpec, kps: tuple, lo: jnp.ndarray, hvxs: tuple):
    """Stacked evaluation of all ensemble members at shared points.

    kps: tuple of kernel-param dicts (one per member, `kernel_params` with
    shared_degree so joins are zero-padded to the full layout); lo: the ONE
    shared (N, 3+6*d_max) cdtype PE block [x|s|c] with N % ens.tile == 0;
    hvxs: tuple of (N // ns, Wv) per-ray views-branch addends for the
    members in `ens.hvx_members` order. Returns the flat member-major tuple
    of (N // ns, ns) f32 raw head planes (each member's points-head
    channels first, then views-head channels).
    """
    return _ens_fwd_call(ens, kps, lo, hvxs)


def _ens_fwd_call(ens: EnsembleSpec, kps, lo, hvxs):
    n = lo.shape[0]
    t = ens.tile
    assert n % t == 0, (n, t)
    nr = n // ens.ns
    grid = n // t

    in_specs, inputs, nkps = _ens_inputs(ens, kps, lo, hvxs)
    out_shape = [jax.ShapeDtypeStruct((nr, ens.ns), jnp.float32)] * ens.n_planes
    out_specs = []
    for m in ens.members:
        out_specs += [_plane_spec(m)] * m.n_planes

    outs = pl.pallas_call(
        functools.partial(_ens_fwd_kernel, ens, nkps),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=_fwd_grid_semantics(),
        ),
        cost_estimate=pl.CostEstimate(
            flops=_ens_flops(ens, n, 2),
            bytes_accessed=n * 32,
            transcendentals=0  # PE precomputed in XLA,
        ),
    )(*inputs)
    return tuple(outs)


def _ens_fwd(ens, kps, lo, hvxs):
    return _ens_fwd_call(ens, kps, lo, hvxs), (kps, lo, hvxs)


def _ens_bwd(ens, residuals, cotangents):
    kps, lo, hvxs = residuals
    n = lo.shape[0]
    grid = n // ens.tile

    in_specs, inputs, nkps = _ens_inputs(ens, kps, lo, hvxs)
    for m in ens.members:
        in_specs += [_plane_spec(m)] * m.n_planes
    inputs += list(cotangents)

    out_shape = []
    out_specs = []
    for m, kp in zip(ens.members, kps):
        for k in m.param_keys():
            out_shape.append(jax.ShapeDtypeStruct(kp[k].shape, jnp.float32))
            out_specs.append(_weight_spec())
    for slot, mi in enumerate(ens.hvx_members):
        out_shape.append(jax.ShapeDtypeStruct(hvxs[slot].shape, jnp.float32))
        out_specs.append(_row_spec(ens.tile_rays, ens.members[mi].views_width))

    outs = pl.pallas_call(
        functools.partial(_ens_bwd_kernel, ens, nkps),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=_ens_flops(ens, n, 6),
            bytes_accessed=n * 32,
            transcendentals=0  # PE precomputed in XLA,
        ),
    )(*inputs)

    pos = 0
    dkps = []
    for m, kp in zip(ens.members, kps):
        keys = m.param_keys()
        dkps.append(
            {k: g.astype(kp[k].dtype) for k, g in zip(keys, outs[pos : pos + len(keys)])}
        )
        pos += len(keys)
    dhvxs = tuple(outs[pos + i] for i in range(len(ens.hvx_members)))
    # Sample positions carry no gradient, so neither does their encoding.
    return tuple(dkps), jnp.zeros_like(lo), dhvxs


fused_apply_ensemble.defvjp(_ens_fwd, _ens_bwd)
