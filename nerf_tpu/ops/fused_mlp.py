"""Fused Pallas kernel: positional encoding + full NeRF MLP, fwd + bwd.

Why: unfused, every 256-wide activation round-trips HBM between layers
(~64 FLOP/byte at the MXU's ~240 FLOP/byte break-even → HBM-bound at <30%
MFU). This kernel reads 6 floats/point (x, d), keeps ALL activations and the
~0.6 MB of weights in VMEM, and writes 4 floats/point — compute-bound.

Design notes (TPU-first, not a translation):
- The reference's embedding-concat (run_nerf_helpers.py:44-45) and trunk
  skip-concat (run_nerf_helpers.py:102-103) are realized WITHOUT any gather
  or per-frequency matmuls: rows of W0 (and of the skip layer's input half,
  and of the view layer's direction half) are permuted on the host into
  [identity | all-sin (freq-major) | all-cos] order, the kernel builds the
  matching embedding tensor ``e = [x, sin(x·S), cos(x·S)]`` with one [3,3F]
  selector matmul + one lane-concat, and each embedding contribution is a
  single full-K MXU pass (K=63 / K=27) instead of three small-K passes.
- The feature head stays MXU-aligned at [W, W]; rgb and alpha come out of a
  single ``cat([hv, h7]) @ Wout`` ([3W/2, 4]) matmul (see pack_params), so
  no narrow-N matmul or off-128 lane-slice is left in the head.
- bf16 mode computes the positional-encoding trig with the double-angle
  recurrence (2 transcendentals per point instead of 2F; see _trig_blocks).
- Backward recomputes the forward per tile (remat) — residuals are just the
  6 input floats — and accumulates weight grads in VMEM f32 scratch across
  the (sequential) grid, flushing via revisited output blocks.
- Matmuls run in the caller's compute dtype (bf16 on TPU) with f32
  accumulation (preferred_element_type), f32 sin/cos. f32 operands force
  Precision.HIGHEST so the f32 mode is true-f32 (parity).

The host-side repartitioning is exact (a permutation/partition of rows), so
numerics match the reference wiring; pack_params is plain differentiable
slicing/concat, so only the pallas op itself carries the custom VJP.

Supports the reference architecture family: depth 8, skip after layer 4,
viewdirs head, width any multiple of 128 (head W//2). Other configs fall back
to the jnp path in render/network.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.nerf_mlp import MLPConfig

import os as _os

# r5 sweep after the per-ray selector staging (_embed_pts_rays) lightened
# the fwd fixed work: 2048/2048 (and its 1024/2048 twin — identical fine
# geometry) wins at 32.1 ms/step vs 32.6 for the r4 default 4096/2048;
# 8192/2048 33.3, 4096/4096 34.6 (VMEM pressure, as every round).
FWD_TILE = int(_os.environ.get("NERF_TPU_FWD_TILE", "2048"))
BWD_TILE = int(_os.environ.get("NERF_TPU_BWD_TILE", "2048"))
# bf16 posenc trig (measured on v5e, docs/PERF.md):
# - "poly" (default): selector matmul + ONE shared Cody-Waite range reduction
#   + deg-9/10 minimax polynomials for sin/cos on the [T, 3F] block. 6x
#   faster than jnp.sin/cos in-kernel (0.42 vs 2.55 ms per fine fwd pass) at
#   1.8e-5 max abs error — far below bf16 quantization (~4e-3).
# - "selector": selector matmul + exact jnp.sin/cos (the r01 behavior).
# - "recurrence": double-angle chain — 2 transcendentals per point but a
#   9-deep serial chain on 3-of-128-lane [T,3] blocks; measured SLOWER
#   (51.0 vs 48.3 ms/step) — this was the r01->r02 bench regression.
# - "repeat": xb via pltpu.repeat + exact 2^f lane multiply instead of the
#   selector matmul; exact (serves f32 too) but measured SLOWER (37.9 vs
#   33.9 ms/step, r4) — Mosaic lowers the lane replication as shuffles that
#   cost more than the 6-pass HIGHEST matmul, like the r01 lane-concat.
# The f32 parity path always uses exact jnp.sin/cos.
TRIG_MODE = _os.environ.get("NERF_TPU_TRIG", "poly")
# bwd holds 8 trunk activations + weight-grad accumulators + weights (all
# double-buffered by Mosaic) — beyond the default 16 MB scoped-vmem limit,
# so raise it explicitly (v5e has headroom above the default).
_FWD_VMEM_BYTES = 48 * 1024 * 1024
_BWD_VMEM_BYTES = 96 * 1024 * 1024

_DEPTH = 8
_SKIP = 4  # input re-concatenated after trunk layer index 4 -> layer 5 input


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() != "tpu"


def supports(cfg: MLPConfig, pe_pts: PosEncConfig, pe_views) -> bool:
    return (
        cfg.depth == _DEPTH
        and cfg.skips == (_SKIP,)
        and cfg.use_viewdirs
        and cfg.width % 128 == 0
        and pe_views is not None
        and pe_pts.include_input
        and pe_pts.log_sampling
        and pe_views.include_input
        and pe_views.log_sampling
        and pe_pts.num_freqs > 0
        and pe_views.num_freqs > 0
    )


def _selector(num_freqs: int, dtype=jnp.float32) -> jnp.ndarray:
    """S [3, 3*F]: (x @ S)[:, f*3+d] = x_d * 2^f."""
    S = np.zeros((3, 3 * num_freqs), np.float32)
    for f in range(num_freqs):
        for d in range(3):
            S[d, f * 3 + d] = 2.0**f
    return jnp.asarray(S, dtype)


def _reorder_emb_rows(W: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Permute embedding-ordered rows (x, sin f0, cos f0, sin f1, ...) into
    kernel order [x(3) | sin (f-major, 3F) | cos (3F)]."""
    Wx = W[:3]
    rest = W[3 : 3 + 6 * num_freqs].reshape(num_freqs, 2, 3, W.shape[-1])
    Ws = rest[:, 0].reshape(3 * num_freqs, W.shape[-1])
    Wc = rest[:, 1].reshape(3 * num_freqs, W.shape[-1])
    return jnp.concatenate([Wx, Ws, Wc], axis=0)


def pack_params(params: Dict, cfg: MLPConfig, pe_pts: PosEncConfig,
                pe_views: PosEncConfig, dtype) -> Dict[str, jnp.ndarray]:
    """Canonical pytree -> kernel layout. All ops are differentiable
    (slice/reshape/concat/cast), so packing participates in autodiff and only
    the pallas op itself needs the custom VJP."""
    Fp, Fv = pe_pts.num_freqs, pe_views.num_freqs
    ep = 3 + 6 * Fp
    t = params["trunk"]
    kp = {}
    w0e = _reorder_emb_rows(t[0]["w"], Fp)
    kp["b0"] = t[0]["b"].astype(jnp.float32)[None, :]
    for i in range(1, _DEPTH):
        w = t[i]["w"]
        if i == _SKIP + 1:
            # skip layer input order: cat([x_emb, h]) (run_nerf_helpers.py:103)
            # Both embedding contributions (layer 0 and the skip re-inject)
            # consume the same e, so their K=63 matmuls merge into ONE
            # e @ [W0e | W5e] pass of N=2W (and the backward merges the two
            # dW and d_e matmuls the same way) — fewer small-K MXU setups.
            w5e = _reorder_emb_rows(w[:ep], Fp)
            kp["W05e"] = jnp.concatenate([w0e, w5e], axis=1).astype(dtype)
            kp[f"W{i}"] = w[ep:].astype(dtype)
        else:
            kp[f"W{i}"] = w.astype(dtype)
        kp[f"b{i}"] = t[i]["b"].astype(jnp.float32)[None, :]
    # feature head kept MXU-aligned at [W, W] (the old [W, W+1] feat|alpha
    # fusion forced a 257-lane slice every tile)
    kp["Wf"] = params["feature"]["w"].astype(dtype)
    kp["bf"] = params["feature"]["b"].astype(jnp.float32)[None, :]
    wv = params["views"]["w"]  # [W + 3+6Fv, W/2], input order cat([feature, v_emb])
    kp["Wvf"] = wv[: cfg.width].astype(dtype)
    kp["Wve"] = _reorder_emb_rows(wv[cfg.width :], Fv).astype(dtype)
    kp["bv"] = params["views"]["b"].astype(jnp.float32)[None, :]
    # rgb+alpha fused output: ONE [W/2+W, 4] matmul on cat([hv, h7]) replaces
    # the N=3 rgb pass + separate alpha slice + two sliced output writes
    wr = params["rgb"]["w"]  # [W/2, 3]
    wa = params["alpha"]["w"]  # [W, 1]
    hw = cfg.width // 2
    kp["Wout"] = jnp.concatenate(
        [
            jnp.concatenate([wr, jnp.zeros((hw, 1), wr.dtype)], axis=1),
            jnp.concatenate([jnp.zeros((cfg.width, 3), wa.dtype), wa], axis=1),
        ],
        axis=0,
    ).astype(dtype)
    kp["bout"] = jnp.concatenate(
        [params["rgb"]["b"], params["alpha"]["b"]]
    ).astype(jnp.float32)[None, :]
    kp["Sp"] = _selector(Fp)
    kp["Sv"] = _selector(Fv)
    return kp


def _prec(a):
    # f32 operands on the TPU MXU need HIGHEST precision for true-f32 parity;
    # bf16 operands use the native single-pass mode.
    return (
        jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_prec(a))


def _dot_t(a, b):
    """a @ b.T with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a),
    )


def _dot_at(a, b):
    """a.T @ b with f32 accumulation (contraction over rows/TILE)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(a),
    )


_KP_ORDER = [
    "W05e", "b0",
    "W1", "b1", "W2", "b2", "W3", "b3", "W4", "b4",
    "W5", "b5",
    "W6", "b6", "W7", "b7",
    "Wf", "bf",
    "Wvf", "Wve", "bv",
    "Wout", "bout", "Sp", "Sv",
]


def _poly_sincos(xb):
    """sin(xb), cos(xb) via one shared range reduction + minimax polynomials.

    r = xb - 2*pi*round(xb/2*pi) in [-pi, pi] via a two-constant (Cody-Waite)
    reduction — 2*pi split into an 11-bit-exact head (k*C1 cancels exactly
    against xb) and a tail C2 — so the reduction residual is ~k*ulp(C2)
    ~ 5e-8 at the posenc arg scale (k <= ~500 for |x|<=6, F=10) and accuracy
    is polynomial-limited: max abs error 1.8e-5 (sin, deg-9 odd) / 2.6e-6
    (cos, deg-10 even), measured over |xb| <= 3100. The single-constant
    reduction loses ~2.3e-4 there (advisor r3); the extra FMA is a measured
    step-level wash on v5e (33.9 +- 0.3 ms either way, r4). ~6x faster than
    the XLA sin+cos pair in-kernel (docs/PERF.md): one rounding + ~23 FMAs
    instead of two full libm-style evaluations.
    """
    y = xb * 0.15915494309189535  # 1/(2*pi)
    k = jnp.round(y)
    # C1 = 6.28125 (11-bit mantissa: k*C1 exact), C2 = 2*pi - C1
    r = (xb - k * 6.28125) - k * 0.0019353071795864769
    r2 = r * r
    s = r * (0.9999845940079196 + r2 * (-0.16663259474612063 + r2 * (
        0.008312388725549872 + r2 * (-0.00019316277202555934
                                     + r2 * 2.1732608711915083e-06))))
    c = 0.9999994437337446 + r2 * (-0.4999955824558693 + r2 * (
        0.04166103368789301 + r2 * (-0.0013862750536381093 + r2 * (
            2.4253237753182864e-05 + r2 * -2.2194166856720897e-07))))
    return s, c


def _trig_blocks(x, sel, num_freqs, dtype):
    """sin/cos of x*2^f for f=0..F-1, freq-major [T, 3F] f32 each.

    bf16 mode picks the implementation from TRIG_MODE (see above); the
    default "poly" path costs one selector matmul + one range reduction +
    two polynomials, at 1.7e-5 max abs error — invisible under bf16
    quantization. The f32 parity path keeps exact per-frequency trig so
    reference-tolerance tests are unaffected. The recurrence variant's
    error is ~7e-4 at F=10 over |x|<=6 (grows ~2x per doubling).
    """
    if TRIG_MODE == "repeat":
        # xb via pltpu.repeat (tile repeat: x0 x1 x2 x0 x1 x2 .. = the
        # f-major lane order the kernel layout already uses) times an EXACT
        # power-of-two lane constant — replaces the 6-pass f32-HIGHEST
        # selector matmul with one VPU lane-replication + one multiply.
        # 2^f is exact in f32, so this serves the f32 parity path too.
        f_lane = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 3 * num_freqs), 1) // 3
        )
        pow2 = jnp.exp2(f_lane.astype(jnp.float32))
        xrep = pltpu.repeat(x, num_freqs, axis=1)
        xb = xrep * pow2
        if dtype == jnp.float32:
            return jnp.sin(xb), jnp.cos(xb)
        return _poly_sincos(xb)
    if dtype == jnp.float32 or num_freqs == 1 or TRIG_MODE == "selector":
        xb = _dot(x, sel)
        return jnp.sin(xb), jnp.cos(xb)
    if TRIG_MODE == "poly":
        # The selector matmul must stay f32-HIGHEST: xb = x*2^f needs exact
        # phases (DEFAULT loses 2.0 rad at the top frequency, HIGH/bf16_3x
        # 0.031 — measured on v5e; a VPU lane-concat construction is exact
        # but slower than the 6-pass matmul, 41.0 vs 40.2 ms/step).
        xb = _dot(x, sel)
        return _poly_sincos(xb)
    s = jnp.sin(x)
    c = jnp.cos(x)
    ss, cs = [s], [c]
    for _ in range(num_freqs - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        ss.append(s)
        cs.append(c)
    return jnp.concatenate(ss, axis=-1), jnp.concatenate(cs, axis=-1)


def _embed_pts(x, kp, dtype):
    """e [T, 63] in kernel row-order, plus f32 sin/cos blocks for bwd trig."""
    s, c = _trig_blocks(x, kp["Sp"], kp["Sp"].shape[1] // 3, dtype)
    e = jnp.concatenate(
        [x.astype(dtype), s.astype(dtype), c.astype(dtype)], axis=-1
    )
    return e, s, c


def _embed_views(v, kp, dtype):
    """ev [RV, 27] in kernel row-order, plus f32 sin/cos blocks for bwd trig.

    RV is the number of *rays* in the tile (ray-major mode) or the number of
    points (dense mode, samples_per_ray == 1)."""
    s, c = _trig_blocks(v, kp["Sv"], kp["Sv"].shape[1] // 3, dtype)
    ev = jnp.concatenate(
        [v.astype(dtype), s.astype(dtype), c.astype(dtype)], axis=-1
    )
    return ev, s, c


def _per_ray_to_per_point(x_ray, spr):
    """[RV, C] -> [RV*spr, C] (each ray row repeated for its spr samples)."""
    if spr == 1:
        return x_ray
    rv, c = x_ray.shape
    return jnp.broadcast_to(x_ray[:, None, :], (rv, spr, c)).reshape(rv * spr, c)


def _lane_select_mask(rpt: int, spr: int) -> jnp.ndarray:
    """E [rpt*spr, spr] f32 with E[(r,s), l] = 1 iff l == s.

    Host-side constant for the in-kernel z relayout: the per-point depth
    column is z_pt = sum(Zrep * E, axis=-1) where Zrep is the (supported)
    per-ray broadcast of the [rpt, spr] z block. Mosaic rejects the direct
    lane->sublane reshape (rpt, spr) -> (rpt*spr, 1), so the relayout is a
    masked lane reduction instead (measured exact + cheap on v5e)."""
    lane = np.arange(spr)[None, :]
    row = (np.arange(rpt * spr) % spr)[:, None]
    return jnp.asarray((lane == row).astype(np.float32))


def _col_from_plane(plane, emask, spr):
    """[rpt, spr] ray-plane -> [T, 1] per-point column (lane -> sublane).

    Spread each ray row to its spr point rows (supported broadcast-reshape),
    then select the diagonal lane per point via the E mask. Used for the z
    relayout in raygen mode and the cotangent planes in planes-IO mode."""
    rpt = plane.shape[0]
    rep = jnp.broadcast_to(plane[:, None, :], (rpt, spr, spr)).reshape(
        rpt * spr, spr
    )
    return jnp.sum(rep * emask, axis=-1, keepdims=True)


def _plane_from_col(col, emask, spr):
    """[T, 1] per-point column -> [rpt, spr] ray-plane (sublane -> lane).

    Splat the column across lanes, mask to the diagonal, then segment-sum
    each ray's spr point rows (the supported reshape+reduce pattern, same as
    _per_point_to_per_ray). Pure VPU work that hides under the MXU."""
    T = col.shape[0]
    rpt = T // spr
    masked = jnp.broadcast_to(col, (T, spr)) * emask
    return jnp.sum(masked.reshape(rpt, spr, spr), axis=1)


def _per_point_to_per_ray(x_pt, spr):
    """[RV*spr, C] -> [RV, C] by summing each ray's spr sample rows."""
    if spr == 1:
        return x_pt
    n, c = x_pt.shape
    return jnp.sum(x_pt.reshape(n // spr, spr, c), axis=1)


def _embed_pts_rays(ro_blk, rd_blk, z_blk, em, spr, kp, dtype):
    """Raygen-mode point embedding with the selector matmul staged PER RAY.

    In-kernel raygen first: x [T, 3] = rays_o + rays_d * z replaces the
    reference's host-graph ``pts = o + d*z`` (run_nerf.py:381) — computed
    OUTSIDE the kernel, the [R*S, 3] points array occupies 3 of 128 lanes
    for every op that touches it (broadcast, multiply-add, pad copy;
    measured ~4 ms/step of pure layout waste on v5e). Here the same f32
    madd runs on VMEM-resident blocks, bit-identical to the outside
    computation, and the points never exist in HBM.

    xb[(r,s), (f,d)] = x*2^f is computed as A_pt + B_pt*z_pt where
    A = ro @ Sp and B = rd @ Sp are per-RAY [rpt, 3F] — the 6-pass
    f32-HIGHEST selector matmul (docs/PERF.md: HIGH/bf16 lose phase
    accuracy) then runs on rpt rows instead of rpt*spr (192x fewer rows at
    the fine level), replaced per point by one VPU madd that hides under
    the MXU. Bit-equal to scaling the materialized points: multiplying by a
    power of two shifts the exponent only, so it commutes with f32 rounding
    — fl(ro + fl(rd*z))*2^f == fl(ro*2^f + fl(rd*2^f * z)) at these
    magnitudes (|xb| <= ~3100, no overflow/subnormals).

    bf16 poly/selector modes only; f32 parity and the repeat/recurrence
    experiment modes keep the exact materialized-x path.

    Returns (e, s, c) like _embed_pts."""
    z_pt = _col_from_plane(z_blk, em, spr)  # [T, 1]
    ro_pt = _per_ray_to_per_point(ro_blk, spr)
    rd_pt = _per_ray_to_per_point(rd_blk, spr)
    x = ro_pt + rd_pt * z_pt
    if (
        dtype == jnp.float32
        # num_freqs == 1: _trig_blocks uses exact trig there even in poly
        # mode — fall back so raygen and dense modes stay bit-matched
        or kp["Sp"].shape[1] // 3 == 1
        or TRIG_MODE not in ("poly", "selector")
    ):
        return _embed_pts(x, kp, dtype)
    A = _dot(ro_blk, kp["Sp"])  # [rpt, 3F], exact power-of-two scaling
    B = _dot(rd_blk, kp["Sp"])
    xb = _per_ray_to_per_point(A, spr) + _per_ray_to_per_point(B, spr) * z_pt
    if TRIG_MODE == "poly":
        s, c = _poly_sincos(xb)
    else:
        s, c = jnp.sin(xb), jnp.cos(xb)
    e = jnp.concatenate(
        [x.astype(dtype), s.astype(dtype), c.astype(dtype)], axis=-1
    )
    return e, s, c


def _trunk_forward(e, kp, dtype, keep_acts=False):
    acts = []
    width = kp["W05e"].shape[1] // 2
    z05 = _dot(e, kp["W05e"])  # layer-0 and skip contributions in one pass
    h = jax.nn.relu(z05[:, :width] + kp["b0"])
    for i in range(1, _DEPTH):
        if keep_acts:
            acts.append(h.astype(dtype))
        z = _dot(h.astype(dtype), kp[f"W{i}"]) + kp[f"b{i}"]
        if i == _SKIP + 1:
            z = z + z05[:, width:]
        h = jax.nn.relu(z)
    if keep_acts:
        acts.append(h.astype(dtype))
    return h, acts


def _head_forward(h, ev, kp, dtype, width, spr):
    """ev is per-ray [RV, 27]; its Wve contribution is computed per ray and
    broadcast to the tile's RV*spr points (spr=1 -> dense/per-point mode).

    Returns (out [T, 4] = cat(rgb, alpha), feat, hv): rgb and alpha come out
    of the logical cat([hv, h7]) @ Wout ([3W/2, 4], see pack_params), split
    into its two row blocks so the [T, 3W/2] lane-concat never materializes
    (sublane slices of Wout are tile-aligned and free).
    """
    hc = h.astype(dtype)
    feat = _dot(hc, kp["Wf"]) + kp["bf"]  # [T, W]
    ev_contrib = _per_ray_to_per_point(_dot(ev, kp["Wve"]), spr)
    hv = jax.nn.relu(_dot(feat.astype(dtype), kp["Wvf"]) + ev_contrib + kp["bv"])
    hw = width // 2
    out = (
        _dot(hv.astype(dtype), kp["Wout"][:hw])
        + _dot(hc, kp["Wout"][hw:])
        + kp["bout"]
    )  # [T, 4] = (rgb, alpha)
    return out, feat, hv


def _fwd_kernel(dtype, width, spr, *refs):
    *kp_refs, x_ref, v_ref, out_ref = refs
    kp = {name: r[...] for name, r in zip(_KP_ORDER, kp_refs)}
    e, _, _ = _embed_pts(x_ref[...], kp, dtype)
    ev, _, _ = _embed_views(v_ref[...], kp, dtype)
    h, _ = _trunk_forward(e, kp, dtype)
    out, _, _ = _head_forward(h, ev, kp, dtype, width, spr)
    out_ref[...] = out


def _fwd_kernel_rays(dtype, width, spr, planes_io, *refs):
    *kp_refs, ro_ref, rd_ref, v_ref, z_ref, em_ref, out_ref = refs
    kp = {name: r[...] for name, r in zip(_KP_ORDER, kp_refs)}
    em = em_ref[...]
    e, _, _ = _embed_pts_rays(
        ro_ref[...], rd_ref[...], z_ref[...], em, spr, kp, dtype
    )
    ev, _, _ = _embed_views(v_ref[...], kp, dtype)
    h, _ = _trunk_forward(e, kp, dtype)
    out, _, _ = _head_forward(h, ev, kp, dtype, width, spr)
    if planes_io:
        # emit (r,g,b,sigma) as four [rpt, spr] ray-planes so everything
        # outside the kernel works on full-lane [R, S] arrays
        for c in range(4):
            out_ref[c] = _plane_from_col(out[:, c : c + 1], em, spr)
    else:
        out_ref[...] = out


def _mlp_backward_math(
    kp, dtype, width, n_freq_p, n_freq_v, spr,
    e, sp, cp, ev, sv, cv, acts, h7, feat, hv, g,
    want_input_grads=True,
):
    """Shared backward math: cotangent g [T, 4] on raw -> (weight-grad dict,
    dx [T, 3], dv [RV, 3]). ``sp/cp`` (``sv/cv``) are the f32 sin/cos blocks
    from the forward embed, reused for the trig grads. ``want_input_grads=
    False`` skips the d_e/dx/dv branch (used by the fused render op, whose
    inputs — rays and z — are non-differentiated leaves in the training
    graph, ref run_nerf.py:394)."""
    accs = {}

    def acc(name, val):
        accs[name] = val

    # --- head backward (out = cat([hv, h7]) @ Wout + bout, cat-free: the
    # two Wout row blocks are handled separately; dWout re-joins along the
    # sublane axis, which concatenates for free) ---
    g32 = g.astype(jnp.float32)
    gc = g32.astype(dtype)
    hw = width // 2
    acc(
        "dWout",
        jnp.concatenate(
            [_dot_at(hv.astype(dtype), gc), _dot_at(h7.astype(dtype), gc)],
            axis=0,
        ),
    )
    acc("dbout", jnp.sum(g32, axis=0, keepdims=True))
    d_hv = _dot_t(gc, kp["Wout"][:hw]) * (hv > 0)
    d_h7_out = _dot_t(gc, kp["Wout"][hw:])
    d_hv_c = d_hv.astype(dtype)

    acc("dWvf", _dot_at(feat.astype(dtype), d_hv_c))
    # view branch per ray: dWve = ev^T (Σ_samples d_hv); d_ev likewise
    d_hv_ray = _per_point_to_per_ray(d_hv, spr)  # [RV, W/2] f32
    d_hv_ray_c = d_hv_ray.astype(dtype)
    acc("dWve", _dot_at(ev, d_hv_ray_c))
    acc("dbv", jnp.sum(d_hv, axis=0, keepdims=True))

    d_feat = _dot_t(d_hv_c, kp["Wvf"])
    dv = None
    if want_input_grads:
        d_ev = _dot_t(d_hv_ray_c, kp["Wve"])  # [RV, 27]
        fv3 = 3 * n_freq_v
        d_vb = d_ev[:, 3 : 3 + fv3] * cv - d_ev[:, 3 + fv3 :] * sv
        dv = d_ev[:, :3].astype(jnp.float32) + _dot_t(
            d_vb.astype(jnp.float32), kp["Sv"]
        )

    d_feat_c = d_feat.astype(dtype)
    acc("dWf", _dot_at(h7.astype(dtype), d_feat_c))
    acc("dbf", jnp.sum(d_feat, axis=0, keepdims=True))

    d_h = (_dot_t(d_feat_c, kp["Wf"]) + d_h7_out) * (h7 > 0)

    # --- trunk backward ---
    d5c = None
    for i in range(_DEPTH - 1, 0, -1):
        d_c = d_h.astype(dtype)
        a_prev = acts[i - 1]
        acc(f"dW{i}", _dot_at(a_prev, d_c))
        acc(f"db{i}", jnp.sum(d_h, axis=0, keepdims=True))
        if i == _SKIP + 1:
            d5c = d_c  # skip-contribution cotangent, joins dW05e below
        # relu mask in f32: Mosaic on v5e rejects bf16 vector compares
        d_h = _dot_t(d_c, kp[f"W{i}"]) * (a_prev.astype(jnp.float32) > 0)

    d0 = d_h.astype(dtype)
    # merged embedding grads: dW05e = e^T @ [d0 | d5] in ONE K=T matmul
    d05 = jnp.concatenate([d0, d5c], axis=-1)
    acc("dW05e", _dot_at(e, d05))
    acc("db0", jnp.sum(d_h, axis=0, keepdims=True))
    dx = None
    if want_input_grads:
        d_e = _dot_t(d05, kp["W05e"])  # = d0 @ W0e^T + d5 @ W5e^T
        fp3 = 3 * n_freq_p
        d_xb = d_e[:, 3 : 3 + fp3] * cp - d_e[:, 3 + fp3 :] * sp
        dx = d_e[:, :3].astype(jnp.float32) + _dot_t(
            d_xb.astype(jnp.float32), kp["Sp"]
        )
    return accs, dx, dv


def _accumulate_weight_grads(douts, accs):
    """Accumulate per-tile weight grads across the sequential grid via
    revisited (VMEM-resident) output blocks."""
    is_first = pl.program_id(0) == 0
    for name, ref in douts.items():
        val = accs[name].astype(jnp.float32)

        @pl.when(is_first)
        def _(ref=ref, val=val):
            ref[...] = val

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, val=val):
            ref[...] = ref[...] + val


def _make_bwd_kernel(dtype, width, n_freq_p, n_freq_v, spr, input_grads=True):
    n_kp = len(_KP_ORDER)

    def kernel(*refs):
        kp_refs = refs[:n_kp]
        x_ref, v_ref, g_ref = refs[n_kp : n_kp + 3]
        out_refs = refs[n_kp + 3 :]
        d_names = [n for n in _KP_ORDER if not n.startswith("S")]
        douts = {f"d{n}": r for n, r in zip(d_names, out_refs[: len(d_names)])}

        kp = {name: r[...] for name, r in zip(_KP_ORDER, kp_refs)}
        x = x_ref[...]
        v = v_ref[...]
        g = g_ref[...]

        e, sp, cp = _embed_pts(x, kp, dtype)
        ev, sv, cv = _embed_views(v, kp, dtype)

        # --- recompute forward, keeping activations ---
        h7, acts = _trunk_forward(e, kp, dtype, keep_acts=True)
        acts = acts[:-1]  # [h0..h6]
        _, feat, hv = _head_forward(h7, ev, kp, dtype, width, spr)

        accs, dx, dv = _mlp_backward_math(
            kp, dtype, width, n_freq_p, n_freq_v, spr,
            e, sp, cp, ev, sv, cv, acts, h7, feat, hv, g,
            want_input_grads=input_grads,
        )
        if input_grads:
            dx_ref, dv_ref = out_refs[len(d_names)], out_refs[len(d_names) + 1]
            dx_ref[...] = dx
            dv_ref[...] = dv
        _accumulate_weight_grads(douts, accs)

    return kernel


def _make_bwd_kernel_rays(dtype, width, n_freq_p, n_freq_v, spr, planes_io):
    """Backward for raygen mode: recomputes x from (rays_o, rays_d, z) in-VMEM
    (same relayout as the forward) and emits weight grads only — rays and
    sample depths are never differentiated in the training graph (rays are
    data; fine z is stop-gradded, ref run_nerf.py:394). With ``planes_io``
    the cotangent arrives as four [rpt, spr] ray-planes and is merged to the
    per-point [T, 4] layout in-VMEM."""
    n_kp = len(_KP_ORDER)

    def kernel(*refs):
        kp_refs = refs[:n_kp]
        ro_ref, rd_ref, v_ref, z_ref, em_ref, g_ref = refs[n_kp : n_kp + 6]
        out_refs = refs[n_kp + 6 :]
        d_names = [n for n in _KP_ORDER if not n.startswith("S")]
        douts = {f"d{n}": r for n, r in zip(d_names, out_refs)}

        kp = {name: r[...] for name, r in zip(_KP_ORDER, kp_refs)}
        em = em_ref[...]
        if planes_io:
            g = jnp.concatenate(
                [_col_from_plane(g_ref[c], em, spr) for c in range(4)], axis=-1
            )
        else:
            g = g_ref[...]

        e, sp, cp = _embed_pts_rays(
            ro_ref[...], rd_ref[...], z_ref[...], em, spr, kp, dtype
        )
        ev, sv, cv = _embed_views(v_ref[...], kp, dtype)
        h7, acts = _trunk_forward(e, kp, dtype, keep_acts=True)
        acts = acts[:-1]
        _, feat, hv = _head_forward(h7, ev, kp, dtype, width, spr)

        accs, _, _ = _mlp_backward_math(
            kp, dtype, width, n_freq_p, n_freq_v, spr,
            e, sp, cp, ev, sv, cv, acts, h7, feat, hv, g,
            want_input_grads=False,
        )
        _accumulate_weight_grads(douts, accs)

    return kernel


def _pad_rows(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _fused_op(kp: Dict, x, v, dtype, width, n_freq_p, n_freq_v, spr,
              input_grads):
    """x: [R*spr, 3] points; v: [R, 3] per-ray dirs (spr=1 -> v per point).

    ``input_grads=False`` builds a backward kernel that skips the whole
    d_e/dx/dv branch and returns zero cotangents for x and v — the training
    path's case: rays are not differentiated and fine sample positions are
    stop-gradded (ref run_nerf.py:394), so the input-grad matmuls + trig
    grads are pure waste there (measured in docs/PERF.md)."""
    return _fused_fwd_impl(kp, x, v, dtype, width, spr)


def _kp_list(kp):
    return [kp[n] for n in _KP_ORDER]


def _tile_geometry(tile_budget, spr):
    """Rays per tile and point-rows per tile for a given sample count.

    The per-ray viewdir block is [rpt, 3], and Mosaic requires its sublane
    dim divisible by 8 — so rpt is kept a multiple of 8 (rounding the
    points-per-tile budget up when spr is large)."""
    if spr == 1:
        return tile_budget, tile_budget
    rpt = max(1, tile_budget // spr)
    rpt = max(8, rpt - rpt % 8)
    return rpt, rpt * spr


def _fused_fwd_impl(kp, x, v, dtype, width, spr):
    n = x.shape[0]
    rpt, tile = _tile_geometry(FWD_TILE, spr)
    vp = _pad_rows(v, rpt)
    xp = _pad_rows(x, tile)
    grid = xp.shape[0] // tile

    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    out = pl.pallas_call(
        partial(_fwd_kernel, dtype, width, spr),
        grid=(grid,),
        in_specs=kp_specs
        + [
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rpt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), xp, vp)
    return out[:n]


def _fused_fwd_rule(kp, x, v, dtype, width, n_freq_p, n_freq_v, spr,
                    input_grads):
    return _fused_fwd_impl(kp, x, v, dtype, width, spr), (kp, x, v)


def _fused_bwd_rule(dtype, width, n_freq_p, n_freq_v, spr, input_grads,
                    res, g):
    kp, x, v = res
    n = x.shape[0]
    nv = v.shape[0]
    rpt, tile = _tile_geometry(BWD_TILE, spr)
    vp = _pad_rows(v, rpt)
    xp = _pad_rows(x, tile)
    gp = _pad_rows(g, tile)  # zero cotangent in padding -> no grad pollution
    grid = xp.shape[0] // tile

    d_names = [n_ for n_ in _KP_ORDER if not n_.startswith("S")]
    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    tile_spec3 = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tile_spec4 = pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ray_spec3 = pl.BlockSpec((rpt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)

    # weight-grad outputs live at block (0,0) for every grid step (accumulated)
    dkp_specs = [
        pl.BlockSpec(kp[n_].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n_ in d_names
    ]
    dkp_shapes = [jax.ShapeDtypeStruct(kp[n_].shape, jnp.float32) for n_ in d_names]
    out_specs = dkp_specs.copy()
    out_shapes = dkp_shapes.copy()
    if input_grads:
        out_specs += [tile_spec3, ray_spec3]
        out_shapes += [
            jax.ShapeDtypeStruct((xp.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((vp.shape[0], 3), jnp.float32),
        ]

    outs = pl.pallas_call(
        _make_bwd_kernel(dtype, width, n_freq_p, n_freq_v, spr, input_grads),
        grid=(grid,),
        in_specs=kp_specs + [tile_spec3, ray_spec3, tile_spec4],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), xp, vp, gp)

    dkp = {n_: g_.astype(kp[n_].dtype) for n_, g_ in zip(d_names, outs[: len(d_names)])}
    dkp["Sp"] = jnp.zeros_like(kp["Sp"])
    dkp["Sv"] = jnp.zeros_like(kp["Sv"])
    if input_grads:
        dx = outs[len(d_names)][:n]
        dv = outs[len(d_names) + 1][:nv]
    else:
        dx = jnp.zeros((n, 3), jnp.float32)
        dv = jnp.zeros((nv, 3), jnp.float32)
    return dkp, dx, dv


_fused_op.defvjp(_fused_fwd_rule, _fused_bwd_rule)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_op_rays(kp: Dict, ro, rd, v, z, dtype, width, n_freq_p, n_freq_v,
                   spr, planes_io):
    """Raygen-mode op: rays_o/rays_d/viewdirs [R, 3] + z [R, spr] in, raw
    [R*spr, 4] (or [4, R, spr] ray-planes when ``planes_io``) out. Points are
    generated inside the kernel (see _embed_pts_rays); the backward emits
    weight grads only and zero cotangents for rays/z (the training graph
    never differentiates them)."""
    return _fused_rays_fwd_impl(kp, ro, rd, v, z, dtype, width, spr, planes_io)


def _rays_specs(rpt, spr, tile):
    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    ray_spec3 = pl.BlockSpec((rpt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((rpt, spr), lambda i: (i, 0), memory_space=pltpu.VMEM)
    em_spec = pl.BlockSpec(
        (tile, spr), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return kp_specs + [ray_spec3, ray_spec3, ray_spec3, z_spec, em_spec]


def _fused_rays_fwd_impl(kp, ro, rd, v, z, dtype, width, spr, planes_io):
    n_rays = ro.shape[0]
    rpt, tile = _tile_geometry(FWD_TILE, spr)
    rop = _pad_rows(ro, rpt)
    rdp = _pad_rows(rd, rpt)
    vp = _pad_rows(v, rpt)
    zp = _pad_rows(z, rpt)
    grid = rop.shape[0] // rpt
    em = _lane_select_mask(rpt, spr)

    if planes_io:
        out_spec = pl.BlockSpec(
            (4, rpt, spr), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((4, rop.shape[0], spr), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((rop.shape[0] * spr, 4), jnp.float32)

    out = pl.pallas_call(
        partial(_fwd_kernel_rays, dtype, width, spr, planes_io),
        grid=(grid,),
        in_specs=_rays_specs(rpt, spr, tile),
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), rop, rdp, vp, zp, em)
    if planes_io:
        return out[:, :n_rays] if rop.shape[0] != n_rays else out
    return out[: n_rays * spr] if rop.shape[0] != n_rays else out


def _fused_rays_fwd_rule(kp, ro, rd, v, z, dtype, width, n_freq_p, n_freq_v,
                         spr, planes_io):
    return (
        _fused_rays_fwd_impl(kp, ro, rd, v, z, dtype, width, spr, planes_io),
        (kp, ro, rd, v, z),
    )


def _fused_rays_bwd_rule(dtype, width, n_freq_p, n_freq_v, spr, planes_io,
                         res, g):
    kp, ro, rd, v, z = res
    rpt, tile = _tile_geometry(BWD_TILE, spr)
    rop = _pad_rows(ro, rpt)
    rdp = _pad_rows(rd, rpt)
    vp = _pad_rows(v, rpt)
    zp = _pad_rows(z, rpt)
    grid = rop.shape[0] // rpt
    em = _lane_select_mask(rpt, spr)

    if planes_io:
        # zero cotangent in ray padding -> no grad pollution
        pad = rop.shape[0] - ro.shape[0]
        gp = (
            jnp.concatenate(
                [g, jnp.zeros((4, pad, spr), g.dtype)], axis=1
            )
            if pad
            else g
        )
        g_spec = pl.BlockSpec(
            (4, rpt, spr), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
    else:
        gp = _pad_rows(g, tile)
        g_spec = pl.BlockSpec(
            (tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    d_names = [n_ for n_ in _KP_ORDER if not n_.startswith("S")]
    dkp_specs = [
        pl.BlockSpec(kp[n_].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n_ in d_names
    ]
    dkp_shapes = [jax.ShapeDtypeStruct(kp[n_].shape, jnp.float32) for n_ in d_names]

    outs = pl.pallas_call(
        _make_bwd_kernel_rays(dtype, width, n_freq_p, n_freq_v, spr, planes_io),
        grid=(grid,),
        in_specs=_rays_specs(rpt, spr, tile) + [g_spec],
        out_specs=dkp_specs,
        out_shape=dkp_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), rop, rdp, vp, zp, em, gp)

    dkp = {n_: g_.astype(kp[n_].dtype) for n_, g_ in zip(d_names, outs)}
    dkp["Sp"] = jnp.zeros_like(kp["Sp"])
    dkp["Sv"] = jnp.zeros_like(kp["Sv"])
    return (
        dkp,
        jnp.zeros_like(ro),
        jnp.zeros_like(rd),
        jnp.zeros_like(v),
        jnp.zeros_like(z),
    )


_fused_op_rays.defvjp(_fused_rays_fwd_rule, _fused_rays_bwd_rule)


def fused_query_rays(
    params: Dict,
    cfg: MLPConfig,
    pe_pts: PosEncConfig,
    pe_views: PosEncConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    z_vals: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Raygen-mode query: rays + sample depths in, raw [R, S, 4] out.

    Equivalent to ``pts = rays_o[:,None] + rays_d[:,None]*z[...,None]`` (ref
    run_nerf.py:381) followed by ``fused_query(pts, viewdirs)`` — but the
    [R*S, 3] points tensor is generated inside the kernel and never touches
    HBM. Outside the kernel every op on that tensor uses 3 of 128 lanes;
    measured ~4 ms/step of broadcast/madd/pad-copy waste on the flagship
    shape (docs/PERF.md round 4).

    Training-path only: the VJP emits zero cotangents for rays/viewdirs/z
    (callers stop-gradient them anyway, matching ref run_nerf.py:394).
    Requires S % 8 == 0 (ray-major tiling); callers fall back to
    ``fused_query`` otherwise.
    """
    R, S = z_vals.shape
    kp = pack_params(params, cfg, pe_pts, pe_views, compute_dtype)
    out = _fused_op_rays(
        kp, rays_o, rays_d, viewdirs, z_vals, compute_dtype, cfg.width,
        pe_pts.num_freqs, pe_views.num_freqs, S, False,
    )
    return out.reshape(R, S, 4)


def fused_query_rays_planes(
    params: Dict,
    cfg: MLPConfig,
    pe_pts: PosEncConfig,
    pe_views: PosEncConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    z_vals: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Raygen + planes-IO query: rays + depths in, raw planes [4, R, S] out.

    Same numerics as ``fused_query_rays`` but the (r,g,b,sigma) channels come
    out as four full-lane [R, S] planes (and the backward takes the cotangent
    in the same layout). The per-point [R*S, 4] tensor — whose 4-of-128-lane
    layout forces XLA relayout copies at both the forward and backward kernel
    boundaries (~1.5 ms/step measured on the flagship shape) — never exists
    in HBM; the in-kernel relayout is VPU work hidden under the MXU.
    Consumers use ops/compositing.py raw2outputs_planes.
    """
    R, S = z_vals.shape
    kp = pack_params(params, cfg, pe_pts, pe_views, compute_dtype)
    return _fused_op_rays(
        kp, rays_o, rays_d, viewdirs, z_vals, compute_dtype, cfg.width,
        pe_pts.num_freqs, pe_views.num_freqs, S, True,
    )


def fused_query(
    params: Dict,
    cfg: MLPConfig,
    pe_pts: PosEncConfig,
    pe_views: PosEncConfig,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    input_grads: bool = True,
) -> jnp.ndarray:
    """Drop-in replacement for the jnp query path: pts [R,S,3], viewdirs [R,3]
    -> raw [R,S,4].

    Ray-major mode (S a multiple of 8): viewdirs stay [R,3] end-to-end — the
    kernel computes the 27-dim view embedding and its Wve matmul once per RAY
    and broadcasts in VMEM, instead of materializing the [R*S,3] broadcast in
    HBM (and its sum-transpose on the backward pass). Falls back to the dense
    per-point layout (spr=1) for sample counts Mosaic can't reshape on.

    ``input_grads=False``: the backward kernel skips the d_e/dx/dv branch and
    emits zero pts/viewdirs cotangents — use when pts/viewdirs are known
    non-differentiated (the training loss; see render/renderer.py).
    """
    R, S, _ = pts.shape
    kp = pack_params(params, cfg, pe_pts, pe_views, compute_dtype)
    x = pts.reshape(R * S, 3)
    if S % 8 == 0 and S > 1:
        v, spr = viewdirs, S
    else:
        v = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)
        spr = 1
    out = _fused_op(
        kp, x, v, compute_dtype, cfg.width, pe_pts.num_freqs,
        pe_views.num_freqs, spr, bool(input_grads),
    )
    return out.reshape(R, S, 4)
