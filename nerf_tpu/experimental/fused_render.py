"""Fused Pallas kernel: point gen + posenc + MLP + volume compositing.

Extends ops/fused_mlp.py (same trunk/head code) so that one kernel pass per
coarse/fine level goes straight from per-ray inputs to per-ray outputs:

    (rays_o, rays_d, viewdirs, z_vals, noise)  ->  (rgb_map, disp, acc, weights)

Neither the [R*S, 3] sample points nor the [R, S, 4] raw network outputs
ever exist in HBM — points are generated in VMEM from 9 floats/ray + S
depths, and the compositing (ref raw2outputs, run_nerf.py:262-305) runs
in-register on each tile's [rays, S] block. HBM traffic per ray drops from
~(3S in + 4S out) floats to ~(2S + 9 in, S + 5 out).

TPU-first design notes:
- The exclusive-cumprod transmittance is computed as
  ``exp((log(1 - alpha + 1e-10)) @ U)`` with U the strictly-upper-triangular
  ones matrix — an MXU matmul instead of a lane-serial scan (the
  "online-softmax-like" structure from SURVEY.md §5 made one matmul).
  The backward suffix sums use the same matrix transposed.
- The backward pass propagates gradients ONLY to the network parameters:
  rays, z_vals and noise are non-differentiated leaves of the training
  graph (the loss touches them through no trainable op, and fine-sample
  positions are stop-gradded anyway, ref run_nerf.py:394) — so the whole
  d_e/dx/dv branch of the MLP backward is skipped.
- retraw (and the no-viewdirs architecture) falls back to the split
  fused-MLP + jnp-compositor path in render/renderer.py.

Numerics: transmittance via exp∘sum∘log differs from the jnp cumprod at the
last-ulp level (f32 HIGHEST matmuls); parity tests bound it at ~1e-5.

STATUS (r5, 2026-08-21): RETIRED to experimental/. r3 measured it slower at
the flagship shape (52.6 vs 48.3 ms/step); r4 removed its HBM rationale
(the split path gained in-kernel raygen + planes IO); r5 closed the last
open question — the hypothesized large-S win does not exist: at S=256+256,
N_rand=1024 it measures 404.8 ms/step vs the split path's 25.1 (16x
SLOWER — the in-kernel [T, R] selector-matmul flatten and per-channel
compositing scale with S² per ray). Decision record: docs/PERF.md round 5.
Kept compiling + parity-tested (tests/test_fused_render.py) as a reference
implementation of single-kernel rays→maps; reachable via
``--fused_render``.
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
from nerf_tpu.ops.compositing import strict_upper_ones as _strict_upper_ones
from nerf_tpu.ops.fused_mlp import (
    _KP_ORDER,
    _accumulate_weight_grads,
    _dot,
    _dot_t,
    _embed_pts,
    _embed_views,
    _head_forward,
    _interpret,
    _kp_list,
    _mlp_backward_math,
    _pad_rows,
    _tile_geometry,
    _trunk_forward,
    FWD_TILE,
    BWD_TILE,
    _FWD_VMEM_BYTES,
    _BWD_VMEM_BYTES,
    pack_params,
)
from nerf_tpu.ops.fused_mlp import supports as mlp_supports


def supports(cfg: MLPConfig, pe_pts, pe_views, n_samples: int) -> bool:
    return mlp_supports(cfg, pe_pts, pe_views) and n_samples % 8 == 0



def _f32_dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _flatten_rays(x2d):
    """[R, S] -> [R*S, 1] with row k = x2d[k // S, k mod S].

    Mosaic supports the [T,1]->[R,S] shape cast but NOT its inverse (the
    sublane-merge relayout), so this direction is built from iota masks and
    one tiny MXU matmul: rows are replicated per ray via a [T, R] selector,
    then the per-row sample column is picked with a mod-iota mask.
    """
    R, S = x2d.shape
    T = R * S
    k_r = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0)
    r_r = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    At = (k_r // S == r_r).astype(jnp.float32)  # [T, R]
    xs = _f32_dot(At, x2d)  # [T, S]: row k = x2d[k // S, :]
    k_s = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    s_s = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    sel = (k_s % S == s_s).astype(jnp.float32)
    return jnp.sum(xs * sel, axis=1, keepdims=True)  # [T, 1]


def _weighted_rgb_sum(w, rgbs):
    """rgb_map [R, 3]: sum_s w[r,s] * rgbs[r*S+s, c], per channel in the
    ray-major 2D layout (the [T,3]->[R,S,3] cast is unsupported on Mosaic;
    [T,1]->[R,S] is supported)."""
    R, S = w.shape
    cols = [
        jnp.sum(w * rgbs[:, c : c + 1].reshape(R, S), axis=-1, keepdims=True)
        for c in range(3)
    ]
    return jnp.concatenate(cols, axis=-1)


def _composite(sigma_raw, rgb_raw, o, d, v, z, noise, tri, S, white_bkgd):
    """In-kernel raw2outputs (semantics: ops/compositing.py / run_nerf.py:262-305).

    sigma_raw [R*S, 1], rgb_raw [R*S, 3]; per-ray o/d/v [R, 3], z/noise [R, S].
    Returns per-ray maps + the intermediates the backward pass reuses.
    """
    rpt = z.shape[0]
    sigma = sigma_raw.reshape(rpt, S) + noise
    dn = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))  # ||rays_d|| [R,1]
    dz = z[:, 1:] - z[:, :-1]
    dists = jnp.concatenate([dz, jnp.full_like(z[:, :1], 1e10)], axis=-1) * dn

    relu_sig = jnp.maximum(sigma, 0.0)
    ealpha = jnp.exp(-relu_sig * dists)  # = 1 - alpha
    alpha = 1.0 - ealpha
    c = ealpha + 1e-10  # 1 - alpha + 1e-10
    trans = jnp.exp(_f32_dot(jnp.log(c), tri))  # exclusive cumprod
    w = alpha * trans  # [R, S]

    rgbs = jax.nn.sigmoid(rgb_raw.astype(jnp.float32))  # [R*S, 3]
    rgb_map = _weighted_rgb_sum(w, rgbs)
    depth = jnp.sum(w * z, axis=-1, keepdims=True)
    acc = jnp.sum(w, axis=-1, keepdims=True)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)
    return {
        "rgb_map": rgb_map, "disp": disp, "acc": acc, "w": w,
        "sigma": sigma, "dists": dists, "ealpha": ealpha, "c": c,
        "trans": trans, "rgbs": rgbs, "depth": depth,
    }


def _points_from_rays(o, d, z, S):
    """x [R*S, 3] = o + d * z, built in VMEM."""
    rpt = z.shape[0]
    x = o[:, None, :] + d[:, None, :] * z[:, :, None]
    return x.reshape(rpt * S, 3)


def _fwd_kernel(dtype, width, S, white_bkgd, *refs):
    n_kp = len(_KP_ORDER)
    kp = {name: r[...] for name, r in zip(_KP_ORDER, refs[:n_kp])}
    o_ref, d_ref, v_ref, z_ref, n_ref, tri_ref = refs[n_kp : n_kp + 6]
    rgb_ref, disp_ref, acc_ref, w_ref = refs[n_kp + 6 :]

    o, d, v, z = o_ref[...], d_ref[...], v_ref[...], z_ref[...]
    x = _points_from_rays(o, d, z, S)
    e, _, _ = _embed_pts(x, kp, dtype)
    ev, _, _ = _embed_views(v, kp, dtype)
    h7, _ = _trunk_forward(e, kp, dtype)
    out, _, _ = _head_forward(h7, ev, kp, dtype, width, S)
    cmp = _composite(out[:, 3:4], out[:, 0:3], o, d, v, z, n_ref[...],
                     tri_ref[...], S, white_bkgd)
    rgb_ref[...] = cmp["rgb_map"]
    disp_ref[...] = cmp["disp"]
    acc_ref[...] = cmp["acc"]
    w_ref[...] = cmp["w"]


def _make_bwd_kernel(dtype, width, n_freq_p, n_freq_v, S, white_bkgd):
    n_kp = len(_KP_ORDER)
    d_names = [n for n in _KP_ORDER if not n.startswith("S")]

    def kernel(*refs):
        kp = {name: r[...] for name, r in zip(_KP_ORDER, refs[:n_kp])}
        (o_ref, d_ref, v_ref, z_ref, n_ref, tri_ref,
         grgb_ref, gdisp_ref, gacc_ref, gw_ref) = refs[n_kp : n_kp + 10]
        douts = {f"d{n}": r for n, r in zip(d_names, refs[n_kp + 10 :])}

        o, d, v, z = o_ref[...], d_ref[...], v_ref[...], z_ref[...]
        tri = tri_ref[...]
        rpt = z.shape[0]

        # --- recompute forward (remat), keeping trunk activations ---
        x = _points_from_rays(o, d, z, S)
        e, sp, cp = _embed_pts(x, kp, dtype)
        ev, sv, cv = _embed_views(v, kp, dtype)
        h7, acts = _trunk_forward(e, kp, dtype, keep_acts=True)
        acts = acts[:-1]
        out, feat, hv = _head_forward(h7, ev, kp, dtype, width, S)
        cmp = _composite(out[:, 3:4], out[:, 0:3], o, d, v, z, n_ref[...], tri,
                         S, white_bkgd)
        w, c, trans, rgbs = cmp["w"], cmp["c"], cmp["trans"], cmp["rgbs"]
        depth, acc = cmp["depth"], cmp["acc"]

        g_rgb = grgb_ref[...]  # [R, 3]
        g_disp = gdisp_ref[...]  # [R, 1]
        g_acc = gacc_ref[...]  # [R, 1]
        g_w = gw_ref[...]  # [R, S]

        # --- compositing backward: cotangent on w_k ---
        # disp = 1/max(1e-10, depth/acc); where() guards keep the clamped
        # (and empty-ray 0/0) branch's nans out of the zero-cotangent path
        ratio = depth / acc
        live = ratio > 1e-10
        dm = jnp.where(live, -g_disp * cmp["disp"] * cmp["disp"], 0.0)
        g_depth = jnp.where(live, dm / acc, 0.0)
        g_acc_t = g_acc - jnp.where(live, dm * depth / (acc * acc), 0.0)
        if white_bkgd:
            g_acc_t = g_acc_t - jnp.sum(g_rgb, axis=-1, keepdims=True)

        # per-point rgb contribution: sum_c g_rgb_c * rgbs_c (per channel in
        # the 2D layout; the [T,3]->[R,S,3] cast is unsupported on Mosaic)
        rgb_dot = sum(
            g_rgb[:, c : c + 1] * rgbs[:, c : c + 1].reshape(rpt, S)
            for c in range(3)
        )  # [R, S]
        t_w = g_w + rgb_dot + g_depth * z + g_acc_t  # cotangent on w [R, S]

        # w_k = alpha_k * T_k, T_k = prod_{j<k} c_j, c_j = 1 - alpha_j + 1e-10
        # d/d alpha_k = t_k T_k - (sum_{i>k} t_i w_i) / c_k
        suffix = _dot_t(t_w * w, tri)  # [R, S]: sum_{i>k}
        d_alpha = t_w * trans - suffix / c

        # alpha = 1 - exp(-relu(sigma) * dists)
        d_relu_sig = d_alpha * cmp["ealpha"] * cmp["dists"]
        d_sigma = d_relu_sig * (cmp["sigma"] > 0).astype(jnp.float32)

        # rgb_raw backward: rgb_map = sum w * sigmoid(rgb_raw); flat layout
        # (w and g_rgb lifted per point — broadcast [R,3]->[T,3] and the
        # matmul-based [R,S]->[T,1] flatten are Mosaic-supported)
        g_rgb_flat = jnp.broadcast_to(
            g_rgb[:, None, :], (rpt, S, 3)
        ).reshape(rpt * S, 3)
        w_flat = _flatten_rays(w)  # [T, 1]
        d_rgb_raw = w_flat * rgbs * (1.0 - rgbs) * g_rgb_flat  # [T, 3]

        g_pt = jnp.concatenate(
            [d_rgb_raw, _flatten_rays(d_sigma)], axis=-1
        )  # [R*S, 4] cotangent on raw

        accs, _, _ = _mlp_backward_math(
            kp, dtype, width, n_freq_p, n_freq_v, S,
            e, sp, cp, ev, sv, cv, acts, h7, feat, hv, g_pt,
            want_input_grads=False,
        )
        _accumulate_weight_grads(douts, accs)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _fused_render_op(kp, o, d, v, z, noise, dtype, width, n_freq_p, n_freq_v,
                     S, white_bkgd):
    return _fwd_impl(kp, o, d, v, z, noise, dtype, width, S, white_bkgd)


def _fwd_impl(kp, o, d, v, z, noise, dtype, width, S, white_bkgd):
    R = o.shape[0]
    rpt, _ = _tile_geometry(FWD_TILE, S)
    op, dp, vp = _pad_rows(o, rpt), _pad_rows(d, rpt), _pad_rows(v, rpt)
    zp, np_ = _pad_rows(z, rpt), _pad_rows(noise, rpt)
    grid = op.shape[0] // rpt

    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    ray3 = pl.BlockSpec((rpt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rayS = pl.BlockSpec((rpt, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ray1 = pl.BlockSpec((rpt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        partial(_fwd_kernel, dtype, width, S, white_bkgd),
        grid=(grid,),
        in_specs=kp_specs + [ray3, ray3, ray3, rayS, rayS, tri_spec],
        out_specs=[ray3, ray1, ray1, rayS],
        out_shape=[
            jax.ShapeDtypeStruct((op.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((op.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((op.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((op.shape[0], S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), op, dp, vp, zp, np_, _strict_upper_ones(S))
    rgb_map, disp, acc, w = outs
    return rgb_map[:R], disp[:R, 0], acc[:R, 0], w[:R]


def _fwd_rule(kp, o, d, v, z, noise, dtype, width, n_freq_p, n_freq_v, S,
              white_bkgd):
    out = _fwd_impl(kp, o, d, v, z, noise, dtype, width, S, white_bkgd)
    return out, (kp, o, d, v, z, noise)


def _bwd_rule(dtype, width, n_freq_p, n_freq_v, S, white_bkgd, res, g):
    kp, o, d, v, z, noise = res
    g_rgb, g_disp, g_acc, g_w = g
    rpt, _ = _tile_geometry(BWD_TILE, S)
    op, dp, vp = _pad_rows(o, rpt), _pad_rows(d, rpt), _pad_rows(v, rpt)
    zp, np_ = _pad_rows(z, rpt), _pad_rows(noise, rpt)
    gr = _pad_rows(g_rgb, rpt)
    gd = _pad_rows(g_disp[:, None], rpt)
    ga = _pad_rows(g_acc[:, None], rpt)
    gw = _pad_rows(g_w, rpt)
    grid = op.shape[0] // rpt

    d_names = [n for n in _KP_ORDER if not n.startswith("S")]
    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    ray3 = pl.BlockSpec((rpt, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rayS = pl.BlockSpec((rpt, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ray1 = pl.BlockSpec((rpt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    dkp_specs = [
        pl.BlockSpec(kp[n_].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n_ in d_names
    ]
    dkp_shapes = [jax.ShapeDtypeStruct(kp[n_].shape, jnp.float32) for n_ in d_names]

    outs = pl.pallas_call(
        _make_bwd_kernel(dtype, width, n_freq_p, n_freq_v, S, white_bkgd),
        grid=(grid,),
        in_specs=kp_specs + [ray3, ray3, ray3, rayS, rayS, tri_spec,
                             ray3, ray1, ray1, rayS],
        out_specs=dkp_specs,
        out_shape=dkp_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), op, dp, vp, zp, np_, _strict_upper_ones(S), gr, gd, ga, gw)

    dkp = {n_: g_.astype(kp[n_].dtype) for n_, g_ in zip(d_names, outs)}
    dkp["Sp"] = jnp.zeros_like(kp["Sp"])
    dkp["Sv"] = jnp.zeros_like(kp["Sv"])
    # rays/z/noise are non-differentiated leaves (see module docstring)
    return (dkp, jnp.zeros_like(o), jnp.zeros_like(d), jnp.zeros_like(v),
            jnp.zeros_like(z), jnp.zeros_like(noise))


_fused_render_op.defvjp(_fwd_rule, _bwd_rule)


def fused_render_level(
    params: Dict,
    cfg: MLPConfig,
    pe_pts: PosEncConfig,
    pe_views: PosEncConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise,
    white_bkgd: bool,
    compute_dtype=jnp.bfloat16,
):
    """One coarse/fine level, rays -> composited maps (see module docstring).

    Returns an ops.compositing.RayOutputs (depth omitted: filled with the
    same Σw·z the compositor computes, derived from weights outside)."""
    from nerf_tpu.ops.compositing import RayOutputs

    R, S = z_vals.shape
    kp = pack_params(params, cfg, pe_pts, pe_views, compute_dtype)
    if noise is None:
        noise = jnp.zeros_like(z_vals)
    rgb_map, disp, acc, w = _fused_render_op(
        kp, rays_o, rays_d, viewdirs, z_vals, noise,
        compute_dtype, cfg.width, pe_pts.num_freqs, pe_views.num_freqs,
        S, white_bkgd,
    )
    depth = jnp.sum(w * z_vals, axis=-1)
    return RayOutputs(rgb=rgb_map, disp=disp, acc=acc, weights=w, depth=depth)
