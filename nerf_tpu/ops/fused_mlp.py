"""Fused Pallas kernel: positional encoding + full NeRF MLP, fwd + bwd.

Why: unfused, every 256-wide activation round-trips HBM between layers
(~64 FLOP/byte at the MXU's ~240 FLOP/byte break-even → HBM-bound at <30%
MFU). This kernel reads 6 floats/point (x, d), keeps ALL activations and the
~0.6 MB of weights in VMEM, and writes 4 floats/point — compute-bound.

Design notes (TPU-first, not a translation):
- The reference's embedding-concat (run_nerf_helpers.py:44-45) and trunk
  skip-concat (run_nerf_helpers.py:102-103) are eliminated by a host-side
  reparametrization: W0 [63,W] splits into (W0x[3,W], W0s[30,W], W0c[30,W])
  row groups matched to the (identity, sin, cos) parts, and the skip layer
  W5 [63+W, W] splits into an input part and a hidden part. Then
      h0 = relu(x·W0x + sin(xb)·W0s + cos(xb)·W0c + b0),
      h5 = relu(h4·W5h + x·W5x + sin(xb)·W5s + cos(xb)·W5c + b5),
  with xb = x·S, S[d, f*3+d] = 2^f — a [3,30] selector matmul instead of any
  lane shuffling. Same trick for the view head. The mapping is exact (a
  permutation/partition of rows), so numerics match the reference wiring.
- Backward recomputes the forward per tile (remat) — residuals are just the
  6 input floats — and accumulates weight grads in VMEM f32 scratch across
  the (sequential) grid, flushing on the last tile.
- Matmuls run in the caller's compute dtype (bf16 on TPU) with f32
  accumulation (preferred_element_type), f32 sin/cos.

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

FWD_TILE = 1024
BWD_TILE = 512
# bwd holds 8 trunk activations + weight-grad accumulators + weights (all
# double-buffered by Mosaic) — beyond the default 16 MB scoped-vmem limit,
# so raise it explicitly (v5e has headroom above the default).
_FWD_VMEM_BYTES = 48 * 1024 * 1024
_BWD_VMEM_BYTES = 96 * 1024 * 1024


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() != "tpu"

_DEPTH = 8
_SKIP = 4  # input re-concatenated after trunk layer index 4 -> layer 5 input


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


def _split_emb_rows(W: jnp.ndarray, num_freqs: int):
    """Split the first 3+6F rows of W (embedding-ordered: x, sin f0, cos f0,
    sin f1, ...) into (Wx[3], Ws[3F], Wc[3F]) with (f,d) row order f*3+d."""
    Wx = W[:3]
    rest = W[3 : 3 + 6 * num_freqs].reshape(num_freqs, 2, 3, W.shape[-1])
    Ws = rest[:, 0].reshape(3 * num_freqs, W.shape[-1])
    Wc = rest[:, 1].reshape(3 * num_freqs, W.shape[-1])
    return Wx, Ws, Wc


def pack_params(params: Dict, cfg: MLPConfig, pe_pts: PosEncConfig,
                pe_views: PosEncConfig, dtype) -> Dict[str, jnp.ndarray]:
    """Canonical pytree -> kernel layout. All ops are differentiable
    (slice/reshape/cast), so packing participates in autodiff and only the
    pallas op itself needs the custom VJP."""
    Fp, Fv = pe_pts.num_freqs, pe_views.num_freqs
    t = params["trunk"]
    kp = {}
    kp["W0x"], kp["W0s"], kp["W0c"] = (
        w.astype(dtype) for w in _split_emb_rows(t[0]["w"], Fp)
    )
    kp["b0"] = t[0]["b"].astype(jnp.float32)[None, :]
    for i in range(1, _DEPTH):
        w = t[i]["w"]
        if i == _SKIP + 1:
            # skip layer input order: cat([x_emb, h]) (run_nerf_helpers.py:103)
            kp["W5x"], kp["W5s"], kp["W5c"] = (
                u.astype(dtype) for u in _split_emb_rows(w[: 3 + 6 * Fp], Fp)
            )
            kp[f"W{i}"] = w[3 + 6 * Fp :].astype(dtype)
        else:
            kp[f"W{i}"] = w.astype(dtype)
        kp[f"b{i}"] = t[i]["b"].astype(jnp.float32)[None, :]
    kp["Wa"] = params["alpha"]["w"].astype(dtype)
    kp["ba"] = params["alpha"]["b"].astype(jnp.float32)[None, :]
    kp["Wf"] = params["feature"]["w"].astype(dtype)
    kp["bf"] = params["feature"]["b"].astype(jnp.float32)[None, :]
    wv = params["views"]["w"]  # [W + 3+6Fv, W/2], input order cat([feature, v_emb])
    kp["Wvf"] = wv[: cfg.width].astype(dtype)
    kp["Wvx"], kp["Wvs"], kp["Wvc"] = (
        u.astype(dtype) for u in _split_emb_rows(wv[cfg.width :], Fv)
    )
    kp["bv"] = params["views"]["b"].astype(jnp.float32)[None, :]
    kp["Wr"] = params["rgb"]["w"].astype(dtype)
    kp["br"] = params["rgb"]["b"].astype(jnp.float32)[None, :]
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
    "W0x", "W0s", "W0c", "b0",
    "W1", "b1", "W2", "b2", "W3", "b3", "W4", "b4",
    "W5", "W5x", "W5s", "W5c", "b5",
    "W6", "b6", "W7", "b7",
    "Wa", "ba", "Wf", "bf",
    "Wvf", "Wvx", "Wvs", "Wvc", "bv",
    "Wr", "br", "Sp", "Sv",
]


def _emb_parts(x, v, kp, dtype):
    """sin/cos features for points and dirs (f32 trig, cast to compute dtype)."""
    xb = _dot(x, kp["Sp"])
    vb = _dot(v, kp["Sv"])
    return (
        jnp.sin(xb).astype(dtype), jnp.cos(xb).astype(dtype),
        jnp.sin(vb).astype(dtype), jnp.cos(vb).astype(dtype), xb, vb,
    )


def _trunk_forward(xc, sx, cx, kp, dtype, keep_acts=False):
    acts = []
    h = jax.nn.relu(
        _dot(xc, kp["W0x"]) + _dot(sx, kp["W0s"]) + _dot(cx, kp["W0c"]) + kp["b0"]
    )
    for i in range(1, _DEPTH):
        if keep_acts:
            acts.append(h)
        hin = h.astype(dtype)
        z = _dot(hin, kp[f"W{i}"]) + kp[f"b{i}"]
        if i == _SKIP + 1:
            z = z + _dot(xc, kp["W5x"]) + _dot(sx, kp["W5s"]) + _dot(cx, kp["W5c"])
        h = jax.nn.relu(z)
    if keep_acts:
        acts.append(h)
    return h, acts


def _head_forward(h, vc, sv, cv, kp, dtype):
    hc = h.astype(dtype)
    alpha = _dot(hc, kp["Wa"]) + kp["ba"]
    feat = _dot(hc, kp["Wf"]) + kp["bf"]
    hv = jax.nn.relu(
        _dot(feat.astype(dtype), kp["Wvf"])
        + _dot(vc, kp["Wvx"]) + _dot(sv, kp["Wvs"]) + _dot(cv, kp["Wvc"])
        + kp["bv"]
    )
    rgb = _dot(hv.astype(dtype), kp["Wr"]) + kp["br"]
    return alpha, feat, hv, rgb


def _fwd_kernel(dtype, *refs):
    *kp_refs, x_ref, v_ref, out_ref = refs
    kp = {name: r[...] for name, r in zip(_KP_ORDER, kp_refs)}
    x = x_ref[...]
    v = v_ref[...]
    sx, cx, sv, cv, _, _ = _emb_parts(x, v, kp, dtype)
    xc = x.astype(dtype)
    vc = v.astype(dtype)
    h, _ = _trunk_forward(xc, sx, cx, kp, dtype)
    alpha, _, _, rgb = _head_forward(h, vc, sv, cv, kp, dtype)
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = alpha


def _make_bwd_kernel(dtype):
    n_kp = len(_KP_ORDER)

    def kernel(*refs):
        kp_refs = refs[:n_kp]
        x_ref, v_ref, g_ref = refs[n_kp : n_kp + 3]
        out_refs = refs[n_kp + 3 :]
        # outputs: one grad per packed param (minus the selectors) + dx + dv
        d_names = [n for n in _KP_ORDER if not n.startswith("S")]
        douts = {f"d{n}": r for n, r in zip(d_names, out_refs[: len(d_names)])}
        dx_ref, dv_ref = out_refs[len(d_names)], out_refs[len(d_names) + 1]

        kp = {name: r[...] for name, r in zip(_KP_ORDER, kp_refs)}
        x = x_ref[...]
        v = v_ref[...]
        g = g_ref[...]

        sx, cx, sv, cv, xb, vb = _emb_parts(x, v, kp, dtype)
        xc = x.astype(dtype)
        vc = v.astype(dtype)

        # --- recompute forward, keeping activations ---
        h7, acts = _trunk_forward(xc, sx, cx, kp, dtype, keep_acts=True)
        # acts = [h0..h6], h7; index: acts[i] is output of trunk layer i
        acts = acts[:-1]
        alpha, feat, hv, rgb = _head_forward(h7, vc, sv, cv, kp, dtype)

        pid = pl.program_id(0)
        is_first = pid == 0
        is_last = pid == pl.num_programs(0) - 1

        accs = {}

        def acc(name, val):
            accs[name] = val

        # --- head backward ---
        g_rgb = g[:, 0:3].astype(jnp.float32)
        g_a = g[:, 3:4].astype(jnp.float32)

        acc("dWr", _dot_at(hv.astype(dtype), g_rgb.astype(dtype)))
        acc("dbr", jnp.sum(g_rgb, axis=0, keepdims=True))
        d_hv = _dot_t(g_rgb.astype(dtype), kp["Wr"]) * (hv > 0)
        d_hv_c = d_hv.astype(dtype)

        acc("dWvf", _dot_at(feat.astype(dtype), d_hv_c))
        acc("dWvx", _dot_at(vc, d_hv_c))
        acc("dWvs", _dot_at(sv, d_hv_c))
        acc("dWvc", _dot_at(cv, d_hv_c))
        acc("dbv", jnp.sum(d_hv, axis=0, keepdims=True))

        d_feat = _dot_t(d_hv_c, kp["Wvf"])
        # dv: direct + through sin/cos of vb
        d_vb = _dot_t(d_hv_c, kp["Wvs"]) * jnp.cos(vb) - _dot_t(
            d_hv_c, kp["Wvc"]
        ) * jnp.sin(vb)
        dv = _dot_t(d_hv_c, kp["Wvx"]).astype(jnp.float32) + _dot_t(
            d_vb.astype(jnp.float32), kp["Sv"]
        )

        acc("dWa", _dot_at(h7.astype(dtype), g_a.astype(dtype)))
        acc("dba", jnp.sum(g_a, axis=0, keepdims=True))
        acc("dWf", _dot_at(h7.astype(dtype), d_feat.astype(dtype)))
        acc("dbf", jnp.sum(d_feat, axis=0, keepdims=True))

        d_h = (
            _dot_t(d_feat.astype(dtype), kp["Wf"])
            + _dot_t(g_a.astype(dtype), kp["Wa"])
        ) * (h7 > 0)

        # --- trunk backward ---
        dxb_acc = None
        dx_direct = None
        for i in range(_DEPTH - 1, 0, -1):
            d_c = d_h.astype(dtype)
            a_prev = acts[i - 1]
            acc(f"dW{i}", _dot_at(a_prev.astype(dtype), d_c))
            acc(f"db{i}", jnp.sum(d_h, axis=0, keepdims=True))
            if i == _SKIP + 1:
                acc("dW5x", _dot_at(xc, d_c))
                acc("dW5s", _dot_at(sx, d_c))
                acc("dW5c", _dot_at(cx, d_c))
                dxb_acc = _dot_t(d_c, kp["W5s"]) * jnp.cos(xb) - _dot_t(
                    d_c, kp["W5c"]
                ) * jnp.sin(xb)
                dx_direct = _dot_t(d_c, kp["W5x"]).astype(jnp.float32)
            d_h = _dot_t(d_c, kp[f"W{i}"]) * (a_prev > 0)

        d0 = d_h.astype(dtype)
        acc("dW0x", _dot_at(xc, d0))
        acc("dW0s", _dot_at(sx, d0))
        acc("dW0c", _dot_at(cx, d0))
        acc("db0", jnp.sum(d_h, axis=0, keepdims=True))
        dxb0 = _dot_t(d0, kp["W0s"]) * jnp.cos(xb) - _dot_t(d0, kp["W0c"]) * jnp.sin(xb)
        dxb_total = dxb0 + (dxb_acc if dxb_acc is not None else 0.0)
        dx = (
            _dot_t(d0, kp["W0x"]).astype(jnp.float32)
            + (dx_direct if dx_direct is not None else 0.0)
            + _dot_t(dxb_total.astype(jnp.float32), kp["Sp"])
        )

        dx_ref[...] = dx
        dv_ref[...] = dv

        # --- accumulate weight grads across the sequential grid ---
        for name, ref in douts.items():
            val = accs[name].astype(jnp.float32)

            @pl.when(is_first)
            def _(ref=ref, val=val):
                ref[...] = val

            @pl.when(jnp.logical_not(is_first))
            def _(ref=ref, val=val):
                ref[...] = ref[...] + val

    return kernel


def _pad_to(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_op(kp: Dict, x: jnp.ndarray, v: jnp.ndarray, dtype) -> jnp.ndarray:
    return _fused_fwd_impl(kp, x, v, dtype)


def _kp_list(kp):
    return [kp[n] for n in _KP_ORDER]


def _fused_fwd_impl(kp, x, v, dtype):
    n = x.shape[0]
    xp = _pad_to(x, FWD_TILE)
    vp = _pad_to(v, FWD_TILE)
    grid = xp.shape[0] // FWD_TILE

    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    out = pl.pallas_call(
        partial(_fwd_kernel, dtype),
        grid=(grid,),
        in_specs=kp_specs
        + [
            pl.BlockSpec((FWD_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FWD_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FWD_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), xp, vp)
    return out[:n]


def _fused_fwd_rule(kp, x, v, dtype):
    return _fused_fwd_impl(kp, x, v, dtype), (kp, x, v)


def _fused_bwd_rule(dtype, res, g):
    kp, x, v = res
    n = x.shape[0]
    xp = _pad_to(x, BWD_TILE)
    vp = _pad_to(v, BWD_TILE)
    gp = _pad_to(g, BWD_TILE)  # zero cotangent in padding -> no grad pollution
    grid = xp.shape[0] // BWD_TILE

    d_names = [n_ for n_ in _KP_ORDER if not n_.startswith("S")]
    kp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _KP_ORDER]
    tile_spec3 = pl.BlockSpec((BWD_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tile_spec4 = pl.BlockSpec((BWD_TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)

    # weight-grad outputs live at block (0,0) for every grid step (accumulated)
    dkp_specs = [
        pl.BlockSpec(kp[n_].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n_ in d_names
    ]
    dkp_shapes = [jax.ShapeDtypeStruct(kp[n_].shape, jnp.float32) for n_ in d_names]

    outs = pl.pallas_call(
        _make_bwd_kernel(dtype),
        grid=(grid,),
        in_specs=kp_specs + [tile_spec3, tile_spec3, tile_spec4],
        out_specs=dkp_specs
        + [tile_spec3, tile_spec3],
        out_shape=dkp_shapes
        + [
            jax.ShapeDtypeStruct((xp.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((xp.shape[0], 3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_BYTES),
        interpret=_interpret(),
    )(*_kp_list(kp), xp, vp, gp)

    dkp = {n_: g_.astype(kp[n_].dtype) for n_, g_ in zip(d_names, outs[: len(d_names)])}
    dkp["Sp"] = jnp.zeros_like(kp["Sp"])
    dkp["Sv"] = jnp.zeros_like(kp["Sv"])
    dx = outs[len(d_names)][:n]
    dv = outs[len(d_names) + 1][:n]
    return dkp, dx, dv


_fused_op.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_query(
    params: Dict,
    cfg: MLPConfig,
    pe_pts: PosEncConfig,
    pe_views: PosEncConfig,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Drop-in replacement for the jnp query path: pts [R,S,3], viewdirs [R,3]
    -> raw [R,S,4]."""
    R, S, _ = pts.shape
    kp = pack_params(params, cfg, pe_pts, pe_views, compute_dtype)
    x = pts.reshape(R * S, 3)
    v = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(R * S, 3)
    out = _fused_op(kp, x, v, compute_dtype)
    return out.reshape(R, S, 4)
