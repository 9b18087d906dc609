"""Probe: is the fwd kernel's per-layer VPU work (bias+relu) serializing
against the MXU? Times three toy trunk kernels on the real chip:

  matmul-only   8 chained [T,256]@[256,256] bf16 dots
  +bias+relu    the production layer body
  interleaved   rows split in two half-tiles, ops issued alternately so the
                scheduler can overlap half A's VPU relu with half B's matmul

If (+bias+relu − matmul-only) is large and `interleaved` claws it back,
restructure _trunk_forward accordingly (docs/PERF.md).
"""
import os, sys, time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 1536
NPTS = 4096 * 192
DEPTH = 8
W = 256

rng = np.random.default_rng(0)
x_in = jnp.asarray(rng.standard_normal((NPTS, W)).astype(np.float32)).astype(jnp.bfloat16)
Ws = [jnp.asarray(rng.standard_normal((W, W)).astype(np.float32) * 0.05).astype(jnp.bfloat16) for _ in range(DEPTH)]
bs = [jnp.asarray(rng.standard_normal((1, W)).astype(np.float32) * 0.01) for _ in range(DEPTH)]


def dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def k_matmul_only(*refs):
    (x_ref, *wrefs), out_ref = refs[:-1], refs[-1]
    h = x_ref[...]
    for i in range(DEPTH):
        h = dot(h, wrefs[i][...]).astype(jnp.bfloat16)
    out_ref[...] = h.astype(jnp.float32)


def k_bias_relu(*refs):
    (x_ref, *wbrefs), out_ref = refs[:-1], refs[-1]
    h = x_ref[...]
    for i in range(DEPTH):
        z = dot(h, wbrefs[2 * i][...]) + wbrefs[2 * i + 1][...]
        h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    out_ref[...] = h.astype(jnp.float32)


def k_interleaved(*refs):
    (x_ref, *wbrefs), out_ref = refs[:-1], refs[-1]
    half = TILE // 2
    ha = x_ref[:half, :]
    hb = x_ref[half:, :]
    for i in range(DEPTH):
        w = wbrefs[2 * i][...]
        b = wbrefs[2 * i + 1][...]
        za = dot(ha, w)
        zb = dot(hb, w)  # issued before either relu: scheduler may overlap
        ha = jnp.maximum(za + b, 0.0).astype(jnp.bfloat16)
        hb = jnp.maximum(zb + b, 0.0).astype(jnp.bfloat16)
    out_ref[...] = jnp.concatenate([ha, hb], 0).astype(jnp.float32)


def build(kernel, with_bias):
    n_in = 1 + (2 * DEPTH if with_bias else DEPTH)
    in_specs = [pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_in - 1)]
    f = pl.pallas_call(
        kernel,
        grid=(NPTS // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPTS, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    args = [x_in]
    for i in range(DEPTH):
        args.append(Ws[i])
        if with_bias:
            args.append(bs[i])
    return jax.jit(lambda *a: f(*a).ravel()[0]), args


FLOP = NPTS * DEPTH * 2 * W * W


def bench(name, kernel, with_bias, n=30):
    f, args = build(kernel, with_bias)
    v = float(f(*args))
    t0 = time.time()
    for _ in range(n):
        v = f(*args)
    float(v)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms  ({FLOP/dt/1e12:6.1f} TF/s, "
          f"{FLOP/dt/197e12*100:5.1f}% peak)", flush=True)


# ---- decomposition probes: embed front-end and head, mirroring fused_mlp ----

from nerf_tpu.ops import fused_mlp as FM

SPR = 192
RPT = TILE // SPR
x3 = jnp.asarray(rng.standard_normal((NPTS, 3)).astype(np.float32))
v3 = jnp.asarray(rng.standard_normal((NPTS // SPR, 3)).astype(np.float32))
Sp = np.zeros((3, 30), np.float32)
for f_ in range(10):
    for d_ in range(3):
        Sp[d_, f_ * 3 + d_] = 2.0 ** f_
Sp = jnp.asarray(Sp)
Sv = jnp.asarray(Sp[:, :12])
W0e = jnp.asarray(rng.standard_normal((63, W)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
W5e = jnp.asarray(rng.standard_normal((63, W)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
Wvf = jnp.asarray(rng.standard_normal((W, W // 2)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
Wve = jnp.asarray(rng.standard_normal((27, W // 2)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
Wout = jnp.asarray(rng.standard_normal((W + W // 2, 4)).astype(np.float32) * 0.05).astype(jnp.bfloat16)


def embed(x, sel, F):
    xb = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    return jnp.concatenate(
        [x.astype(jnp.bfloat16), jnp.sin(xb).astype(jnp.bfloat16),
         jnp.cos(xb).astype(jnp.bfloat16)], axis=-1)


def k_embed_trunk(x_ref, sp_ref, w0_ref, w5_ref, *rest):
    (*wbrefs, out_ref) = rest
    e = embed(x_ref[...], sp_ref[...], 10)
    h = jnp.maximum(dot(e, w0_ref[...]) + wbrefs[1][...], 0.0).astype(jnp.bfloat16)
    for i in range(1, DEPTH):
        z = dot(h, wbrefs[2 * i][...]) + wbrefs[2 * i + 1][...]
        if i == 5:
            z = z + dot(e, w5_ref[...])
        h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    out_ref[...] = h.astype(jnp.float32)


def k_full(x_ref, v_ref, sp_ref, sv_ref, w0_ref, w5_ref, wf_ref, wvf_ref,
           wve_ref, wout_ref, *rest):
    (*wbrefs, out_ref) = rest
    e = embed(x_ref[...], sp_ref[...], 10)
    h = jnp.maximum(dot(e, w0_ref[...]) + wbrefs[1][...], 0.0).astype(jnp.bfloat16)
    for i in range(1, DEPTH):
        z = dot(h, wbrefs[2 * i][...]) + wbrefs[2 * i + 1][...]
        if i == 5:
            z = z + dot(e, w5_ref[...])
        h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    # head
    feat = dot(h, wf_ref[...])
    ev = embed(v_ref[...], sv_ref[...], 4)  # [RPT, 27]
    ev_c = jnp.dot(ev, wve_ref[...], preferred_element_type=jnp.float32)
    ev_pt = jnp.broadcast_to(ev_c[:, None, :], (RPT, SPR, W // 2)).reshape(TILE, W // 2)
    hv = jnp.maximum(dot(feat.astype(jnp.bfloat16), wvf_ref[...]) + ev_pt, 0.0)
    cat = jnp.concatenate([hv.astype(jnp.bfloat16), h], axis=-1)
    out4 = dot(cat, wout_ref[...])
    out_ref[...] = jnp.pad(out4, ((0, 0), (0, W - 4)))


def bench_k(name, kernel, ins, n=30, flop=FLOP):
    in_specs = []
    for a in ins:
        if a.shape[0] == NPTS:
            in_specs.append(pl.BlockSpec((TILE, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
        elif a.shape[0] == NPTS // SPR:
            in_specs.append(pl.BlockSpec((RPT, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    f = pl.pallas_call(
        kernel,
        grid=(NPTS // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPTS, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    g = jax.jit(lambda *a: f(*a).ravel()[0])
    v = float(g(*ins))
    t0 = time.time()
    for _ in range(n):
        v = g(*ins)
    float(v)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms  ({flop/dt/1e12:6.1f} TF/s-equiv)", flush=True)


bench("matmul-only ", k_matmul_only, False)
bench("+bias+relu  ", k_bias_relu, True)
bench("interleaved ", k_interleaved, True)

wb = []
for i in range(DEPTH):
    wb.append(Ws[i])
    wb.append(bs[i])
def k_embed_trunk_interleaved(x_ref, sp_ref, w0_ref, w5_ref, *rest):
    """Half-tile software pipeline: B's trig (VPU) issued between A's trunk
    matmuls (MXU) so the scheduler can overlap them."""
    (*wbrefs, out_ref) = rest
    half = TILE // 2
    xa = x_ref[:half, :]
    xb_ = x_ref[half:, :]
    ea = embed(xa, sp_ref[...], 10)
    ha = jnp.maximum(dot(ea, w0_ref[...]) + wbrefs[1][...], 0.0).astype(jnp.bfloat16)
    eb = embed(xb_, sp_ref[...], 10)  # VPU work, overlappable with ha's MXU
    hb = jnp.maximum(dot(eb, w0_ref[...]) + wbrefs[1][...], 0.0).astype(jnp.bfloat16)
    for i in range(1, DEPTH):
        w = wbrefs[2 * i][...]
        b = wbrefs[2 * i + 1][...]
        za = dot(ha, w) + b
        zb = dot(hb, w) + b
        if i == 5:
            za = za + dot(ea, w5_ref[...])
            zb = zb + dot(eb, w5_ref[...])
        ha = jnp.maximum(za, 0.0).astype(jnp.bfloat16)
        hb = jnp.maximum(zb, 0.0).astype(jnp.bfloat16)
    out_ref[...] = jnp.concatenate([ha, hb], 0).astype(jnp.float32)


def embed_notrig(x, sel, F):
    xb = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    return jnp.concatenate(
        [x.astype(jnp.bfloat16), (xb * 0.5).astype(jnp.bfloat16),
         (xb * 0.25).astype(jnp.bfloat16)], axis=-1)


def poly_sincos(xb):
    """sin/cos via shared range reduction + minimax polys (deg 9/8)."""
    y = xb * 0.15915494309189535
    r = (y - jnp.round(y)) * 6.283185307179586  # [-pi, pi]
    r2 = r * r
    s = r * (0.9999845940079196 + r2 * (-0.16663259474612063 + r2 * (
        0.008312388725549872 + r2 * (-0.00019316277202555934
                                     + r2 * 2.1732608711915083e-06))))
    c = 0.9999994437337446 + r2 * (-0.4999955824558693 + r2 * (
        0.04166103368789301 + r2 * (-0.0013862750536381093 + r2 * (
            2.4253237753182864e-05 + r2 * -2.2194166856720897e-07))))
    return s, c


def embed_poly(x, sel, F):
    xb = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    s, c = poly_sincos(xb)
    return jnp.concatenate(
        [x.astype(jnp.bfloat16), s.astype(jnp.bfloat16),
         c.astype(jnp.bfloat16)], axis=-1)


def mk_embed_trunk(embed_fn):
    def k(x_ref, sp_ref, w0_ref, w5_ref, *rest):
        (*wbrefs, out_ref) = rest
        e = embed_fn(x_ref[...], sp_ref[...], 10)
        h = jnp.maximum(dot(e, w0_ref[...]) + wbrefs[1][...], 0.0).astype(jnp.bfloat16)
        for i in range(1, DEPTH):
            z = dot(h, wbrefs[2 * i][...]) + wbrefs[2 * i + 1][...]
            if i == 5:
                z = z + dot(e, w5_ref[...])
            h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        out_ref[...] = h.astype(jnp.float32)
    return k


bench_k("embed+trunk ", k_embed_trunk, [x3, Sp, W0e, W5e] + wb)
bench_k("embed+trunk IL", k_embed_trunk_interleaved, [x3, Sp, W0e, W5e] + wb)
bench_k("embed-notrig", mk_embed_trunk(embed_notrig), [x3, Sp, W0e, W5e] + wb)
bench_k("embed-poly  ", mk_embed_trunk(embed_poly), [x3, Sp, W0e, W5e] + wb)
bench_k("full fwd    ", k_full,
        [x3, v3, Sp, Sv, W0e, W5e, Ws[0], Wvf, Wve, Wout] + wb)
