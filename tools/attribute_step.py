"""Attribute train-step time: forward vs backward vs sampling machinery.

SUPERSEDED for within-step attribution by tools/trace_step.py: each
separately-jitted sub-program here pays the ~0.5 ms remote dispatch floor,
which round-3's analysis mistook for kernel time (docs/PERF.md round 4).
This tool remains useful for coarse program-level A/Bs only.

Times jitted sub-programs of the lego-recipe step (N_rand=4096, 64+128,
bf16, fused kernels) on the real chip:

  fwd          loss_fn forward only (coarse+fine+sample_pdf+sort)
  fwd_nopdf    forward with the importance stage replaced by fixed z (no
               sample_pdf, no sort) — isolates the resampler+sort cost
  fwd_coarse   coarse level only (64 samples)
  step         full fwd+bwd+Adam
  bwd          step - fwd (by subtraction)

NOTE: on the remote-TPU platform only a host value fetch fences the async
queue — every timing ends in float().
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / iters


def main():
    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings, render_rays
    from nerf_tpu.train.step import (
        draw_overrides, init_train_state, loss_fn, make_train_step,
    )

    n_rand = 4096
    mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
    rs = RenderSettings(
        n_samples=64, n_importance=128, perturb=True, white_bkgd=True,
        use_viewdirs=True,
    )
    rs_nopdf = RenderSettings(
        n_samples=192, n_importance=0, perturb=True, white_bkgd=True,
        use_viewdirs=True,
    )
    rs_coarse = RenderSettings(
        n_samples=64, n_importance=0, perturb=True, white_bkgd=True,
        use_viewdirs=True,
    )
    fused_render = "--fused-render" in sys.argv
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg, compute_dtype="bfloat16", fused=True,
        fused_render=fused_render,
    )
    params = init_model_params(jax.random.key(0), model)

    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1)
    rd = jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near = jnp.full((n_rand,), 2.0, jnp.float32)
    far = jnp.full((n_rand,), 6.0, jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32))
    key = jax.random.key(1)

    @jax.jit
    def fwd(params):
        ov = draw_overrides(key, n_rand, rs)
        out = render_rays(params, model, rs, ro, rd, vd, near, far,
                          key=key, overrides=ov)
        return out["rgb_map"].sum()

    def make_level_fwd(rs_x):
        @jax.jit
        def f(params):
            ov = draw_overrides(key, n_rand, rs_x)
            out = render_rays(params, model, rs_x, ro, rd, vd, near, far,
                              key=key, overrides=ov)
            return out["rgb_map"].sum()
        return f

    @jax.jit
    def fwdbwd(params):
        ov = draw_overrides(key, n_rand, rs)
        def lf(p):
            out = render_rays(p, model, rs, ro, rd, vd, near, far,
                              key=key, overrides=ov)
            return out["rgb_map"].sum()
        l, g = jax.value_and_grad(lf)(params)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    from nerf_tpu.train.step import make_train_step
    state = init_train_state(params, 5e-4, 500)
    step = make_train_step(model, rs, 5e-4, 500, donate=False)

    t_fwd = timeit(fwd, params)
    t_nopdf = timeit(make_level_fwd(rs_nopdf), params)
    t_coarse = timeit(make_level_fwd(rs_coarse), params)
    t_fwdbwd = timeit(fwdbwd, params)

    def run_step(s):
        st, aux = step(s, ro, rd, near, far, tgt, key)
        return aux["loss"]

    t_step = timeit(run_step, state)

    print(f"fused_render={fused_render} N_rand={n_rand}")
    print(f"fwd (full, pdf+sort):     {t_fwd*1e3:7.2f} ms")
    print(f"fwd (192 fixed, no pdf):  {t_nopdf*1e3:7.2f} ms")
    print(f"fwd (64 coarse only):     {t_coarse*1e3:7.2f} ms")
    print(f"  -> pdf+sort+coarse overhead vs fixed-192+coarse: "
          f"{(t_fwd - t_nopdf - t_coarse)*1e3:7.2f} ms")
    print(f"fwd+bwd (grad):           {t_fwdbwd*1e3:7.2f} ms")
    print(f"full step (+Adam):        {t_step*1e3:7.2f} ms")
    print(f"  -> bwd ~= {(t_fwdbwd - t_fwd)*1e3:.2f} ms, "
          f"Adam+misc ~= {(t_step - t_fwdbwd)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
