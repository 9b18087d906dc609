"""Probe the non-kernel 'glue' costs of the train step on the real chip.

Times standalone jitted programs for each piece of jnp glue around the fused
MLP kernels (compositing fwd/bwd, pts-gen, sampling, Adam, loss), so the
docs/PERF.md attribution can say exactly where the ~2.5 ms of glue goes and
which pieces deserve a Pallas (or matmul-rewrite) treatment.

NOTE: remote-TPU timing convention — every timing ends in a host value fetch
(float(...)), the only reliable fence on the axon platform.
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


def timeit(fn, *args, iters=100):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / iters


def main():
    from nerf_tpu.ops.compositing import raw2outputs
    from nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.train.step import init_train_state, make_optimizer

    R = 4096
    rng = np.random.default_rng(0)
    rd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    ro = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32) * 0.1)

    for S in (64, 192):
        raw = jnp.asarray(rng.standard_normal((R, S, 4)).astype(np.float32))
        z = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, (R, S)).astype(np.float32)), axis=-1
        )

        @jax.jit
        def comp_fwd(raw, z, rd):
            o = raw2outputs(raw, z, rd, white_bkgd=True)
            return o.rgb.sum() + o.disp.sum() + o.acc.sum()

        @jax.jit
        def comp_fwdbwd(raw, z, rd):
            def f(raw):
                o = raw2outputs(raw, z, rd, white_bkgd=True)
                return o.rgb.sum()
            l, g = jax.value_and_grad(f)(raw)
            return l + g.sum()

        @jax.jit
        def ptsgen(ro, rd, z):
            pts = ro[..., None, :] + rd[..., None, :] * z[..., :, None]
            return pts.reshape(-1, 3).sum()

        t_f = timeit(comp_fwd, raw, z, rd)
        t_fb = timeit(comp_fwdbwd, raw, z, rd)
        t_p = timeit(ptsgen, ro, rd, z)
        print(f"S={S}: comp fwd {t_f*1e3:6.3f} ms  fwd+bwd {t_fb*1e3:6.3f} ms "
              f"  ptsgen {t_p*1e3:6.3f} ms")

    # sampling machinery at the real shape
    z64 = jnp.sort(jnp.asarray(rng.uniform(2, 6, (R, 64)).astype(np.float32)), -1)
    w = jnp.asarray(rng.uniform(0, 1, (R, 62)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 1, (R, 128)).astype(np.float32))

    @jax.jit
    def pdf_sort(z, w, u):
        mid = 0.5 * (z[..., 1:] + z[..., :-1])
        zs = sample_pdf(mid, w, 128, det=False, u=u)
        za = jnp.sort(jnp.concatenate([z, zs], -1), -1)
        return za.sum()

    print(f"pdf+sort: {timeit(pdf_sort, z64, w, u)*1e3:6.3f} ms")

    # Adam at flagship param count (coarse+fine 8x256)
    mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
    model = NeRFModel(pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
                     coarse=mcfg, fine=mcfg, compute_dtype="bfloat16", fused=True)
    params = init_model_params(jax.random.key(0), model)
    state = init_train_state(params, 5e-4, 500)
    tx = make_optimizer(5e-4, 500)
    grads = jax.tree.map(lambda x: x * 1e-3, params)

    @jax.jit
    def adam(opt_state, params, grads):
        import optax
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params

    t_a = timeit(adam, state.opt_state, params, grads)
    print(f"adam:     {t_a*1e3:6.3f} ms")

    # loss epilogue (mse + psnr on [R,3])
    pred = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))

    @jax.jit
    def mse(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    print(f"mse:      {timeit(mse, pred, tgt)*1e3:6.3f} ms")

    # draw_overrides (pre-drawn RNG streams) at flagship shape
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import draw_overrides
    rs = RenderSettings(n_samples=64, n_importance=128, perturb=True,
                       white_bkgd=True, use_viewdirs=True)

    @jax.jit
    def draws(key):
        ov = draw_overrides(key, R, rs)
        return sum(v.sum() for v in ov.values())

    print(f"draws:    {timeit(draws, jax.random.key(0))*1e3:6.3f} ms")

    # empty-program dispatch floor (launch overhead reference)
    @jax.jit
    def tiny(x):
        return x + 1.0

    print(f"tiny:     {timeit(tiny, jnp.zeros((8, 128)))*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
