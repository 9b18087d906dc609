"""Ad-hoc TPU step-time bench for kernel-path variants.

Runs the lego-recipe train step (N_rand=4096, 64+128 samples, bf16) with a
chosen kernel path and prints ms/step + rays/s. Tile sizes come from the
NERF_TPU_FWD_TILE / NERF_TPU_BWD_TILE env vars (read at import by
ops/fused_mlp.py), so a sweep runs this script once per configuration:

    python tools/bench_variants.py [--fused-render | --unfused] [--nrand N]
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


def main():
    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import init_train_state, make_train_step

    n_rand = 4096
    if "--nrand" in sys.argv:
        idx = sys.argv.index("--nrand")
        if idx + 1 >= len(sys.argv):
            raise SystemExit("--nrand requires a value, e.g. --nrand 8192")
        n_rand = int(sys.argv[idx + 1])
    fused = "--unfused" not in sys.argv
    fused_render = "--fused-render" in sys.argv

    def _intflag(name, default):
        if name in sys.argv:
            idx = sys.argv.index(name)
            if idx + 1 >= len(sys.argv):
                raise SystemExit(f"{name} requires a value, e.g. {name} 64")
            return int(sys.argv[idx + 1])
        return default

    n_samples = _intflag("--samples", 64)
    n_importance = _intflag("--importance", 128)

    mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
    rs = RenderSettings(
        n_samples=n_samples, n_importance=n_importance, perturb=True,
        white_bkgd=True, use_viewdirs=True,
    )
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg, compute_dtype="bfloat16",
        fused=fused, fused_render=fused_render,
    )
    params = init_model_params(jax.random.key(0), model)
    state = init_train_state(params, 5e-4, 500)
    step = make_train_step(model, rs, 5e-4, 500, donate=True)

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32)),
        jnp.full((n_rand,), 2.0, jnp.float32),
        jnp.full((n_rand,), 6.0, jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)),
    )
    key = jax.random.key(0)

    t0 = time.time()
    state, aux = step(state, *batch, key)
    jax.block_until_ready(aux["loss"])
    compile_s = time.time() - t0

    # settle the dispatch queue before timing. NOTE: on the remote-TPU
    # (axon) platform block_until_ready returns before the async queue
    # drains — only a host VALUE fetch truly syncs, so float() is the fence.
    for _ in range(20):
        state, aux = step(state, *batch, key)
    float(aux["loss"])

    n_iters = 100
    t0 = time.time()
    for _ in range(n_iters):
        state, aux = step(state, *batch, key)
    float(aux["loss"])
    dt = (time.time() - t0) / n_iters

    tag = (
        "fused_render" if fused_render else ("fused_mlp" if fused else "unfused")
    )
    # report the values the kernel module actually resolved (defaults change)
    from nerf_tpu.ops.fused_mlp import BWD_TILE as bt, FWD_TILE as ft
    print(
        f"{tag} N_rand={n_rand} samples={n_samples}+{n_importance} "
        f"FWD_TILE={ft} BWD_TILE={bt}: "
        f"{dt*1e3:.1f} ms/step, {n_rand/dt:,.0f} rays/s "
        f"(compile {compile_s:.1f}s, loss={float(aux['loss']):.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
