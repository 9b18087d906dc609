"""One-off: time the pieces of the train step on the real chip."""
import os, sys, time
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.factory import init_model_params
from nerf_tpu.models.nerf_mlp import MLPConfig
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings, render_rays
from nerf_tpu.train.step import init_train_state, make_train_step
from nerf_tpu.ops.fused_mlp import fused_query, pack_params

N = 4096
mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
rs = RenderSettings(n_samples=64, n_importance=128, perturb=True, white_bkgd=True, use_viewdirs=True)
model = NeRFModel(pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4), coarse=mcfg, fine=mcfg, compute_dtype="bfloat16", fused=True)
params = init_model_params(jax.random.key(0), model)
state = init_train_state(params, 5e-4, 500)
step = make_train_step(model, rs, 5e-4, 500, donate=False)

rng = np.random.default_rng(0)
rays_o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32) * 0.1)
rays_d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
near = jnp.full((N,), 2.0, jnp.float32)
far = jnp.full((N,), 6.0, jnp.float32)
target = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
key = jax.random.key(0)
viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

def bench(name, f, *a, n=20):
    out = f(*a); jax.block_until_ready(out)
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt

# 1) fused MLP fwd only, 1M points (the step's total MLP work)
pts = jnp.asarray(rng.standard_normal((N, 256, 3)).astype(np.float32))
mlp_fwd = jax.jit(lambda p, x, v: fused_query(p, mcfg, model.pe_pts, model.pe_views, x, v))
bench("mlp fwd 4096x256pts", mlp_fwd, params["coarse"], pts, viewdirs)

# 2) fused MLP fwd+bwd (vjp) on same
def mlp_loss(p, x, v):
    return jnp.sum(fused_query(p, mcfg, model.pe_pts, model.pe_views, x, v).astype(jnp.float32) ** 2)
mlp_grad = jax.jit(jax.grad(mlp_loss))
bench("mlp fwd+bwd 4096x256pts", mlp_grad, params["coarse"], pts, viewdirs)

# 3) full render fwd
rr = jax.jit(lambda p, k: render_rays(p, model, rs, rays_o, rays_d, viewdirs, near, far, key=k)["rgb_map"])
bench("render fwd", rr, params, key)

# 4) full render fwd+bwd
def rloss(p, k):
    out = render_rays(p, model, rs, rays_o, rays_d, viewdirs, near, far, key=k)
    return jnp.mean((out["rgb_map"] - target) ** 2) + jnp.mean((out["rgb0"] - target) ** 2)
rg = jax.jit(jax.grad(rloss))
bench("render fwd+bwd", rg, params, key)

# 5) full train step
bench("train step", lambda s: step(s, rays_o, rays_d, near, far, target, key)[0], state)
