"""Sweep fused-kernel tile sizes on the real chip.

Times the fused posenc+MLP kernel (fine-pass shape: 4096 rays x 192 samples)
forward and forward+backward across FWD_TILE / BWD_TILE values. Each timed
call gets a DISTINCT input array (cycled from a small pool) so repeat-call
elision by the runtime can't fake a win.
"""
import os, sys, time
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.factory import init_model_params
from nerf_tpu.models.nerf_mlp import MLPConfig
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.ops import fused_mlp

mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
model = NeRFModel(pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4), coarse=mcfg, fine=mcfg, compute_dtype="bfloat16", fused=True)
params = init_model_params(jax.random.key(0), model)["coarse"]

NPTS = 4096 * 192  # the fine pass size
rng = np.random.default_rng(0)
NIN = 8
pts_list = [jnp.asarray(rng.standard_normal((4096, 192, 3)).astype(np.float32)) for _ in range(NIN)]
vd = rng.standard_normal((4096, 3)).astype(np.float32)
vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
vd = jnp.asarray(vd)
g = jnp.asarray(rng.standard_normal((4096, 192, 4)).astype(np.float32))

fwd_flop = NPTS * 2 * (63*256 + 6*256*256 + (256+63)*256 + 256*257 + (256+27)*128 + 128*3)

def _fence(out):
    # axon platform: block_until_ready returns before the async queue drains;
    # only a host VALUE fetch truly syncs (see tools/bench_variants.py)
    return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def run(name, f, n=24):
    try:
        outs = [f(params, pts_list[i % NIN], vd) for i in range(2)]
        _fence(outs[-1])
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
        return
    t0 = time.time()
    outs = [f(params, pts_list[i % NIN], vd) for i in range(n)]
    _fence(outs[-1])
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:7.2f} ms  ({fwd_flop/dt/1e12:6.1f} eff-TFLOP/s fwd-equiv)", flush=True)

def mk_fwd():
    def f(p, x, v):
        out = fused_mlp.fused_query(p, mcfg, model.pe_pts, model.pe_views, x, v)
        return jnp.sum(out.astype(jnp.float32))
    return jax.jit(f)

def mk_bwd():
    def loss(p, x, v):
        out = fused_mlp.fused_query(p, mcfg, model.pe_pts, model.pe_views, x, v)
        return jnp.sum(out.astype(jnp.float32) * g)
    return jax.jit(jax.grad(loss))

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "fwd"):
    for tile in (1024, 2048, 4096, 8192):
        fused_mlp.FWD_TILE = tile
        run(f"fwd tile={tile}", mk_fwd())
fused_mlp.FWD_TILE = 1024
if which in ("all", "bwd"):
    for tile in (512, 1024, 2048):
        fused_mlp.BWD_TILE = tile
        run(f"fwd+bwd bwdtile={tile}", mk_bwd())
