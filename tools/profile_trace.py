"""One-off: per-op cost table for the train step via jax.profiler."""
import glob
import gzip
import json
import os
import time

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
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.step import init_train_state, make_train_step

N = 4096
mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
rs = RenderSettings(n_samples=64, n_importance=128, perturb=True, white_bkgd=True, use_viewdirs=True)
model = NeRFModel(pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4), coarse=mcfg, fine=mcfg, compute_dtype="bfloat16", fused=True)
params = init_model_params(jax.random.key(0), model)
state = init_train_state(params, 5e-4, 500)
step = make_train_step(model, rs, 5e-4, 500, donate=False)

rng = np.random.default_rng(0)
args = (
    jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32) * 0.1),
    jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32)),
    jnp.full((N,), 2.0, jnp.float32),
    jnp.full((N,), 6.0, jnp.float32),
    jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32)),
)
key = jax.random.key(0)

s2, aux = step(state, *args, key)
jax.block_until_ready(s2)

outdir = "/tmp/nerf_trace"
with jax.profiler.trace(outdir):
    for _ in range(5):
        s2, aux = step(s2, *args, key)
    jax.block_until_ready(s2)

# parse the trace: sum device-side op durations
files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # find TPU device pids
    from collections import defaultdict
    tot = defaultdict(float)
    for e in evs:
        name = e.get("name", "")
        dur = e.get("dur", 0)
        tot[name] += dur
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur/5/1000:9.3f} ms/step  {name[:110]}")
