"""Trace-driven step attribution: the per-op device-time ledger.

Captures a jax.profiler trace of N train steps on the real chip and prints
each HLO op's device time, grouped and itemized. This supersedes the
subtraction-based tools/attribute_step.py for WITHIN-step attribution: on
the remote-TPU platform every separately-jitted sub-program pays a ~0.5 ms
dispatch floor, which round-3's attribution mistook for kernel time — the
trace showed the true split (docs/PERF.md round 4: kernels 31.8 of 40.2 ms,
the rest layout glue).

Usage: python tools/trace_step.py [--n_rand 4096] [--steps 5]
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def capture(n_rand=4096, steps=5):
    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import init_train_state, make_train_step

    mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
    rs = RenderSettings(
        n_samples=64, n_importance=128, perturb=True, white_bkgd=True,
        use_viewdirs=True,
    )
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4), coarse=mcfg,
        fine=mcfg, compute_dtype="bfloat16", fused=True,
    )
    params = init_model_params(jax.random.key(0), model)
    state = init_train_state(params, 5e-4, 500)
    step = make_train_step(model, rs, 5e-4, 500, donate=False)
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32)),
        jnp.full((n_rand,), 2.0, jnp.float32),
        jnp.full((n_rand,), 6.0, jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)),
    )
    key = jax.random.key(0)
    st, aux = step(state, *batch, key)
    float(aux["loss"])
    tracedir = tempfile.mkdtemp(prefix="nerf_trace_")
    with jax.profiler.trace(tracedir):
        for _ in range(steps):
            st, aux = step(state, *batch, key)
        float(aux["loss"])
    return tracedir, steps


def report(tracedir, steps):
    path = glob.glob(os.path.join(tracedir, "plugins/profile/*/*.trace.json.gz"))[0]
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1

    total = 0.0
    groups = collections.Counter()
    for name, us in agg.items():
        if name.strip().isdigit():
            continue
        if name.startswith("jit_"):
            total = us / steps / 1000
            continue
        groups[name.split(".")[0]] += us
    print(f"STEP TOTAL (device): {total:.2f} ms")
    print("\nby opcode group:")
    shown = 0.0
    for op, us in groups.most_common(20):
        print(f"  {us/steps/1000:8.3f} ms/step  {op}")
        shown += us
    print("\ntop individual ops:")
    for name, us in agg.most_common(60):
        if name.strip().isdigit() or name.startswith("jit_"):
            continue
        if us / steps / 1000 < 0.05:
            break
        print(f"  {us/steps/1000:8.3f} ms/step  x{cnt[name]/steps:4.1f}  {name[:90]}")


def main():
    n_rand, steps = 4096, 5
    for a in sys.argv[1:]:
        if a.startswith("--n_rand="):
            n_rand = int(a.split("=")[1])
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
    tracedir, steps = capture(n_rand, steps)
    report(tracedir, steps)


if __name__ == "__main__":
    main()
