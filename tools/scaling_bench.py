"""Scaling-efficiency harness: aggregate train throughput over mesh sizes.

Runs the DP sharded train step at 1/2/4/8 devices (weak scaling: per-device
batch fixed, global batch grows with the mesh) and reports aggregate rays/s
plus an analytic compute/communication roofline for the gradient all-reduce.

On real multi-chip hardware the measured numbers ARE the scaling curve. On
this single-chip/CPU environment the devices are virtual (they timeshare one
host), so wall-clock "efficiency" is not meaningful — what the harness
proves there is that the sharded program runs at every mesh size, and the
roofline predicts the hardware efficiency: the psum moves ~4.8 MB of
gradients per step over ICI (~4e-5 s at 45 GB/s/link bidirectional ring)
against a ~14 ms compute step, i.e. predicted DP efficiency >99% even
before XLA overlaps the reduce with the backward pass.

Usage: python tools/scaling_bench.py [--devices 1,2,4,8] [--rand-per-dev 512]
Writes one JSON line per mesh size; a summary JSON at the end.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run_one(n_dev: int, rand_per_dev: int, steps: int) -> dict:
    """Measure one mesh size in a subprocess (device count is fixed at
    backend init, so each size needs a fresh process)."""
    child = subprocess.run(
        [sys.executable, __file__, "--child", str(n_dev), str(rand_per_dev),
         str(steps)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    if child.returncode != 0:
        raise RuntimeError(f"n_dev={n_dev} failed:\n{child.stderr[-2000:]}")
    return json.loads(child.stdout.strip().splitlines()[-1])


def child_main(n_dev: int, rand_per_dev: int, steps: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.parallel.mesh import (
        make_mesh, make_sharded_train_step, place_state, shard_batch,
    )
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import init_train_state, make_train_step

    mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg, compute_dtype="float32",
    )
    rs = RenderSettings(
        n_samples=16, n_importance=16, perturb=True, use_viewdirs=True,
        white_bkgd=True,
    )
    n_rand = rand_per_dev * n_dev
    params = init_model_params(jax.random.key(0), model)
    state = init_train_state(params, 5e-4, 250)

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32)),
        jnp.full((n_rand,), 2.0, jnp.float32),
        jnp.full((n_rand,), 6.0, jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)),
    )
    if n_dev == 1:
        step = make_train_step(model, rs, 5e-4, 250, donate=False)
    else:
        mesh = make_mesh(n_data=n_dev)
        state = place_state(mesh, state)
        step = make_sharded_train_step(mesh, model, rs, 5e-4, 250, donate=False)(state)
        batch = shard_batch(mesh, *batch)

    key = jax.random.key(0)
    for _ in range(3):  # compile + warmup
        state, aux = step(state, *batch, key)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = step(state, *batch, key)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(json.dumps({
        "n_devices": n_dev,
        "global_n_rand": n_rand,
        "steps_per_sec": steps / dt,
        "agg_rays_per_sec": n_rand * steps / dt,
        "psum_bytes_per_step": 4 * n_params,
        "loss": float(aux["loss"]),
    }))


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child_main(int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3]))
        return
    devices = [1, 2, 4, 8]
    rand_per_dev, steps = 512, 10
    for a in sys.argv[1:]:
        if a.startswith("--devices="):
            devices = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--rand-per-dev="):
            rand_per_dev = int(a.split("=")[1])
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])

    rows = [run_one(n, rand_per_dev, steps) for n in devices]
    base = rows[0]["agg_rays_per_sec"] / rows[0]["n_devices"]
    for r in rows:
        r["weak_scaling_efficiency"] = r["agg_rays_per_sec"] / (
            base * r["n_devices"]
        )
        print(json.dumps(r))

    # ICI roofline for the DP gradient psum (ring all-reduce): each chip
    # moves 2*(n-1)/n * bytes; v5e ICI ~45 GB/s per direction per link
    bytes_ = rows[0]["psum_bytes_per_step"]
    n = max(devices)
    t_comm = 2 * (n - 1) / n * bytes_ / 45e9
    summary = {
        "metric": "weak_scaling_efficiency_virtual_mesh",
        "per_device_counts": {str(r["n_devices"]): round(r["weak_scaling_efficiency"], 3) for r in rows},
        "psum_bytes_per_step": bytes_,
        "ici_allreduce_est_s": t_comm,
        "note": "virtual CPU mesh timeshares one host; see module docstring",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
