"""Worker for the 2-process multi-host test (tests/test_multiprocess.py).

Launched as ``python multiprocess_worker.py <pid> <nprocs> <port> <outdir>``
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=2,
so the 2-process group forms a 4-device global "slice" — the CPU stand-in for
a multi-host TPU pod (SURVEY.md §4: multi-host tests without a pod).

Exercises the REAL multi-process path end to end:
- nerf_tpu.parallel.distributed.initialize (explicit coordinator),
- per-host batch shard -> global sharded arrays via
  global_batch_from_host_shards (jax.make_array_from_process_local_data),
- the DP shard_map train step over the global mesh,
- the orbax COLLECTIVE checkpoint save branch (utils/checkpoint.py,
  process_count > 1) and a post-save restore.

Writes {loss trajectory, param norm} to <outdir>/result_<pid>.json; the
parent test compares process 0's trajectory against a single-process run of
the same global batch.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from nerf_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nprocs, jax.process_count()
    n_global_devices = len(jax.devices())
    assert n_global_devices == 2 * nprocs, jax.devices()

    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, place_state
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import init_train_state
    from nerf_tpu.utils.checkpoint import maybe_resume, save_checkpoint

    # tiny model/batch: this test is about the process group, not the math
    mcfg = MLPConfig(depth=2, width=32, input_ch=15, input_ch_views=9, skips=())
    model = NeRFModel(
        pe_pts=PosEncConfig(2), pe_views=PosEncConfig(1), coarse=mcfg, fine=None
    )
    rs = RenderSettings(n_samples=8, n_importance=0, perturb=True)

    mesh = make_mesh()  # all 4 global devices on the 'data' axis
    params = init_model_params(jax.random.key(0), model)
    state = place_state(mesh, init_train_state(params, 5e-4, 500))
    step = make_sharded_train_step(mesh, model, rs, 5e-4, 500, donate=False)(state)

    # identical global batch on every process (same seed), then each host
    # feeds ONLY its own shard through make_array_from_process_local_data
    n_rand = 32
    rng = np.random.default_rng(0)
    g_ro = rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1
    g_rd = rng.standard_normal((n_rand, 3)).astype(np.float32)
    g_near = np.full((n_rand,), 2.0, np.float32)
    g_far = np.full((n_rand,), 6.0, np.float32)
    g_tgt = rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)

    sl = distributed.host_shard_slice(n_rand)
    batch = distributed.global_batch_from_host_shards(
        mesh, tuple(a[sl] for a in (g_ro, g_rd, g_near, g_far, g_tgt))
    )
    for a in batch:
        assert a.shape[0] == n_rand  # global shape, host-sharded

    key = jax.random.key(7)
    losses = []
    for _ in range(3):
        state, aux = step(state, *batch, key)
        losses.append(float(aux["loss"]))  # replicated -> addressable

    # collective orbax save (the process_count>1 branch), then restore
    ckpt_path = save_checkpoint(outdir, "mp_exp", state)
    restored = maybe_resume(outdir, "mp_exp", jax.device_get(state))
    leaves0 = jax.tree.leaves(jax.device_get(state.params))
    leaves1 = jax.tree.leaves(restored.params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 3

    pnorm = float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(state.params))
        )
    )
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "pnorm": pnorm, "ckpt": ckpt_path}, f)
    print(f"worker {pid}: ok losses={losses}", flush=True)


if __name__ == "__main__":
    main()
