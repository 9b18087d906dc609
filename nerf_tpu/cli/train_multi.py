"""Multi-scene concurrent training CLI.

Trains S independent scenes as ONE vmapped+jitted train step over the scene
axis (parallel/multi_scene.py) — the BASELINE throughput-sweep shape ("all 8
blender scenes concurrently, one scene per host group"). With --data_axis>1
the scene axis is sharded over the device mesh: each device (group) owns its
scenes end-to-end, zero cross-scene communication.

Usage:
    python -m nerf_tpu.cli.train_multi --configs configs/lego.txt \
        configs/ship.txt [--n_iters N] [--data_axis D] [...overrides]

Every scene trains with the hyperparameters of ITS OWN config file; model
shape, render settings, and batch size must agree across scenes (they are
one compiled program). There is no reference analog (the reference trains
one scene per process, run_nerf.py:534); cite: SURVEY.md §5 distributed
design.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _split_argv(argv):
    """Pull `--configs a b c` out of argv; return (config_paths, rest)."""
    if "--configs" not in argv:
        raise SystemExit("train_multi requires --configs cfg1.txt [cfg2.txt ...]")
    i = argv.index("--configs")
    paths, j = [], i + 1
    while j < len(argv) and not argv[j].startswith("--"):
        paths.append(argv[j])
        j += 1
    return paths, argv[:i] + argv[j:]


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import load_config
    from nerf_tpu.data.rays_dataset import make_sampler
    from nerf_tpu.models.factory import init_model_params, make_model
    from nerf_tpu.parallel import distributed
    from nerf_tpu.parallel.multi_scene import (
        StackedImageSampler, init_multi_scene_state, make_multi_scene_step,
        make_sharded_multi_scene_step, shard_scene_axis, unstack_states,
    )
    from nerf_tpu.train.loop import load_scene, render_settings_from_config
    from nerf_tpu.utils import checkpoint as ckpt_lib

    argv = list(sys.argv[1:] if argv is None else argv)
    paths, rest = _split_argv(argv)
    cfgs = [load_config(["--config", p] + rest) for p in paths]
    c0 = cfgs[0]
    S = len(cfgs)
    for c in cfgs[1:]:
        for f in ("N_rand", "N_samples", "N_importance", "netdepth", "netwidth",
                  "use_viewdirs", "white_bkgd", "no_batching"):
            if getattr(c, f) != getattr(c0, f):
                raise SystemExit(
                    f"all scenes must share {f} (one compiled program); "
                    f"{c.expname}={getattr(c, f)} vs {c0.expname}={getattr(c0, f)}"
                )

    distributed.initialize(c0.coordinator_address, c0.num_processes, c0.process_id)
    from nerf_tpu.utils import compile_cache

    compile_cache.enable()

    scenes = [load_scene(c) for c in cfgs]
    model = make_model(c0)
    rs = render_settings_from_config(c0)
    for c in cfgs[1:]:
        if c.ndc != c0.ndc:
            raise SystemExit(
                "all scenes must agree on NDC (llff forward-facing) vs not — "
                "one compiled program"
            )
    # NDC scenes march in [0,1] (ref run_nerf.py:564-566) and carry their own
    # (H, W, focal) into the step as a per-scene operand
    hwf_stack = None
    if rs.ndc:
        hwf_stack = jnp.asarray(
            [[s.H, s.W, s.focal] for s in scenes], jnp.float32
        )

    root = jax.random.key(c0.seed)
    k_init, k_sample, k_step = jax.random.split(root, 3)
    mstate = init_multi_scene_state(
        k_init, S, lambda k: init_model_params(k, model), c0.lrate, c0.lrate_decay
    )

    n_data = c0.data_axis if c0.data_axis > 0 else jax.device_count()
    mesh = None
    if n_data > 1 and S % n_data == 0:
        from nerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=n_data)
        mstate = shard_scene_axis(mesh, mstate)
        step = make_sharded_multi_scene_step(
            mesh, model, rs, c0.lrate, c0.lrate_decay, donate=c0.donate_state
        )
        print(f"[MESH] {S} scenes sharded over {n_data} devices: {mesh}")
    else:
        step = make_multi_scene_step(
            model, rs, c0.lrate, c0.lrate_decay, donate=c0.donate_state
        )

    # homogeneous no_batching scenes: ONE vmapped sampler program for all S
    # scenes (one dispatch/step instead of S; draws identical to the
    # per-scene samplers — parallel/multi_scene.py StackedImageSampler).
    # Eligibility requires FULL tensor homogeneity (all splits' image
    # stacks, poses) AND per-config agreement on the precrop schedule —
    # the stacked program bakes c0's crop phases, and a scene with its own
    # precrop_iters must keep its own sampler (docstring contract: every
    # scene trains with ITS OWN config).
    stacked = None
    scene_keys = jax.random.split(k_sample, S)
    if c0.no_batching and all(
        s.images.shape == scenes[0].images.shape
        and s.poses.shape == scenes[0].poses.shape
        and len(s.i_train) == len(scenes[0].i_train)
        for s in scenes
    ) and all(
        c.precrop_iters == c0.precrop_iters
        and c.precrop_frac == c0.precrop_frac
        for c in cfgs
    ):
        stacked = StackedImageSampler(
            scenes, c0.N_rand, scene_keys, c0.precrop_iters, c0.precrop_frac
        )
        samplers = None
    else:
        samplers = [
            make_sampler(s, c, k) for s, c, k in zip(scenes, cfgs, scene_keys)
        ]
    bounds = [(0.0, 1.0) if rs.ndc else (s.near, s.far) for s in scenes]
    near = jnp.stack(
        [jnp.full((c0.N_rand,), b[0], jnp.float32) for b in bounds], 0
    )
    far = jnp.stack(
        [jnp.full((c0.N_rand,), b[1], jnp.float32) for b in bounds], 0
    )
    keys = jax.random.split(k_step, S)
    if mesh is not None:
        near, far, keys = (shard_scene_axis(mesh, x) for x in (near, far, keys))
        if hwf_stack is not None:
            hwf_stack = shard_scene_axis(mesh, hwf_stack)

    t0 = time.time()
    history = []
    for i in range(1, c0.n_iters + 1):
        if stacked is not None:
            ro, rd, tgt = stacked.next_batch(i)
        else:
            batches = [
                smp.next_batch(i) if c.no_batching else smp.next_batch()
                for smp, c in zip(samplers, cfgs)
            ]
            ro, rd, tgt = (jnp.stack(x, 0) for x in zip(*batches))
        if mesh is not None:
            ro, rd, tgt = (shard_scene_axis(mesh, x) for x in (ro, rd, tgt))
        if hwf_stack is not None:
            mstate, aux = step(mstate, ro, rd, near, far, tgt, keys, hwf_stack)
        else:
            mstate, aux = step(mstate, ro, rd, near, far, tgt, keys)
        if i % c0.i_print == 0:
            losses = np.asarray(aux["loss"])
            psnrs = np.asarray(aux["psnr"])
            rate = c0.i_print * c0.N_rand * S / max(time.time() - t0, 1e-9)
            pairs = "  ".join(
                f"{c.expname}: loss {l:.5f} psnr {p:.2f}"
                for c, l, p in zip(cfgs, losses, psnrs)
            )
            print(f"[TRAIN-MULTI] Iter {i} ({rate:,.0f} rays/s agg)  {pairs}")
            history.append((i, losses.copy(), psnrs.copy()))
            t0 = time.time()
        if c0.i_weights > 0 and i % c0.i_weights == 0:
            for c, st in zip(cfgs, unstack_states(jax.device_get(mstate), S)):
                path = ckpt_lib.save_checkpoint(c.basedir, c.expname, st)
                print("Saved checkpoints at", path)
    return mstate, history


if __name__ == "__main__":
    main()
