"""Worker for the FULL-driver multi-process test (tests/test_multiprocess.py).

Unlike multiprocess_worker.py (which exercises the step/checkpoint layer with
a hand-built batch), this runs the PRODUCT driver — ``nerf_tpu.train.loop
.train()`` — end to end under a 2-process x 2-device group: dataset-driven
samplers feeding per-host shards through
``jax.make_array_from_process_local_data`` (data/rays_dataset.py multiproc
branches), the sharded step over the global mesh, i_print/i_weights cadence
with the collective checkpoint save, and process-0 artifact gating.

Runs BOTH ray policies (SURVEY.md §2 #2): use_batching (BatchedRaySampler)
and no_batching+precrop (ImageRaySampler). Writes both loss histories to
<outdir>/driver_result_<pid>.json; the parent test compares them against
single-process data_axis=4 runs of the identical config.
"""

import dataclasses
import json
import os
import sys


def main():
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from nerf_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )

    import jax

    assert jax.process_count() == nprocs

    from synthetic_scene import make_scene
    from nerf_tpu.train.loop import train
    from test_multiprocess import driver_config  # the shared tiny config

    scene = make_scene(n_train=4, n_test=1, H=20, W=20, seed=3)
    out = {}
    for policy in ("batched", "image"):
        cfg = driver_config(policy, os.path.join(outdir, f"run_{policy}"))
        result = train(cfg, scene=scene)
        out[policy] = result.history
        # fused multi-step scan under the 2-process group (VERDICT r4 #4):
        # the samplers' multiproc scan_operands assemble [k, n_rand, ...]
        # global chunk operands; trajectory must match the per-step run
        cfg5 = dataclasses.replace(
            cfg, fuse_steps=5,
            basedir=os.path.join(outdir, f"run_{policy}_fuse5"),
        )
        result5 = train(cfg5, scene=scene)
        out[policy + "_fuse5"] = result5.history
    # process-sharded eval rendering (VERDICT r4 #7): 2 test views over 2
    # processes (one frame each), spiral video assembled by process 0 from
    # the staged per-process frames
    scene_eval = make_scene(n_train=4, n_test=2, H=20, W=20, seed=4)
    cfg_eval = dataclasses.replace(
        driver_config("batched", os.path.join(outdir, "run_eval")),
        expname="driver_eval", i_testset=40, i_video=40, i_weights=0,
    )
    train(cfg_eval, scene=scene_eval)

    with open(os.path.join(outdir, f"driver_result_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"driver worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
