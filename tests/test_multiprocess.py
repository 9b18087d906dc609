"""TRUE multi-process (multi-host analog) test: 2 CPU processes x 2 devices.

The reference is single-process (SURVEY.md §2); this validates the TPU-native
multi-host layer the framework adds: jax.distributed process group, per-host
data feed assembled into global sharded arrays, the DP train step over a
global mesh, and the orbax collective checkpoint branch — all without a pod,
per SURVEY.md §4's test strategy.

The workers (tests/multiprocess_worker.py) run OUTSIDE this process because a
jax.distributed group needs its own runtime; this test launches them, waits,
and then checks (a) both exited cleanly, (b) their loss trajectories agree
with a single-process run of the same global batch, (c) the collective
checkpoint is restorable here.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    script = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PYTEST_CURRENT_TEST", None)
    # scrub the remote-TPU (axon) plugin hooks: its sitecustomize registers a
    # PJRT plugin in every interpreter, which breaks a CPU-only
    # jax.distributed process group (process_count stays 1)
    for var in list(env):
        if var.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(var)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    return results, outdir


def test_two_process_group_runs(worker_results):
    results, _ = worker_results
    assert len(results) == 2
    # both processes observed the SAME replicated loss trajectory
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=1e-6)
    assert results[0]["pnorm"] == pytest.approx(results[1]["pnorm"], rel=1e-6)


def test_two_process_matches_single_process(worker_results):
    """The 2-process/4-device DP run must match this (single-process,
    8-virtual-device) run of the identical global batch: the sharded step
    pre-draws randomness globally, so trajectories are mesh- AND
    process-layout-invariant."""
    results, _ = worker_results

    import jax
    import jax.numpy as jnp

    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, place_state
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import init_train_state

    mcfg = MLPConfig(depth=2, width=32, input_ch=15, input_ch_views=9, skips=())
    model = NeRFModel(
        pe_pts=PosEncConfig(2), pe_views=PosEncConfig(1), coarse=mcfg, fine=None
    )
    rs = RenderSettings(n_samples=8, n_importance=0, perturb=True)

    mesh = make_mesh(n_data=4)  # same data-axis size as the 2-process run
    params = init_model_params(jax.random.key(0), model)
    state = place_state(mesh, init_train_state(params, 5e-4, 500))
    step = make_sharded_train_step(mesh, model, rs, 5e-4, 500, donate=False)(state)

    n_rand = 32
    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32)),
        jnp.full((n_rand,), 2.0, jnp.float32),
        jnp.full((n_rand,), 6.0, jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)),
    )
    key = jax.random.key(7)
    losses = []
    for _ in range(3):
        state, aux = step(state, *batch, key)
        losses.append(float(aux["loss"]))

    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5)


def test_collective_checkpoint_restorable_here(worker_results):
    """The checkpoint written by the 2-process COLLECTIVE save must restore
    in an ordinary single-process context (elastic restart story)."""
    results, outdir = worker_results

    import jax

    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.train.step import init_train_state
    from nerf_tpu.utils.checkpoint import find_checkpoints, restore_checkpoint

    mcfg = MLPConfig(depth=2, width=32, input_ch=15, input_ch_views=9, skips=())
    model = NeRFModel(
        pe_pts=PosEncConfig(2), pe_views=PosEncConfig(1), coarse=mcfg, fine=None
    )
    template = jax.device_get(
        init_train_state(init_model_params(jax.random.key(0), model), 5e-4, 500)
    )
    ckpts = find_checkpoints(outdir, "mp_exp")
    assert ckpts, "no checkpoint written by the collective save"
    restored = restore_checkpoint(ckpts[-1], template)
    assert int(restored.step) == 3
    pnorm = float(
        np.sqrt(
            sum(float(np.sum(np.square(x))) for x in jax.tree.leaves(restored.params))
        )
    )
    assert pnorm == pytest.approx(results[0]["pnorm"], rel=1e-6)
