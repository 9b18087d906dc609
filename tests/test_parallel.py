"""Mesh data-parallel training on the 8-device virtual CPU mesh:
the sharded step must (a) run, (b) produce bitwise/near-identical results to
the single-chip step, since DP-psum of per-shard mean-grads equals the global
mean when shards are equal-sized."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.factory import init_model_params
from nerf_tpu.models.nerf_mlp import MLPConfig
from nerf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.step import init_train_state, make_train_step


def _setup(n_importance=16, width=32):
    mcfg = MLPConfig(depth=4, width=width, input_ch=63, input_ch_views=27, skips=(2,))
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg if n_importance else None,
    )
    rs = RenderSettings(n_samples=16, n_importance=n_importance, perturb=False)
    params = init_model_params(jax.random.key(0), model)
    return model, rs, params


def _batch(n=256, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 0.1)
    rays_d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    near = jnp.full((n,), 2.0)
    far = jnp.full((n,), 6.0)
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return rays_o, rays_d, near, far, target


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_chip():
    model, rs, params = _setup()
    state1 = init_train_state(params, 5e-4, 250)
    state2 = init_train_state(params, 5e-4, 250)
    batch = _batch()
    key = jax.random.key(7)

    single = make_train_step(model, rs, 5e-4, 250, donate=False)
    s1, aux1 = single(state1, *batch, key)

    mesh = make_mesh(n_data=8)
    compile_step = make_sharded_train_step(mesh, model, rs, 5e-4, 250, donate=False)
    sharded = compile_step(state2)
    sbatch = shard_batch(mesh, *batch)
    s2, aux2 = sharded(state2, *sbatch, key)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_tp_mesh_compiles_and_runs():
    """2D mesh (data=4, model=2): params TP-sharded on the hidden dim."""
    model, rs, params = _setup(width=64)
    state = init_train_state(params, 5e-4, 250)
    mesh = make_mesh(n_data=4, n_model=2)
    compile_step = make_sharded_train_step(
        mesh, model, rs, 5e-4, 250, donate=False, shard_model_axis=True
    )
    step = compile_step(state)
    batch = shard_batch(mesh, *_batch())
    s, aux = step(state, *batch, jax.random.key(0))
    assert np.isfinite(float(aux["loss"]))
    s, aux = step(s, *batch, jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))


def test_batch_sharding_layout():
    mesh = make_mesh(n_data=8)
    x = shard_batch(mesh, jnp.zeros((64, 3)))
    assert x.sharding == batch_sharding(mesh)
