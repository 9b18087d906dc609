"""Mesh + sharding layer: SPMD data-parallel training over TPU devices.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed
anywhere); this module is the TPU-native scaling design from SURVEY.md §5/§7:

- a named ``Mesh`` with axes ``('data', 'model')`` — rays shard over ``data``
  (the batch axis of every per-ray tensor), parameters replicate over ``data``
  and may shard their hidden dimension over ``model`` (tensor parallelism for
  wide-MLP variants; the stock 256-wide NeRF runs with model=1);
- the SAME jitted train step as single-chip, wrapped with in/out shardings:
  XLA inserts the gradient psum over ``data`` (riding ICI) and overlaps it
  with the backward pass;
- multi-host: ``jax.distributed.initialize`` + per-host data feed
  (each host samples its own ray shard; see data/rays_dataset.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. n_data=0 -> all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devices) // n_model
    use = n_data * n_model
    dev_array = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Per-ray tensors: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, shard_model_axis: bool = False):
    """Sharding tree for params: replicated over 'data'; optionally the
    hidden (out) dimension of each weight over 'model' (TP)."""
    if not shard_model_axis or mesh.shape["model"] == 1:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, params)

    def leaf_spec(path, leaf):
        # weights [in, out]: shard out over 'model'; biases [out] likewise —
        # XLA's sharding propagation resolves the skip-concat joins.
        if leaf.ndim == 2 and leaf.shape[-1] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P(None, "model"))
        if leaf.ndim == 1 and leaf.shape[0] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P("model"))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_batch(mesh: Mesh, *arrays):
    """Place per-ray arrays with the leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_sharded_train_step(
    mesh: Mesh,
    model,
    rs,
    lrate: float,
    lrate_decay: int,
    donate: bool = True,
    shard_model_axis: bool = False,
    hwf=None,
):
    """The single-chip train step jitted over the mesh.

    Per-ray inputs are sharded over 'data'; train state is replicated (or
    TP-sharded); XLA emits the psum gradient all-reduce automatically.
    """
    import dataclasses as _dc

    from nerf_tpu.train.step import TrainState, make_train_step_fn

    step_body = make_train_step_fn(model, rs, lrate, lrate_decay, hwf=hwf)

    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def shardings_for_state(state: TrainState):
        p_sh = param_sharding(mesh, state.params, shard_model_axis)
        # opt_state mirrors the params pytree inside adam's moments; replicate
        # everything except params (XLA re-propagates TP shardings if enabled)
        return TrainState(
            params=p_sh,
            opt_state=jax.tree.map(lambda _: rep, state.opt_state),
            step=rep,
        )

    def compile_step(example_state: TrainState):
        state_sh = shardings_for_state(example_state)
        return jax.jit(
            step_body,
            in_shardings=(state_sh, data, data, data, data, data, rep),
            out_shardings=(state_sh, rep),  # aux is scalar metrics -> replicated
            donate_argnums=(0,) if donate else (),
        )

    return compile_step
