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
    """The train step over the mesh. Returns compile_step(example_state) -> fn
    with the single-chip signature (state, ro, rd, near, far, target, key).

    Two implementations behind one API:

    - DP (default, the production path): ``shard_map`` over 'data' with an
      explicit ``pmean`` gradient all-reduce in the body. shard_map (not jit
      sharding propagation) is load-bearing: the fused Pallas kernel is not
      GSPMD-partitionable, but inside shard_map it runs per-shard on each
      device's local rays. Randomness is pre-drawn GLOBALLY outside the
      shard_map (train/step.py draw_overrides) and sharded over 'data' as an
      operand, so results are bit-equal to single-chip and mesh-invariant.

    - DP×TP (``shard_model_axis=True``, jnp path only): the step jitted with
      NamedShardings, params sharded on the hidden dim over 'model'; XLA
      propagates the shardings and inserts the collectives. For wide-MLP
      variants whose weights outgrow one chip's VMEM/HBM; the stock 256-wide
      NeRF never needs it.
    """
    from nerf_tpu.train.step import (
        TrainState, draw_overrides, make_train_step_core, make_train_step_fn,
    )

    rep = replicated(mesh)
    data = batch_sharding(mesh)

    if shard_model_axis:
        step_body = make_train_step_fn(model, rs, lrate, lrate_decay, hwf=hwf)

        def shardings_for_state(state: TrainState):
            p_sh = param_sharding(mesh, state.params, True)
            # opt_state mirrors the params pytree inside adam's moments;
            # replicate everything except params (XLA re-propagates TP
            # shardings through the update)
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
                out_shardings=(state_sh, rep),
                donate_argnums=(0,) if donate else (),
            )

        # the TP path intentionally exposes NO raw body: its state shardings
        # are bound per-example inside jit, so it cannot be scanned by the
        # fused loop (train/loop.py checks this attribute and falls back)
        compile_step.step_fn = None
        return compile_step

    core = make_train_step_core(
        model, rs, lrate, lrate_decay, hwf=hwf, axis_name="data"
    )

    def step_fn(state: TrainState, rays_o, rays_d, near, far, target, key):
        key = jax.random.fold_in(key, state.step)
        overrides = draw_overrides(key, rays_o.shape[0], rs)
        mapped = jax.shard_map(
            core,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data"),
                      P("data")),
            out_specs=(P(), P()),
            # vma checking can't see through pallas_call (the fused kernel);
            # replication of the outputs is guaranteed by the pmean in core
            check_vma=False,
        )
        return mapped(state, rays_o, rays_d, near, far, target, overrides)

    def compile_step(example_state: TrainState):
        del example_state  # state is replicated; no per-state shardings needed
        return jax.jit(
            step_fn,
            in_shardings=(rep, data, data, data, data, data, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,) if donate else (),
        )

    # the un-jitted shard_map body, for callers that embed the step in a
    # larger jitted program (the fused multi-step scan, train/loop.py)
    compile_step.step_fn = step_fn
    return compile_step


def place_state(mesh: Mesh, state):
    """Replicate a (host or single-device) train state onto the mesh."""
    return jax.device_put(state, replicated(mesh))
