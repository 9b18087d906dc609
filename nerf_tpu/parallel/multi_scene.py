"""Multi-scene concurrent training (the BASELINE.json throughput-sweep shape:
"all 8 blender scenes trained concurrently, one scene per host group").

TPU-native design: training S independent scenes is a vmap over the scene
axis of the SAME train step — one compiled program updating S stacked
parameter pytrees from S ray batches. On a pod slice, shard the scene axis
over the mesh ('scene' axis = host groups) and each group trains its scene
with zero cross-scene communication; on one chip, the S MLPs batch into
larger MXU work (S small matmuls become one [S, ...] batched matmul).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.step import TrainState, init_train_state, make_train_step_fn


def stack_states(states) -> TrainState:
    """Stack S per-scene TrainStates into one leading-axis-S state."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *states)


def unstack_states(state: TrainState, n: int):
    return [jax.tree.map(lambda x: x[i], state) for i in range(n)]


def init_multi_scene_state(
    key: jax.Array, n_scenes: int, init_params_fn, lrate: float, lrate_decay: int
) -> TrainState:
    keys = jax.random.split(key, n_scenes)
    states = [
        init_train_state(init_params_fn(k), lrate, lrate_decay) for k in keys
    ]
    return stack_states(states)


def make_multi_scene_step(
    model: NeRFModel,
    rs: RenderSettings,
    lrate: float,
    lrate_decay: int,
    donate: bool = True,
):
    """vmapped train step.

    Returned fn: (stacked_state, rays_o[S,N,3], rays_d[S,N,3], near[S,N],
    far[S,N], target[S,N,3], keys[S]) -> (stacked_state, aux dict of [S]).
    With rs.ndc the fn takes a trailing ``hwf [S, 3]`` argument — each
    scene's (H, W, focal) rides the vmap as an operand, so forward-facing
    scenes with different intrinsics share one compiled program (the NDC
    transform is pure arithmetic in H/W/focal; train/step.py hwf_operand).
    """
    step_fn = make_train_step_fn(
        model, rs, lrate, lrate_decay, hwf_operand=rs.ndc
    )
    vstep = jax.vmap(step_fn)
    return jax.jit(vstep, donate_argnums=(0,) if donate else ())


def make_sharded_multi_scene_step(
    mesh,
    model: NeRFModel,
    rs: RenderSettings,
    lrate: float,
    lrate_decay: int,
    donate: bool = True,
):
    """The vmapped step with the SCENE axis sharded over the mesh's 'data'
    axis — one scene (group) per device (group), zero cross-scene
    communication (the BASELINE "one scene per host group" sweep shape).
    Takes the trailing hwf [S, 3] operand when rs.ndc (see
    make_multi_scene_step).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn = make_train_step_fn(
        model, rs, lrate, lrate_decay, hwf_operand=rs.ndc
    )
    vstep = jax.vmap(step_fn)
    scene_sh = NamedSharding(mesh, P("data"))  # leading axis = scene
    n_args = 8 if rs.ndc else 7
    return jax.jit(
        vstep,
        # a single sharding broadcasts over every leaf of a pytree argument
        in_shardings=(scene_sh,) * n_args,
        out_shardings=(scene_sh, scene_sh),
        donate_argnums=(0,) if donate else (),
    )


def shard_scene_axis(mesh, tree):
    """Place a stacked (leading scene axis) pytree over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(tree, NamedSharding(mesh, P("data")))
