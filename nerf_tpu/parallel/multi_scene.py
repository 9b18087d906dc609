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

from functools import partial
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


def one_scene_sample(img, pose, itr, Kk, key, *, H, W, n_rand, crop):
    """Single-scene policy-(b) sampling body, vmapped over the scene axis by
    _stacked_sample AND by tools/multiscene_sweep.py — one definition so the
    key-split order (which the sweep's draw-parity claims depend on) cannot
    desync between the product path and the measurement tool."""
    from nerf_tpu.data.rays_dataset import _sample_image_rays

    key2, sub = jax.random.split(key)
    ro, rd, tgt = _sample_image_rays(
        img, pose, itr, Kk, H, W, n_rand, crop, sub
    )
    return key2, ro, rd, tgt


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _stacked_sample(images, poses, i_train, K, keys, H, W, n_rand, crop):
    one = partial(one_scene_sample, H=H, W=W, n_rand=n_rand, crop=crop)
    return jax.vmap(one)(images, poses, i_train, K, keys)


class StackedImageSampler:
    """S homogeneous scenes' policy-(b) samplers as ONE vmapped program.

    The per-scene sampler list costs S host dispatches per step (plus a
    host-side stack); on a remote-dispatch platform (~0.5 ms floor each,
    docs/PERF.md) that dominates once S grows. Stacking the scene tensors
    and vmapping the SAME per-step sampling body gives one dispatch per
    step and bit-identical draws: the vmapped ``jax.random.split`` advances
    each scene's key exactly as its standalone ImageRaySampler would.

    Requires every scene to share (H, W, n_train images) — the sweep/CLI
    fall back to per-scene samplers otherwise.
    """

    def __init__(self, scenes, n_rand: int, keys, precrop_iters: int = 0,
                 precrop_frac: float = 0.5):
        s0 = scenes[0]
        for s in scenes[1:]:
            if (s.H, s.W) != (s0.H, s0.W) or len(s.i_train) != len(s0.i_train):
                raise ValueError("StackedImageSampler needs homogeneous scenes")
        self.H, self.W, self.n_rand = s0.H, s0.W, n_rand
        self.precrop_iters = precrop_iters
        self.images = jnp.stack([jnp.asarray(s.images) for s in scenes])
        self.poses = jnp.stack([jnp.asarray(s.poses) for s in scenes])
        self.i_train = jnp.stack([jnp.asarray(s.i_train) for s in scenes])
        self.K = jnp.stack([jnp.asarray(s.K) for s in scenes])
        self.keys = jnp.stack(list(keys))  # [S] — same keys train_multi splits
        dH = int(self.H // 2 * precrop_frac)
        dW = int(self.W // 2 * precrop_frac)
        self._crop = (self.H // 2 - dH, self.W // 2 - dW, 2 * dH, 2 * dW)
        self._full = (0, 0, self.H, self.W)

    def next_batch(self, step: int):
        """-> (ro, rd, target), each [S, n_rand, ...]."""
        crop = self._crop if step < self.precrop_iters else self._full
        self.keys, ro, rd, tgt = _stacked_sample(
            self.images, self.poses, self.i_train, self.K, self.keys,
            self.H, self.W, self.n_rand, crop,
        )
        return ro, rd, tgt
