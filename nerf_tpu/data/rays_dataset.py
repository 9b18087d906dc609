"""Per-step ray-batch selection — the reference's two policies, device-side.

(a) ``use_batching`` (ref run_nerf.py:676-698, 715-726): all train-image rays
    precomputed as one [N_total, 3, 3] buffer (origin, direction, rgb),
    shuffled, consumed in N_rand windows, reshuffled each epoch.
    TPU design: the buffer is uploaded to device ONCE; the shuffle is a device
    permutation array regenerated per epoch (jax.random.permutation), and each
    step gathers its window through the permutation inside jit. No host↔device
    traffic per step.

(b) ``no_batching`` (ref run_nerf.py:728-757): one random train image per
    step, rays generated on the fly, N_rand pixels sampled without
    replacement, optionally restricted to a center crop for the first
    ``precrop_iters`` steps. TPU design: images+poses live on device; image
    pick, ray generation, and pixel sampling all happen inside one jitted
    sampler (shape-stable: the crop vs full branch is a host-level static
    switch, compiled once each).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.data.scene import Scene
from nerf_tpu.geom.rays import get_rays_np


def build_ray_buffer(scene: Scene) -> np.ndarray:
    """Host-side precompute of [N_train*H*W, 3, 3] (ro, rd, rgb) float32.

    Mirrors ref run_nerf.py:680-686 (rays for all poses, concat rgb,
    train-image selection, flatten).
    """
    rays = np.stack(
        [get_rays_np(scene.H, scene.W, scene.K, p[:3, :4]) for p in scene.poses], 0
    )  # [N, 2, H, W, 3]
    rays_rgb = np.concatenate([rays, scene.images[:, None]], 1)  # [N, 3, H, W, 3]
    rays_rgb = np.transpose(rays_rgb, [0, 2, 3, 1, 4])  # [N, H, W, 3, 3]
    rays_rgb = np.stack([rays_rgb[i] for i in scene.i_train], 0)
    return np.reshape(rays_rgb, [-1, 3, 3]).astype(np.float32)


def _gather_window(buffer, perm, offset, n_rand):
    idx = jax.lax.dynamic_slice_in_dim(perm, offset, n_rand)
    batch = buffer[idx]  # [n_rand, 3, 3]
    return batch[:, 0], batch[:, 1], batch[:, 2]


class BatchedRaySampler:
    """Policy (a): epoch-shuffled window over the global ray buffer.

    ``sharding`` (a NamedSharding over the mesh's 'data' axis) makes the
    jitted gather emit each batch already sharded for the DP train step — the
    buffer is replicated across the mesh and every device gathers its own
    ray shard; no host round-trip, no post-hoc resharding copy.

    Multi-process (``jax.process_count() > 1``): ``jax.device_put`` to a
    sharding spanning non-addressable devices is invalid, so the per-host
    feed design (SURVEY.md §5) takes over — every host keeps the (small,
    <1 GB) buffer and the epoch permutation in host memory, gathers ONLY its
    ``host_shard_slice`` of each N_rand window, and the shards assemble into
    one global ['data'-sharded] batch via
    ``jax.make_array_from_process_local_data``
    (parallel/distributed.py global_batch_from_host_shards). Key splits and
    i_batch bookkeeping are identical on every process (same seed), so the
    GLOBAL batch sequence is identical to the single-process sampler's.
    """

    def __init__(self, scene: Scene, n_rand: int, key: jax.Array, sharding=None):
        self.n_rand = n_rand
        buf = build_ray_buffer(scene)
        self.n_total = buf.shape[0]
        self.key = key
        self.perm = None
        self.i_batch = 0
        self._multiproc = sharding is not None and jax.process_count() > 1
        if self._multiproc:
            from nerf_tpu.parallel.distributed import host_shard_slice

            self.buffer = buf  # host-resident numpy
            self._mesh = sharding.mesh
            self._host_sl = host_shard_slice(n_rand)
        else:
            self.buffer = jnp.asarray(buf)
            if sharding is not None:
                rep = jax.sharding.NamedSharding(
                    sharding.mesh, jax.sharding.PartitionSpec()
                )
                self.buffer = jax.device_put(self.buffer, rep)
            out_sh = None if sharding is None else (sharding, sharding, sharding)
            self._gather = jax.jit(
                _gather_window, static_argnums=(3,), out_shardings=out_sh
            )
        self._reshuffle()

    def _reshuffle(self):
        self.key, sub = jax.random.split(self.key)
        self.perm = jax.random.permutation(sub, self.n_total)
        if self._multiproc:
            self.perm = np.asarray(self.perm)
        self.i_batch = 0

    def ensure_epoch(self):
        """Re-wrap the permutation when fewer than n_rand rays remain.

        Epoch boundary (ref run_nerf.py:722-726). The reference emits one
        SHORT batch here; under jit batch shapes must be static, so instead
        the window wraps: remainder of the old permutation + head of the new
        one. Every ray is consumed exactly once per epoch either way."""
        if self.i_batch + self.n_rand > self.perm.shape[0]:
            tail = self.perm[self.i_batch :]
            self._reshuffle()
            cat = np.concatenate if self._multiproc else jnp.concatenate
            self.perm = cat([tail, self.perm])

    # --- fused multi-step scan support (train/loop.py fuse_steps) ---

    def scan_supported(self) -> bool:
        return True

    def scan_per_step_sharding(self, mesh):
        """Sharding of the per_step scan operand over the mesh: replicated
        index windows single-process; globally assembled [k, n_rand, ...]
        ray batches (batch axis over 'data') in a multi-process run."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if not self._multiproc:
            return None
        return NamedSharding(mesh, P(None, "data"))

    def max_chunk(self) -> int:
        """Chunks may span epoch wraps (the window builder reproduces the
        tail-concat + reshuffle host-side), so the driver needs no cap."""
        return 1 << 30

    def _window(self, k: int):
        """The next k*n_rand permutation indices, crossing epoch wraps
        exactly as k next_batch() calls would (ensure_epoch's tail-concat +
        reshuffle, same key-split order). Returns (idx [k*n_rand], staged
        (perm, i_batch, key)) — state commits in advance(k)."""
        perm, i_batch, key = self.perm, self.i_batch, self.key
        cat = np.concatenate if self._multiproc else jnp.concatenate
        out, need = [], k
        while need:
            take = min(need, (perm.shape[0] - i_batch) // self.n_rand)
            if take:
                out.append(perm[i_batch : i_batch + take * self.n_rand])
                i_batch += take * self.n_rand
                need -= take
            if need:
                tail = perm[i_batch:]
                key, sub = jax.random.split(key)
                newp = jax.random.permutation(sub, self.n_total)
                if self._multiproc:
                    newp = np.asarray(newp)
                perm = cat([tail, newp])
                i_batch = 0
        idx = out[0] if len(out) == 1 else cat(out)
        return idx, (perm, i_batch, key)

    def scan_fn(self, step0: int):
        """Stable (memoized, so the driver's jit cache hits) pure sampler
        body: batch = fn(args, op). Single-process, op is the step's
        [n_rand] permutation window and the buffer rides as an ARGUMENT —
        closing over it would bake a multi-hundred-MB constant into the
        jaxpr. Multi-process, the gather already happened host-side
        (scan_operands) and op IS the (ro, rd, rgb) batch."""
        if not hasattr(self, "_scan_fn"):
            if self._multiproc:

                def sample_fn(args, op):
                    return op

            else:

                def sample_fn(args, idx):
                    (buffer,) = args
                    batch = buffer[idx]  # [n_rand, 3, 3]
                    return batch[:, 0], batch[:, 1], batch[:, 2]

            self._scan_fn = sample_fn
        return self._scan_fn

    def scan_operands(self, step0: int, k: int):
        """(args, per_step) for a k-step chunk — per_step carries what the k
        next_batch() calls would produce. Slicing the window OUTSIDE the
        fused program keeps its operand shapes fixed ([k, n_rand] always):
        epoch wraps — whose tail-concat changes len(perm) — happen inside
        the host-side window builder (_window), never in the program.
        Caller commits host state with advance(k).

        Multi-process: every host gathers ONLY its host_shard_slice of each
        step's window from its host-resident buffer and the k-step shards
        assemble into ONE global [k, n_rand, ...] 'data'-sharded array
        (jax.make_array_from_process_local_data) — the same per-host feed
        as next_batch, amortized over the chunk."""
        idx, self._staged = self._window(k)
        if self._multiproc:
            from jax.sharding import PartitionSpec as P

            from nerf_tpu.parallel.distributed import global_batch_from_host_shards

            sl = self._host_sl
            idx = np.asarray(idx).reshape(k, self.n_rand)[:, sl.start : sl.stop]
            batch = self.buffer[idx]  # [k, n_rand/n_hosts, 3, 3]
            per_step = global_batch_from_host_shards(
                self._mesh,
                (batch[:, :, 0], batch[:, :, 1], batch[:, :, 2]),
                spec=P(None, "data"),
            )
            return (), per_step
        idx = jnp.asarray(idx, jnp.int32).reshape(k, self.n_rand)
        return (self.buffer,), idx

    def advance(self, k: int):
        # commit the state _window staged (incl. any epoch wraps it crossed)
        self.perm, self.i_batch, self.key = self._staged

    def next_batch(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        self.ensure_epoch()
        if self._multiproc:
            from nerf_tpu.parallel.distributed import global_batch_from_host_shards

            sl = self._host_sl
            idx = self.perm[self.i_batch + sl.start : self.i_batch + sl.stop]
            batch = self.buffer[idx]  # this host's [n_rand/n_hosts, 3, 3]
            ro, rd, rgb = global_batch_from_host_shards(
                self._mesh, (batch[:, 0], batch[:, 1], batch[:, 2])
            )
        else:
            ro, rd, rgb = self._gather(
                self.buffer, self.perm, self.i_batch, self.n_rand
            )
        self.i_batch += self.n_rand
        return ro, rd, rgb


def _sample_image_rays(
    images, poses, i_train, K, H: int, W: int, n_rand: int,
    crop: Tuple[int, int, int, int], key
):
    """Jitted core of policy (b). crop = (row0, col0, rows, cols) static."""
    k_img, k_pix = jax.random.split(key)
    img_i = i_train[jax.random.randint(k_img, (), 0, i_train.shape[0])]
    target = images[img_i]
    pose = poses[img_i, :3, :4]

    from nerf_tpu.geom.rays import get_rays  # local import to avoid cycle

    rays_o, rays_d = get_rays(H, W, K, pose)

    row0, col0, rows, cols = crop
    # sample without replacement over the crop area (ref np.random.choice
    # replace=False, run_nerf.py:752); degrade to replacement when the crop
    # holds fewer pixels than N_rand (the reference would crash there)
    flat = jax.random.choice(
        k_pix, rows * cols, (n_rand,), replace=n_rand > rows * cols
    )
    r = row0 + flat // cols
    c = col0 + flat % cols
    return rays_o[r, c], rays_d[r, c], target[r, c]


class ImageRaySampler:
    """Policy (b): per-step single-image pixel sampling with precrop.

    Multi-process: every host runs the (tiny: one image's rays + N_rand
    gathers) sampling program on its own devices with the same key — the
    draws are identical everywhere — then contributes only its
    ``host_shard_slice`` of the result to the global 'data'-sharded batch
    (jax.make_array_from_process_local_data). Costs one small device->host
    fetch per step; the global batch matches the single-process sampler's."""

    def __init__(
        self,
        scene: Scene,
        n_rand: int,
        key: jax.Array,
        precrop_iters: int = 0,
        precrop_frac: float = 0.5,
        sharding=None,
    ):
        self.H, self.W = scene.H, scene.W
        self.n_rand = n_rand
        self.precrop_iters = precrop_iters
        self.images = jnp.asarray(scene.images)
        self.poses = jnp.asarray(scene.poses)
        self.i_train = jnp.asarray(scene.i_train)
        self.K = jnp.asarray(scene.K)
        self._multiproc = sharding is not None and jax.process_count() > 1
        if self._multiproc:
            from nerf_tpu.parallel.distributed import host_shard_slice

            self._mesh = sharding.mesh
            self._host_sl = host_shard_slice(n_rand)
        elif sharding is not None:
            rep = jax.sharding.NamedSharding(
                sharding.mesh, jax.sharding.PartitionSpec()
            )
            self.images, self.poses, self.i_train, self.K = (
                jax.device_put(x, rep)
                for x in (self.images, self.poses, self.i_train, self.K)
            )
        self.key = key
        dH = int(self.H // 2 * precrop_frac)
        dW = int(self.W // 2 * precrop_frac)
        # crop bounds per ref run_nerf.py:738-745: rows in [H//2-dH, H//2+dH)
        self._crop = (self.H // 2 - dH, self.W // 2 - dW, 2 * dH, 2 * dW)
        self._full = (0, 0, self.H, self.W)
        out_sh = (
            None
            if (sharding is None or self._multiproc)
            else (sharding, sharding, sharding)
        )
        self._fn = jax.jit(
            _sample_image_rays, static_argnums=(4, 5, 6, 7), out_shardings=out_sh
        )

    def next_batch(self, step: int):
        self.key, sub = jax.random.split(self.key)
        crop = self._crop if step < self.precrop_iters else self._full
        out = self._fn(
            self.images, self.poses, self.i_train, self.K,
            self.H, self.W, self.n_rand, crop, sub,
        )
        if self._multiproc:
            from nerf_tpu.parallel.distributed import global_batch_from_host_shards

            sl = self._host_sl
            return global_batch_from_host_shards(
                self._mesh, tuple(np.asarray(a)[sl] for a in out)
            )
        return out

    # --- fused multi-step scan support (train/loop.py fuse_steps) ---

    def scan_supported(self) -> bool:
        return True

    def scan_per_step_sharding(self, mesh):
        """See BatchedRaySampler.scan_per_step_sharding."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if not self._multiproc:
            return None
        return NamedSharding(mesh, P(None, "data"))

    def ensure_epoch(self):
        pass  # no epoch state

    def max_chunk(self) -> int:
        return 1 << 30  # no epoch state; the driver bounds chunks elsewhere

    def scan_fn(self, step0: int):
        """Stable per-crop-phase sampler body (memoized so the driver's jit
        cache hits): batch = fn(args, sub). The crop is chunk-static, so the
        driver never lets a chunk cross the precrop boundary. Multi-process,
        the draws already happened host-side (scan_operands) and the
        per-step operand IS the (ro, rd, target) batch."""
        if self._multiproc:
            if not hasattr(self, "_scan_fn_mp"):
                self._scan_fn_mp = lambda args, op: op
            return self._scan_fn_mp
        crop = self._crop if step0 < self.precrop_iters else self._full
        if not hasattr(self, "_scan_fns"):
            self._scan_fns = {}
        if crop not in self._scan_fns:
            H, W, n_rand = self.H, self.W, self.n_rand

            def sample_fn(args, sub, _crop=crop):
                images, poses, i_train, K = args
                return _sample_image_rays(
                    images, poses, i_train, K, H, W, n_rand, _crop, sub
                )

            self._scan_fns[crop] = sample_fn
        return self._scan_fns[crop]

    def _vmapped_sampler(self, crop):
        """jit(vmap) of the per-step sampler over a [k] key axis, memoized
        per crop phase (multi-process scan_operands helper)."""
        if not hasattr(self, "_vfns"):
            self._vfns = {}
        if crop not in self._vfns:
            H, W, n_rand = self.H, self.W, self.n_rand

            def batch_k(images, poses, i_train, K, subs):
                return jax.vmap(
                    lambda s: _sample_image_rays(
                        images, poses, i_train, K, H, W, n_rand, crop, s
                    )
                )(subs)

            self._vfns[crop] = jax.jit(batch_k)
        return self._vfns[crop]

    def scan_operands(self, step0: int, k: int):
        """(args, per_step): the key draws are the exact split chain the
        per-step path would make (chain_split). The advanced key is only
        STAGED here; advance(k) commits it — symmetric with
        BatchedRaySampler, whose host state also moves only in advance(),
        so a failed/skipped fused chunk cannot desync the host key from the
        executed trajectory.

        Multi-process: every host runs the (tiny) k-step sampling program on
        its own devices with the same keys — identical draws everywhere —
        then contributes its host_shard_slice of each step's batch to ONE
        global [k, n_rand, ...] 'data'-sharded array, exactly the per-step
        next_batch feed amortized over the chunk."""
        self._staged_key, subs = chain_split(self.key, k)
        if self._multiproc:
            from jax.sharding import PartitionSpec as P

            from nerf_tpu.parallel.distributed import global_batch_from_host_shards

            crop = self._crop if step0 < self.precrop_iters else self._full
            outs = self._vmapped_sampler(crop)(
                self.images, self.poses, self.i_train, self.K, subs
            )
            sl = self._host_sl
            per_step = global_batch_from_host_shards(
                self._mesh,
                tuple(np.asarray(o)[:, sl.start : sl.stop] for o in outs),
                spec=P(None, "data"),
            )
            return (), per_step
        return (self.images, self.poses, self.i_train, self.K), subs

    def advance(self, k: int):
        self.key = self._staged_key


@partial(jax.jit, static_argnums=1)
def _chain_split_impl(key, k):
    def body(c, _):
        c2, sub = jax.random.split(c)
        return c2, sub

    return jax.lax.scan(body, key, None, length=k)


def chain_split(key: jax.Array, k: int):
    """K chained ``key, sub = split(key)`` draws in ONE device program.

    Returns (advanced_key, subs [k]) with exactly the sequence the per-step
    host loop would produce — the fused multi-step scan path
    (train/loop.py) stays draw-for-draw identical to the single-step loop.
    The jitted impl lives at module scope so the program compiles once per
    k, not once per call."""
    return _chain_split_impl(key, k)


def make_sampler(scene: Scene, cfg, key: jax.Array, sharding=None):
    """Pick the policy from the config (ref use_batching = not no_batching).

    ``sharding``: optional NamedSharding over the mesh 'data' axis; batches
    come out pre-sharded for the DP train step."""
    if cfg.no_batching:
        return ImageRaySampler(
            scene, cfg.N_rand, key, cfg.precrop_iters, cfg.precrop_frac,
            sharding=sharding,
        )
    return BatchedRaySampler(scene, cfg.N_rand, key, sharding=sharding)
