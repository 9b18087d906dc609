"""The jitted training step.

Replaces the reference's eager loop body (run_nerf.py:759-784): forward
coarse+fine render, ``loss = mse(fine) + mse(coarse)`` (run_nerf.py:765-772),
Adam with the manual exponential decay ``lr = lrate * 0.1^(step/(decay*1000))``
(run_nerf.py:780-784) expressed as an optax schedule, all inside one jit with
donated state.

TPU notes: the whole step — ray->pts, posenc, both MLP passes, compositing,
backward, Adam — is one XLA program; there is no host sync inside. Under a
sharded mesh the same function is jitted with rays sharded over the ``data``
axis and params replicated; XLA inserts the gradient all-reduce (psum) and
overlaps it with the backward pass.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings, render_rays
from nerf_tpu.utils.metrics import img2mse, mse2psnr


@dataclasses.dataclass
class TrainState:
    """Pytree train state (params + Adam moments + step counter)."""

    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray  # int32 scalar


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def lr_schedule(lrate: float, lrate_decay: int) -> optax.Schedule:
    """lr(step) = lrate * 0.1^(step / (lrate_decay*1000)) — ref run_nerf.py:780-784.

    The reference writes the lr for step t+1 after completing step t with
    ``global_step = t``; optax's count at update t is t, giving the identical
    sequence (first update at count 0 -> lr = lrate).
    """
    return optax.exponential_decay(
        init_value=lrate,
        transition_steps=lrate_decay * 1000,
        decay_rate=0.1,
        staircase=False,
    )


def make_optimizer(lrate: float, lrate_decay: int) -> optax.GradientTransformation:
    # Adam(betas=(0.9, 0.999), eps=1e-8) — ref run_nerf.py:207
    return optax.adam(lr_schedule(lrate, lrate_decay), b1=0.9, b2=0.999, eps=1e-8)


def init_train_state(
    params: Dict, lrate: float, lrate_decay: int, start_step: int = 0
) -> TrainState:
    tx = make_optimizer(lrate, lrate_decay)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(start_step, jnp.int32),
    )


def draw_overrides(key: jax.Array, n_rays: int, rs: RenderSettings) -> Dict:
    """Pre-draw every random stream ``render_rays`` would consume.

    Key-split order, shapes, and dtypes exactly match the in-renderer draws
    (renderer.py:77 split into jitter/noise0/pdf/noise1), so passing the
    result as ``overrides`` is bit-identical to letting render_rays draw.

    Why: in the sharded train step the draws happen OUTSIDE shard_map on the
    GLOBAL [n_rays] batch and are sharded over 'data' as plain operands —
    making sharded training (a) bit-equal to single-chip and (b) invariant to
    the mesh shape (SURVEY.md §7 "multi-host determinism").
    """
    k_jitter, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)
    ov: Dict = {}
    if rs.perturb:
        ov["t_rand"] = jax.random.uniform(
            k_jitter, (n_rays, rs.n_samples), jnp.float32
        )
    if rs.raw_noise_std > 0.0:
        ov["noise0"] = (
            jax.random.normal(k_noise0, (n_rays, rs.n_samples), jnp.float32)
            * rs.raw_noise_std
        )
    if rs.n_importance > 0:
        if rs.perturb:  # det (perturb==0) uses linspace: no random draw
            ov["u"] = jax.random.uniform(
                k_pdf, (n_rays, rs.n_importance), jnp.float32
            )
        if rs.raw_noise_std > 0.0:
            ov["noise1"] = (
                jax.random.normal(
                    k_noise1, (n_rays, rs.n_samples + rs.n_importance), jnp.float32
                )
                * rs.raw_noise_std
            )
    return ov


def loss_fn(
    params: Dict,
    model: NeRFModel,
    rs: RenderSettings,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    near: jnp.ndarray,
    far: jnp.ndarray,
    target: jnp.ndarray,
    key: Optional[jax.Array] = None,
    overrides: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = render_rays(
        params, model, rs, rays_o, rays_d, viewdirs, near, far, key=key,
        overrides=overrides,
    )
    img_loss = img2mse(out["rgb_map"], target)
    loss = img_loss
    aux = {"psnr": mse2psnr(img_loss), "img_loss": img_loss}
    if "rgb0" in out:  # coarse term only when N_importance>0 (ref run_nerf.py:770-772)
        img_loss0 = img2mse(out["rgb0"], target)
        loss = loss + img_loss0
        aux["img_loss0"] = img_loss0
        aux["psnr0"] = mse2psnr(img_loss0)
    aux["loss"] = loss
    return loss, aux


def make_train_step_core(
    model: NeRFModel,
    rs: RenderSettings,
    lrate: float,
    lrate_decay: int,
    hwf=None,
    axis_name: Optional[str] = None,
    hwf_operand: bool = False,
):
    """The per-shard train-step body, randomness pre-drawn by the caller.

    Returned fn: (state, rays_o, rays_d, near, far, target, overrides)
    -> (state, aux). With ``axis_name`` set it is a shard_map body: gradients
    and mse terms are pmean-reduced over that mesh axis (the DP all-reduce,
    riding ICI), PSNRs recomputed from the global mse so aux matches
    single-chip exactly; the Adam update then runs replicated per shard.

    Viewdirs derive from the RAW rays_d (normalization) and, on the LLFF
    forward-facing path, the marching rays are NDC-transformed afterwards —
    matching the reference's render() preamble order (run_nerf.py:102-114).
    ``hwf=(H, W, focal)`` is required when rs.ndc. With ``hwf_operand`` the
    fn instead takes a trailing ``hwf [3]`` array argument (traced scalars:
    ndc_rays is pure arithmetic in H/W/focal) — the multi-scene vmap path,
    where every scene has its own intrinsics (parallel/multi_scene.py).
    """
    tx = make_optimizer(lrate, lrate_decay)
    if rs.ndc and hwf is None and not hwf_operand:
        raise ValueError("rs.ndc=True requires hwf=(H, W, focal)")

    def core(state: TrainState, rays_o, rays_d, near, far, target, overrides,
             hwf_arr=None):
        viewdirs = None
        if rs.use_viewdirs:
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        if rs.ndc:
            from nerf_tpu.geom.rays import ndc_rays

            if hwf_operand:
                H, W, focal = hwf_arr[0], hwf_arr[1], hwf_arr[2]
            else:
                H, W, focal = hwf
            rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, model, rs, rays_o, rays_d, viewdirs, near, far, target,
            None, overrides,
        )
        if axis_name is not None:
            # per-LEVEL collectives (one pmean per network), not one
            # whole-tree pmean: a whole-tree pmean is combined by XLA into
            # ONE tuple all-reduce that cannot start before the LAST
            # gradient (SCALING_r04 NOTE). Split, the fine net's all-reduce
            # depends only on the fine backward — which completes one full
            # coarse-backward (~5.8 ms, docs/PERF.md) before the step ends —
            # so the latency-hiding scheduler can overlap it with the
            # coarse backward. The optimization barrier chains each later
            # level's INPUT on the previous level's reduced OUTPUT; the
            # all-reduce combiner cannot merge ops that depend on each
            # other, so the split survives compilation (verified in the
            # compiled HLO by tools/scaling_hlo.py). The barrier is an
            # identity on values; the implied order (fine AR before coarse
            # AR) is the order the overlap wants anyway.
            order = [k for k in ("fine", "coarse") if k in grads]
            order += [k for k in grads if k not in order]
            reduced = {}
            prev = None
            for k in order:
                gin = grads[k]
                if prev is not None:
                    gin, _ = jax.lax.optimization_barrier((gin, prev))
                reduced[k] = jax.lax.pmean(gin, axis_name)
                prev = reduced[k]
            grads = {k: reduced[k] for k in grads}
            aux = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), aux)
            # PSNR is a log of the mse: recompute from the globally averaged
            # mse (pmean of per-shard psnr would NOT equal the global psnr)
            aux["psnr"] = mse2psnr(aux["img_loss"])
            if "psnr0" in aux:
                aux["psnr0"] = mse2psnr(aux["img_loss0"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), aux

    return core


def make_train_step_fn(
    model: NeRFModel,
    rs: RenderSettings,
    lrate: float,
    lrate_decay: int,
    hwf=None,
    hwf_operand: bool = False,
):
    """Build the UN-jitted train step body (jitted by make_train_step for
    single-chip, or vmapped by parallel.multi_scene).

    Returned fn: (state, rays_o, rays_d, near, far, target, key) -> (state,
    aux) — plus a trailing ``hwf [3]`` argument when ``hwf_operand`` (the
    multi-scene NDC path; see make_train_step_core).
    """
    core = make_train_step_core(
        model, rs, lrate, lrate_decay, hwf, hwf_operand=hwf_operand
    )

    if hwf_operand:
        def step_fn(state: TrainState, rays_o, rays_d, near, far, target, key,
                    hwf_arr):
            key = jax.random.fold_in(key, state.step)
            overrides = draw_overrides(key, rays_o.shape[0], rs)
            return core(state, rays_o, rays_d, near, far, target, overrides,
                        hwf_arr)

        return step_fn

    def step_fn(state: TrainState, rays_o, rays_d, near, far, target, key):
        key = jax.random.fold_in(key, state.step)
        overrides = draw_overrides(key, rays_o.shape[0], rs)
        return core(state, rays_o, rays_d, near, far, target, overrides)

    return step_fn


def make_train_step(
    model: NeRFModel,
    rs: RenderSettings,
    lrate: float,
    lrate_decay: int,
    donate: bool = True,
    hwf=None,
):
    """Single-chip jitted train step (see make_train_step_fn for signature)."""
    step_fn = make_train_step_fn(model, rs, lrate, lrate_decay, hwf)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
