"""The coarse/fine volume renderer.

Re-design of the reference's L3/L4 (render_rays run_nerf.py:308-418; render /
batchify_rays run_nerf.py:54-134) as pure jittable functions:

- hyperparameters ride in a frozen ``RenderSettings`` (jit-static) instead of
  the reference's dict-of-closures ``render_kwargs``;
- randomness is an explicit key, split per consumer; parity tests can inject
  the reference's exact numpy streams via ``overrides``;
- ray chunking survives only for full-frame eval (``render_image``), as a
  ``lax.map`` over fixed-size chunks — inside one jit, not a Python loop;
- the sample_pdf output is wrapped in stop_gradient (ref detach,
  run_nerf.py:394) so no gradient flows through fine sample positions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.geom.rays import get_rays, ndc_rays
from nerf_tpu.ops.compositing import raw2outputs, raw2outputs_planes
from nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals
from nerf_tpu.render.network import NeRFModel, query_raw


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static rendering hyperparameters (ref render_kwargs, run_nerf.py:237-247)."""

    n_samples: int = 64
    n_importance: int = 0
    perturb: bool = True
    use_viewdirs: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    lindisp: bool = False
    ndc: bool = False
    retraw: bool = False

    def eval_mode(self) -> "RenderSettings":
        """Test-time variant: no jitter, no sigma noise (ref run_nerf.py:255-257)."""
        return dataclasses.replace(self, perturb=False, raw_noise_std=0.0, retraw=False)


def render_rays(
    params: Dict,
    model: NeRFModel,
    rs: RenderSettings,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: Optional[jax.Array] = None,
    overrides: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Volume-render a batch of rays (ref render_rays, run_nerf.py:308-418).

    Args:
        params: {"coarse": pytree, "fine": pytree or absent}.
        rays_o, rays_d: [R, 3] (rays_d NOT normalized).
        viewdirs: [R, 3] unit directions or None.
        near, far: [R] per-ray bounds.
        key: RNG key (required when rs.perturb or rs.raw_noise_std>0).
        overrides: parity-test hooks {t_rand, noise0, noise1, u} replacing the
            corresponding random draws (ref pytest streams, SURVEY.md §4).

    Returns dict with rgb_map/disp_map/acc_map (+ raw, rgb0/disp0/acc0/z_std).
    """
    overrides = overrides or {}
    if key is None:
        key = jax.random.key(0)
    k_jitter, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)

    needs_rand = rs.perturb and "t_rand" not in overrides
    z_vals = stratified_z_vals(
        near,
        far,
        rs.n_samples,
        lindisp=rs.lindisp,
        perturb=rs.perturb,
        key=k_jitter if needs_rand else None,
        t_rand=overrides.get("t_rand"),
    )

    def run_level(level: str, z: jnp.ndarray, noise_key, noise_override):
        p_level = params.get(level) or params["coarse"]
        mlp_cfg = model.mlp_config(level)

        if model.fused_render and viewdirs is not None and not rs.retraw:
            # retired to experimental/ (r5): 16x slower than the split path
            # at the large-S regime it was kept for (docs/PERF.md round 5)
            from nerf_tpu.experimental import fused_render  # lazy: pallas import

            if fused_render.supports(mlp_cfg, model.pe_pts, model.pe_views,
                                     z.shape[-1]):
                noise = noise_override
                if noise is None and rs.raw_noise_std > 0.0:
                    # identical draw to raw2outputs (ops/compositing.py:82)
                    noise = (
                        jax.random.normal(noise_key, z.shape, z.dtype)
                        * rs.raw_noise_std
                    )
                compute_dtype = (
                    jnp.bfloat16 if model.compute_dtype == "bfloat16"
                    else jnp.float32
                )
                out = fused_render.fused_render_level(
                    p_level, mlp_cfg, model.pe_pts, model.pe_views,
                    rays_o, rays_d, viewdirs, z, noise, rs.white_bkgd,
                    compute_dtype=compute_dtype,
                )
                return None, out

        # Rays and sample positions are never differentiated through the MLP:
        # no param-gradient path crosses them (fine z is stop-gradded below,
        # ref run_nerf.py:394, and rays are data). stop_gradient makes that a
        # hard guarantee, and input_grads=False lets the fused backward
        # kernel skip its whole input-grad branch (docs/PERF.md).
        if model.fused and viewdirs is not None:
            from nerf_tpu.ops import fused_mlp  # lazy: pallas import

            if (
                fused_mlp.supports(mlp_cfg, model.pe_pts, model.pe_views)
                and z.shape[-1] % 8 == 0
                and z.shape[-1] > 1
            ):
                # raygen + planes-IO mode: pts = o + d*z is computed INSIDE
                # the kernel (identical f32 madd) and raw comes out as four
                # full-lane [R, S] channel planes — neither the [R*S, 3]
                # points tensor nor the [R*S, 4] raw tensor exists in HBM
                # (docs/PERF.md round 4: ~5.5 ms/step of 3/4-of-128-lane
                # broadcast/madd/relayout traffic eliminated).
                compute_dtype = (
                    jnp.bfloat16 if model.compute_dtype == "bfloat16"
                    else jnp.float32
                )
                sg = jax.lax.stop_gradient
                raw4 = fused_mlp.fused_query_rays_planes(
                    p_level, mlp_cfg, model.pe_pts, model.pe_views,
                    sg(rays_o), sg(rays_d), sg(viewdirs), sg(z),
                    compute_dtype=compute_dtype,
                )
                out = raw2outputs_planes(
                    raw4,
                    z,
                    rays_d,
                    raw_noise_std=rs.raw_noise_std,
                    white_bkgd=rs.white_bkgd,
                    key=noise_key,
                    noise=noise_override,
                    # shift-free MXU scan on the bf16 path (~1e-6 rel on
                    # weights, invisible under bf16); exact cumprod in f32
                    matmul_scan=(model.compute_dtype == "bfloat16"),
                )
                raw = jnp.moveaxis(raw4, 0, -1) if rs.retraw else None
                return raw, out

        pts = rays_o[..., None, :] + rays_d[..., None, :] * z[..., :, None]
        pts = jax.lax.stop_gradient(pts)
        vd = None if viewdirs is None else jax.lax.stop_gradient(viewdirs)
        raw = query_raw(p_level, mlp_cfg, model, pts, vd, input_grads=False)
        out = raw2outputs(
            raw,
            z,
            rays_d,
            raw_noise_std=rs.raw_noise_std,
            white_bkgd=rs.white_bkgd,
            key=noise_key,
            noise=noise_override,
        )
        return raw, out

    raw, coarse = run_level("coarse", z_vals, k_noise0, overrides.get("noise0"))

    ret = {"rgb_map": coarse.rgb, "disp_map": coarse.disp, "acc_map": coarse.acc}

    if rs.n_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            z_mid,
            coarse.weights[..., 1:-1],
            rs.n_importance,
            det=not rs.perturb,
            key=k_pdf,
            u=overrides.get("u"),
        )
        z_samples = jax.lax.stop_gradient(z_samples)  # ref detach run_nerf.py:394
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        raw, fine = run_level("fine", z_all, k_noise1, overrides.get("noise1"))
        ret = {
            "rgb_map": fine.rgb,
            "disp_map": fine.disp,
            "acc_map": fine.acc,
            "rgb0": coarse.rgb,
            "disp0": coarse.disp,
            "acc0": coarse.acc,
            "z_std": jnp.std(z_samples, axis=-1),
        }
    if rs.retraw:
        ret["raw"] = raw
    return ret


def prepare_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rs: RenderSettings,
    H: int,
    W: int,
    focal: float,
    near: float,
    far: float,
    viewdirs_from: Optional[jnp.ndarray] = None,
):
    """Viewdirs + NDC + flattening (ref render(), run_nerf.py:102-123).

    ``viewdirs_from`` supports the c2w_staticcam visualization path
    (run_nerf.py:105-107): directions for shading taken from a different
    camera than the rendered rays.
    """
    viewdirs = None
    if rs.use_viewdirs:
        vd = viewdirs_from if viewdirs_from is not None else rays_d
        viewdirs = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    if rs.ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    near_v = jnp.full(rays_o.shape[:1], near, rays_o.dtype)
    far_v = jnp.full(rays_o.shape[:1], far, rays_o.dtype)
    return rays_o, rays_d, viewdirs, near_v, far_v


def render_image(
    params: Dict,
    model: NeRFModel,
    rs: RenderSettings,
    H: int,
    W: int,
    K,
    c2w,
    near: float,
    far: float,
    chunk: int = 1024 * 32,
    key: Optional[jax.Array] = None,
    c2w_staticcam=None,
) -> Dict[str, jnp.ndarray]:
    """Render a full H×W frame, chunked via lax.map (ref render + batchify_rays).

    Chunking is a memory/latency trade only; results are identical
    (ref docstring run_nerf.py:78-79).
    """
    rays_o, rays_d = get_rays(H, W, K, c2w)
    viewdirs_from = None
    if c2w_staticcam is not None:
        # staticcam visualization: shade with c2w's directions, render from
        # c2w_staticcam's rays (ref run_nerf.py:105-107)
        viewdirs_from = rays_d
        rays_o, rays_d = get_rays(H, W, K, c2w_staticcam)
    focal = float(K[0][0]) if not hasattr(K, "shape") else K[0, 0]
    rays_o, rays_d, viewdirs, near_v, far_v = prepare_rays(
        rays_o, rays_d, rs, H, W, focal, near, far, viewdirs_from
    )

    out = render_rays_chunked(
        params, model, rs, rays_o, rays_d, viewdirs, near_v, far_v,
        chunk=chunk, key=key,
    )
    return {
        k: v.reshape(H, W, *v.shape[1:]) for k, v in out.items()
    }


def render_rays_chunked(
    params,
    model: NeRFModel,
    rs: RenderSettings,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    near_v: jnp.ndarray,
    far_v: jnp.ndarray,
    chunk: int = 1024 * 32,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a flat ray batch via lax.map over fixed-size chunks (the
    jittable core shared by render_image and the mesh-sharded frame
    renderer). Returns flat [N, ...] outputs; chunk padding is trimmed."""
    n = rays_o.shape[0]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad_to(x):
        if x is None:
            return None
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], 0) if pad else x

    rays_o, rays_d, viewdirs, near_v, far_v = (
        pad_to(rays_o), pad_to(rays_d), pad_to(viewdirs), pad_to(near_v), pad_to(far_v)
    )
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, n_chunks)

    def chunk_fn(args):
        ro, rd, vd, nr, fr, k = args
        return render_rays(params, model, rs, ro, rd, vd, nr, fr, key=k)

    def reshape_chunks(x):
        return x.reshape(n_chunks, chunk, *x.shape[1:])

    operands = (
        reshape_chunks(rays_o),
        reshape_chunks(rays_d),
        reshape_chunks(viewdirs) if viewdirs is not None else jnp.zeros((n_chunks, chunk, 0)),
        reshape_chunks(near_v),
        reshape_chunks(far_v),
        keys,
    )
    if viewdirs is None:
        def chunk_fn(args):  # noqa: F811 - no-viewdirs variant
            ro, rd, _, nr, fr, k = args
            return render_rays(params, model, rs, ro, rd, None, nr, fr, key=k)

    out = jax.lax.map(chunk_fn, operands)
    return {k: v.reshape(n_chunks * chunk, *v.shape[2:])[:n] for k, v in out.items()}


def make_frame_renderer(
    model: NeRFModel,
    rs: RenderSettings,
    H: int,
    W: int,
    K,
    near: float,
    far: float,
    chunk: int = 1024 * 32,
    mesh=None,
):
    """One jitted (params, c2w) -> frame program for eval/video paths.

    The eager per-frame ``render_image`` dispatches its preamble op-by-op and
    re-traces the lax.map per call site; for a pose PATH (ref render_path,
    run_nerf.py:137-175) that overhead — plus the host sync after every
    frame — serializes device and host. This wraps the whole frame in ONE
    jit (compiled once per (H, W, chunk) shape); async dispatch then lets
    the caller enqueue frame i+1 while fetching frame i (see
    train/loop.py render_path's depth-2 pipeline).

    ``mesh``: a ('data', ...) device mesh. The frame's H*W ray axis is then
    sharded over 'data' via shard_map (each device chunk-renders its ray
    shard; the reference's render_path is single-device, run_nerf.py:137-175,
    and without this the testset/video renders of a multi-chip training run
    leave N-1 chips idle). shard_map rather than jit sharding propagation
    because the fused Pallas kernel is not GSPMD-partitionable. Intended for
    the deterministic eval settings (rs.eval_mode()); with stochastic
    settings the per-shard chunk keys differ from the single-device
    program's, so results would not match it draw-for-draw.
    """
    K_j = jnp.asarray(K)

    if mesh is not None and (rs.perturb or rs.raw_noise_std > 0.0):
        # per-shard randomness is a fixed key below; stochastic settings
        # would draw identical correlated noise on every shard and diverge
        # from the single-device program — this renderer is eval-only
        raise ValueError(
            "mesh-sharded frame renderer requires deterministic settings "
            "(rs.eval_mode()): got perturb or raw_noise_std > 0"
        )

    if mesh is None:
        @jax.jit
        def render_frame(params, c2w):
            return render_image(
                params, model, rs, H, W, K_j, c2w, near, far, chunk=chunk
            )

        return render_frame

    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape["data"]
    n = H * W
    per = -(-n // n_dev)
    pad_total = per * n_dev - n
    focal = float(np.asarray(K)[0, 0])

    def shard_body(params, ro, rd, vd, nv, fv):
        vd = vd if rs.use_viewdirs else None
        return render_rays_chunked(
            params, model, rs, ro, rd, vd, nv, fv,
            chunk=min(chunk, per), key=jax.random.key(0),
        )

    @jax.jit
    def render_frame(params, c2w):
        rays_o, rays_d = get_rays(H, W, K_j, c2w)
        ro, rd, vd, nv, fv = prepare_rays(
            rays_o, rays_d, rs, H, W, focal, near, far
        )
        if vd is None:
            vd = jnp.zeros((ro.shape[0], 0), ro.dtype)

        def pad_rows(x):
            if not pad_total:
                return x
            return jnp.concatenate([x, jnp.repeat(x[-1:], pad_total, 0)], 0)

        args = tuple(pad_rows(a) for a in (ro, rd, vd, nv, fv))
        out = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(),) + (P("data"),) * 5,
            out_specs=P("data"),
            # vma checking can't see through pallas_call (the fused kernel)
            check_vma=False,
        )(params, *args)
        return {
            k: v[:n].reshape(H, W, *v.shape[1:]) for k, v in out.items()
        }

    return render_frame
