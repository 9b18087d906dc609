"""Volume-rendering compositor: raw network outputs -> pixel quantities.

Exact semantics of the reference ``raw2outputs`` (run_nerf.py:262-305):
- ``dists = diff(z_vals)`` with 1e10 appended, scaled by ``‖rays_d‖``
  (rays_d is NOT unit length — critical, run_nerf.py:280);
- ``rgb = sigmoid(raw[...,:3])``; optional Gaussian noise added to sigma
  *before* the ReLU; ``alpha = 1 - exp(-relu(sigma)·dist)``;
- transmittance = exclusive cumprod of ``(1 - alpha + 1e-10)``;
- ``depth = Σ w·z``; ``disp = 1/max(1e-10, depth/Σw)``; ``acc = Σw``;
- ``white_bkgd: rgb += (1 - acc)``.

TPU notes: everything here is VPU element-wise work plus a scan-structured
cumulative product along the (static, small) sample axis — XLA fuses the whole
thing into a couple of kernels. The transmittance recurrence is
associative-scan shaped, so it also composes blockwise (online compositing)
inside the fused Pallas render kernel (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RayOutputs:
    """Per-ray composited maps (pytree)."""

    rgb: jnp.ndarray  # [N_rays, 3]
    disp: jnp.ndarray  # [N_rays]
    acc: jnp.ndarray  # [N_rays]
    weights: jnp.ndarray  # [N_rays, N_samples]
    depth: jnp.ndarray  # [N_rays]


jax.tree_util.register_dataclass(
    RayOutputs, data_fields=["rgb", "disp", "acc", "weights", "depth"], meta_fields=[]
)


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """cumprod along last axis, shifted right with a leading 1 (ref run_nerf.py:295)."""
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x], axis=-1), axis=-1)[..., :-1]


def strict_upper_ones(S: int) -> jnp.ndarray:
    """U [S, S] with U[j, i] = 1 iff j < i, so (x @ U)_i = sum_{j<i} x_j
    (exclusive prefix) and (x @ U.T)_k = sum_{i>k} x_i (strict suffix).
    Shared by the matmul-scan path below and ops/fused_render.py's in-kernel
    online transmittance."""
    return jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))


def _sigma_with_noise(sigma, noise, raw_noise_std, key):
    """Optional pre-activation density noise (ref run_nerf.py:283-291)."""
    if noise is not None:
        return sigma + noise
    if raw_noise_std > 0.0:
        if key is None:
            raise ValueError("raw_noise_std>0 requires key or explicit noise")
        return sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * raw_noise_std
    return sigma


def _one_minus_alpha(alpha):
    """(1 - alpha) + 1e-10 with the floor intact: maximum() is a numerical
    no-op (alpha <= 1) but blocks XLA from reassociating the adds into
    (1.0 + 1e-10) - alpha == 1.0 - alpha, which loses the 1e-10 floor where
    alpha == 1 (observed on TPU; harmless under cumprod, fatal under the
    log of the matmul-scan path)."""
    return jnp.maximum(1.0 - alpha, 0.0) + 1e-10


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> RayOutputs:
    """Composite raw (r,g,b,sigma) samples into per-ray maps.

    Args:
        raw: [N_rays, N_samples, 4].
        z_vals: [N_rays, N_samples] sample depths.
        rays_d: [N_rays, 3] (unnormalized) ray directions.
        noise: explicit sigma-noise override [N_rays, N_samples]
            (parity-test hook, ref run_nerf.py:287-291).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = _sigma_with_noise(raw[..., 3], noise, raw_noise_std, key)

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    weights = alpha * exclusive_cumprod(_one_minus_alpha(alpha))

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RayOutputs(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights, depth=depth_map)


def raw2outputs_planes(
    raw4: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
    matmul_scan: bool = False,
) -> RayOutputs:
    """raw2outputs on channel-plane input: raw4 [4, N_rays, N_samples].

    Identical semantics to ``raw2outputs`` (ref run_nerf.py:262-305) but each
    channel is a full-lane [N_rays, N_samples] plane — the layout the fused
    kernel's planes-IO mode emits (ops/fused_mlp.py fused_query_rays_planes).
    Every op here (sigmoid, alpha, cumprod, the S-axis sums) runs on
    [N_rays, N_samples] arrays with the sample axis in lanes, instead of
    [.., 3]/[.., 4]-minor tensors that waste 125 of 128 lanes.

    ``matmul_scan=True`` replaces the two lane-SHIFTED constructions — the
    appended-1e10 ``diff(z)`` and the leading-1 exclusive cumprod — with
    shift-free MXU matmuls against constant [S, S] banded/triangular
    matrices: the shifted diff is exact (0/±1 coefficients), and the
    exclusive cumprod becomes ``exp(log(1-alpha+1e-10) @ strict_tril)`` (the
    same online-transmittance identity the fused render kernel uses,
    ops/fused_render.py). On TPU every lane-offset slice/pad on a
    [4096, 193] plane costs ~0.1 ms of vreg shuffles, and they appear in
    forward AND backward of both levels (~2.7 ms/step measured, docs/PERF.md
    round 4). The log/exp round trip perturbs weights at ~1e-6 relative —
    invisible under bf16 compute (~4e-3) — so the bf16 training path enables
    it and the f32 strict-parity path keeps the exact cumprod.
    """
    S = z_vals.shape[-1]
    nrm = jnp.linalg.norm(rays_d, axis=-1)[..., None]
    if matmul_scan:
        # z_next[i] = z[i+1] (0 beyond) via a superdiagonal selector; the
        # last lane is overwritten with the reference's 1e10 anyway.
        shift = jnp.eye(S, S, k=-1, dtype=z_vals.dtype)  # M[j+1, j]=1 -> out[i]=z[i+1]
        z_next = jnp.dot(
            z_vals, shift, precision=jax.lax.Precision.HIGHEST
        )
        last = jnp.arange(S) == S - 1
        dists = jnp.where(last, 1e10, z_next - z_vals) * nrm
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        )
        dists = dists * nrm

    rgb = jax.nn.sigmoid(raw4[:3])  # [3, N_rays, N_samples]
    sigma = _sigma_with_noise(raw4[3], noise, raw_noise_std, key)

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    one_m_alpha = _one_minus_alpha(alpha)
    if matmul_scan:
        t_excl = jnp.exp(
            jnp.dot(
                jnp.log(one_m_alpha), strict_upper_ones(S),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        weights = alpha * t_excl
    else:
        weights = alpha * exclusive_cumprod(one_m_alpha)

    rgb_map = jnp.sum(weights[None] * rgb, axis=-1).T  # [N_rays, 3]
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RayOutputs(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights, depth=depth_map)
