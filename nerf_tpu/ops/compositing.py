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
    sigma = raw[..., 3]
    if noise is not None:
        sigma = sigma + noise
    elif raw_noise_std > 0.0:
        if key is None:
            raise ValueError("raw_noise_std>0 requires key or explicit noise")
        sigma = sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    weights = alpha * exclusive_cumprod(1.0 - alpha + 1e-10)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RayOutputs(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights, depth=depth_map)
