"""Camera-ray generation and NDC transform (pure jnp).

Convention parity with the reference (run_nerf_helpers.py:153-192): pixel
centers at integer coordinates, OpenGL camera frame (x right, y up, z
backward), camera-space directions ``[(i-cx)/fx, -(j-cy)/fy, -1]`` rotated by
``c2w[:3,:3]``; ray directions are NOT normalized (their norm scales the
compositing distances, run_nerf.py:280).

TPU notes: ray generation for a full H×W frame is a broadcast + one 3×3
contraction — negligible next to the MLP; it lives inside jit so eval renders
never bounce through the host. A numpy twin is provided for the one-time
dataset-wide ray precompute (ref get_rays_np, run_nerf_helpers.py:165-172).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K, c2w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for a full frame. Returns (rays_o[H,W,3], rays_d[H,W,3])."""
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], -1
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy twin of get_rays for host-side dataset precompute."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = np.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
    )
    rays_d = np.sum(dirs[..., np.newaxis, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], np.shape(rays_d))
    return rays_o, rays_d


def ndc_rays(
    H: int, W: int, focal: float, near: float, rays_o: jnp.ndarray, rays_d: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift ray origins to the z=-near plane and project to NDC.

    Used for LLFF forward-facing scenes (ref run_nerf_helpers.py:175-192,
    applied at run_nerf.py:112-114 with near=1).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
