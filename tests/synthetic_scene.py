"""Procedural test scenes.

- ``make_scene``: in-memory Scene with images volume-rendered from an
  analytic density field (a soft sphere), so a NeRF can genuinely fit it.
- ``write_blender_dataset``: the same scene written to disk in the blender
  transforms_{split}.json + PNG format, to exercise the real loader.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_tpu.data.scene import Scene, default_intrinsics
from nerf_tpu.geom.poses import pose_spherical
from nerf_tpu.geom.rays import get_rays_np


def _analytic_density(pts):
    """Soft sphere of radius 1 at origin; rgb varies with position."""
    r2 = np.sum(pts**2, -1)
    sigma = 8.0 * np.exp(-3.0 * r2)
    rgb = 0.5 + 0.5 * np.tanh(pts)
    return sigma, rgb


def _render_gt(H, W, K, c2w, near=2.0, far=6.0, n_samples=96):
    rays_o, rays_d = get_rays_np(H, W, K, c2w)
    t = np.linspace(near, far, n_samples, dtype=np.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    sigma, rgb = _analytic_density(pts)
    dists = np.diff(t, append=t[-1] + 1e10).astype(np.float32)
    dists = dists * np.linalg.norm(rays_d, axis=-1)[..., None]
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    w = alpha * trans
    img = np.sum(w[..., None] * rgb, axis=-2)
    acc = np.sum(w, axis=-1, keepdims=True)
    return (img + (1.0 - acc)).astype(np.float32)  # white background


def make_scene(n_train=6, n_test=2, H=40, W=40, seed=0):
    focal = 0.8 * W
    K = default_intrinsics(H, W, focal)
    rng = np.random.default_rng(seed)
    thetas = rng.uniform(-180, 180, n_train + n_test)
    phis = rng.uniform(-60, -20, n_train + n_test)
    poses = np.stack([pose_spherical(t, p, 4.0) for t, p in zip(thetas, phis)], 0)
    images = np.stack([_render_gt(H, W, K, p[:3, :4]) for p in poses], 0)
    return Scene(
        images=images,
        poses=poses[:, :3, :4].astype(np.float32),
        render_poses=poses[:n_test, :3, :4],
        hwf=(H, W, focal),
        K=K,
        i_train=np.arange(n_train),
        i_val=np.arange(n_train, n_train + n_test),
        i_test=np.arange(n_train, n_train + n_test),
        near=2.0,
        far=6.0,
    )


def write_blender_dataset(basedir, n_train=3, n_val=2, n_test=2, H=32, W=32):
    """Write a blender-format dataset (transforms_*.json + PNGs)."""
    import imageio.v2 as imageio

    camera_angle_x = 2.0 * np.arctan(0.5 * W / (0.8 * W))
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    K = default_intrinsics(H, W, focal)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    rng = np.random.default_rng(1)
    for split, n in counts.items():
        frames = []
        os.makedirs(os.path.join(basedir, split), exist_ok=True)
        for i in range(n):
            theta, phi = rng.uniform(-180, 180), rng.uniform(-60, -20)
            pose = pose_spherical(theta, phi, 4.0)
            img = _render_gt(H, W, K, pose[:3, :4])
            rgba = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(
                os.path.join(basedir, f"{rel}.png"),
                (np.clip(rgba, 0, 1) * 255).astype(np.uint8),
            )
            frames.append(
                {"file_path": rel, "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": float(camera_angle_x), "frames": frames}
        with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return basedir
