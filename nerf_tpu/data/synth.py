"""Procedural benchmark scene with analytic ground truth.

The reference's convergence evidence is trained on downloaded lego/fern data
(download_example_data.sh; README.md:49,59). This build environment has no
network egress, so the equivalent evidence comes from a procedurally
generated scene of comparable difficulty: a field of ~48 sharp ellipsoid
density lobes with multi-octave albedo texture and a view-dependent specular
term, volume-rendered ANALYTICALLY with the exact compositing formula the
renderer implements (ref run_nerf.py:262-305). Ground truth is therefore
noise-free and exactly representable by the radiance-field model class, so
holdout PSNR measures pure optimization/convergence quality.

Everything is seeded: the same seed always generates the same scene, so the
committed generator reproduces the committed benchmark numbers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """A sum-of-ellipsoid-Gaussians radiance field (arrays are numpy)."""

    centers: np.ndarray  # [K, 3]
    inv_scales: np.ndarray  # [K, 3] (1/sigma per axis)
    amps: np.ndarray  # [K]
    colors: np.ndarray  # [K, 3]


# density tail cutoff: sigma = max(0, sum_k g_k - TAU). Gaussians never reach
# zero; without the cutoff their tails tint the whole frustum and there is no
# clean white background for the white_bkgd recipe to composite against.
SIGMA_TAU = 3.0


def make_field(seed: int = 0, n_prims: int = 48, backdrop: bool = False) -> FieldParams:
    rng = np.random.default_rng(seed)
    # centers in a ball of radius 0.85: with scales <= 0.25 and the TAU
    # cutoff the object stays inside the ~1.4 half-extent the lego-fov
    # camera sees at radius 4, leaving visible white background
    dirs = rng.standard_normal((n_prims, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = 0.85 * rng.uniform(0.0, 1.0, (n_prims, 1)) ** (1 / 3)
    centers = dirs * radii
    scales = rng.uniform(0.05, 0.18, (n_prims, 3))
    scales[: n_prims // 6] = rng.uniform(0.2, 0.3, (n_prims // 6, 3))
    amps = rng.uniform(60.0, 160.0, n_prims)
    # saturated base colors
    colors = rng.uniform(0.0, 1.0, (n_prims, 3))
    colors = 0.15 + 0.85 * colors / colors.max(axis=-1, keepdims=True)

    if backdrop:
        # A dense wall of flattened Gaussians at z = -1.45, wide enough to
        # fill the forward-facing frustum. Why: the fern recipe composites
        # empty space to BLACK (no white_bkgd, configs/fern.txt), so a scene
        # whose GT is composited on white leaves ~60% of pixels physically
        # unexplainable and BOTH this framework and the live reference
        # collapse to a ~16.7 dB white-haze fit on it (measured,
        # CONVERGENCE.md). A real forward-facing photo has content on every
        # ray; the wall reproduces that property. Pastel per-tile albedo +
        # the global texture term give the wall learnable structure.
        gx, gy = np.meshgrid(np.arange(-4, 5) * 0.85, np.arange(-3, 4) * 0.8)
        n_wall = gx.size
        wall_centers = np.stack(
            [gx.ravel(), gy.ravel(), np.full(n_wall, -1.45)], -1
        )
        wall_scales = np.tile(np.array([[0.55, 0.52, 0.06]]), (n_wall, 1))
        wall_amps = np.full(n_wall, 300.0)
        wall_colors = 0.72 + 0.26 * rng.uniform(0.0, 1.0, (n_wall, 3))
        centers = np.concatenate([centers, wall_centers], 0)
        scales = np.concatenate([scales, wall_scales], 0)
        amps = np.concatenate([amps, wall_amps], 0)
        colors = np.concatenate([colors, wall_colors], 0)

    return FieldParams(
        centers=centers.astype(np.float32),
        inv_scales=(1.0 / scales).astype(np.float32),
        amps=amps.astype(np.float32),
        colors=colors.astype(np.float32),
    )


def field_sigma_rgb(fp: FieldParams, pts: jnp.ndarray, viewdirs: jnp.ndarray):
    """Analytic (sigma, rgb) at ``pts`` [..., 3] seen along ``viewdirs`` [..., 3].

    rgb = density-weighted primitive albedo, modulated by a two-octave
    sinusoidal texture, plus a Blinn-style specular lobe off the analytic
    density normal — exercising both the positional and the view branch of
    the NeRF MLP.
    """
    c = jnp.asarray(fp.centers)  # [K, 3]
    inv_s = jnp.asarray(fp.inv_scales)
    amps = jnp.asarray(fp.amps)
    cols = jnp.asarray(fp.colors)

    d = (pts[..., None, :] - c) * inv_s  # [..., K, 3]
    g = amps * jnp.exp(-0.5 * jnp.sum(d * d, -1))  # [..., K]
    sigma = jnp.maximum(jnp.sum(g, -1) - SIGMA_TAU, 0.0)  # [...], tails cut

    # analytic density gradient -> surface-ish normal
    grad = -jnp.sum((g[..., None] * d * inv_s), -2)  # [..., 3]
    n = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-6)

    w = g / (jnp.sum(g, -1, keepdims=True) + 1e-9)
    albedo = jnp.einsum("...k,kc->...c", w, cols)
    tex = 1.0 + 0.25 * jnp.sin(9.0 * pts).sum(-1, keepdims=True) * jnp.cos(
        17.0 * pts[..., :1]
    )
    spec = 0.35 * jnp.maximum(0.0, jnp.sum(-viewdirs * n, -1, keepdims=True)) ** 16
    rgb = jnp.clip(albedo * tex + spec, 0.0, 1.0)
    return sigma, rgb


def render_gt_rays(
    fp: FieldParams,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float = 2.0,
    far: float = 6.0,
    n_samples: int = 384,
):
    """Exact-formula volume render of the analytic field (white background).

    Matches ops/compositing.py semantics: dists scaled by ||rays_d||, alpha =
    1 - exp(-sigma*dist), exclusive-cumprod transmittance (+1e-10), white
    background add (ref run_nerf.py:262-305).
    """
    t = jnp.linspace(near, far, n_samples, dtype=jnp.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    vd = jnp.broadcast_to(vd[..., None, :], pts.shape)
    sigma, rgb = field_sigma_rgb(fp, pts, vd)
    dists = jnp.diff(t)
    dists = jnp.concatenate([dists, jnp.full((1,), 1e10, jnp.float32)])
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    w = alpha * trans
    img = jnp.sum(w[..., None] * rgb, -2)
    acc = jnp.sum(w, -1, keepdims=True)
    return img + (1.0 - acc)  # white background


@partial(jax.jit, static_argnums=(6, 7, 8))
def _gt_chunk(centers, inv_scales, amps, colors, ro, rd, near, far, n_samples):
    fp = FieldParams(centers, inv_scales, amps, colors)
    return render_gt_rays(fp, ro, rd, near=near, far=far, n_samples=n_samples)


def scale_field(fp: FieldParams, s: float) -> FieldParams:
    """Geometrically scale a field by ``s``: Gaussian centers/extents scale
    exactly, and amplitudes scale by 1/s so that where the SIGMA_TAU cutoff
    is inactive, optical depth is preserved (lengths scale by s, density by
    1/s, alpha = 1 - exp(-sigma*dist) invariant along corresponding rays).

    NOT exact through the cutoff: sigma = max(0, G/s - TAU) rather than the
    invariance target (1/s)*max(0, G - TAU), so for s < 1 the density
    support widens slightly (bounded by the Gaussian envelopes, which DO
    scale exactly). Exactness would require scaling TAU per-field, changing
    every field generated so far — kept as-is so the committed convergence
    scenes (tools/make_deepvoxels_scene.py, CONVERGENCE.md) stay
    reproducible bit-for-bit."""
    return FieldParams(
        centers=(fp.centers * s).astype(np.float32),
        inv_scales=(fp.inv_scales / s).astype(np.float32),
        amps=(fp.amps / s).astype(np.float32),
        colors=fp.colors,
    )


def render_gt_image(
    fp: FieldParams, H: int, W: int, focal: float, c2w: np.ndarray,
    chunk: int = 16384, near: float = 2.0, far: float = 6.0,
    n_samples: int = 384,
) -> np.ndarray:
    # chunk=16384: the [chunk, n_samples, K] Gaussian evaluation must stay
    # within what XLA can fuse/alloc — 65536 compiled at K=48 but fails at
    # K=111 (backdrop field)
    """Render one [H, W, 3] ground-truth view (chunked jit, compiled once)."""
    from nerf_tpu.data.scene import default_intrinsics
    from nerf_tpu.geom.rays import get_rays_np

    K = default_intrinsics(H, W, focal)
    rays_o, rays_d = get_rays_np(H, W, K, np.asarray(c2w)[:3, :4])
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)
    n = ro.shape[0]
    pad = (-n) % chunk
    ro = np.concatenate([ro, np.zeros((pad, 3), np.float32)], 0)
    rd = np.concatenate([rd, np.ones((pad, 3), np.float32)], 0)
    args = tuple(jnp.asarray(a) for a in
                 (fp.centers, fp.inv_scales, fp.amps, fp.colors))
    out = []
    for i in range(0, n + pad, chunk):
        out.append(np.asarray(_gt_chunk(
            *args, jnp.asarray(ro[i : i + chunk]), jnp.asarray(rd[i : i + chunk]),
            float(near), float(far), int(n_samples),
        )))
    return np.concatenate(out, 0)[:n].reshape(H, W, 3)
