"""Ray sampling: stratified coarse samples + inverse-CDF importance sampling.

Numerical parity targets (must match the reference bit-for-intent):
- stratified: ``t = linspace(0,1,N)``; depth-linear ``z = near(1-t)+far·t`` or
  disparity-linear ``1/(1/near·(1-t)+1/far·t)``; optional per-interval jitter
  from midpoint bounds (run_nerf.py:357-379).
- sample_pdf: ``weights + 1e-5``; CDF prepended with 0; ``u`` linspace when
  deterministic else uniform; inverse CDF via right-bisect then clamped
  below/above gather; ``denom<1e-5 -> 1`` guard; linear interp in the bin
  (run_nerf_helpers.py:196-239).

TPU notes: searchsorted is realized as a lane-parallel comparison reduction
(``sum(cdf <= u)``) — a [N_rays, N_new, N_bins] broadcast the VPU chews
through without data-dependent control flow; gathers use one-hot-free
``take_along_axis`` which XLA lowers to a dynamic-gather. Randomness is
threaded explicitly: callers pass a `jax.random` key, or inject exact arrays
(``t_rand``/``u``) for cross-framework parity tests (the reference's
``pytest=True`` hooks, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    *,
    lindisp: bool = False,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
    t_rand: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Coarse sample depths along each ray.

    Args:
        near, far: [N_rays] or [N_rays, 1] bounds.
        perturb: jitter each sample uniformly within its interval.
        t_rand: explicit jitter in [0,1), shape [N_rays, n_samples]
            (overrides ``key``; parity-test hook, ref run_nerf.py:373-377).

    Returns: z_vals [N_rays, n_samples].
    """
    near = jnp.reshape(near, (-1, 1))
    far = jnp.reshape(far, (-1, 1))
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)

    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        if t_rand is None:
            if key is None:
                raise ValueError("perturb=True requires key or t_rand")
            t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    *,
    det: bool = False,
    key: Optional[jax.Array] = None,
    u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Draw ``n_samples`` per ray from the piecewise-constant PDF over ``bins``.

    Args:
        bins: [N_rays, M] bin edges (z-midpoints in the hierarchical pass).
        weights: [N_rays, M-1] unnormalized bin weights.
        det: deterministic (linspace) u's instead of uniform draws.
        u: explicit draw override, [N_rays, n_samples] (parity-test hook).

    Returns: samples [N_rays, n_samples] (caller applies stop_gradient —
    the reference detaches, run_nerf.py:394).
    """
    weights = weights + 1e-5  # prevent nans (ref run_nerf_helpers.py:198)
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, M]

    if u is None:
        shape = cdf.shape[:-1] + (n_samples,)
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype), shape
            )
        else:
            if key is None:
                raise ValueError("stochastic sample_pdf requires key or u")
            u = jax.random.uniform(key, shape, dtype=cdf.dtype)

    # Inverse CDF without gathers. XLA lowers take_along_axis on TPU to a
    # serial custom-call (~8 ms per gather at [4096,128] — measured to be 60%
    # of the whole forward render). Instead: the bisection index is defined by
    # mask[b,n,m] = (cdf[b,m] <= u[b,n]), and because cdf and bins are sorted
    # along m, the four gathered values are masked extrema:
    #   x_below = x[inds-1] = max_m  x[m] where mask       (mask true at m=0)
    #   x_above = x[inds]   = min_m  x[m] where not mask   (clamp: x[M-1])
    # which are lane-parallel VPU reductions over the same mask tensor.
    mask = cdf[..., None, :] <= u[..., :, None]  # [B, N, M]
    neg, pos = -jnp.inf, jnp.inf

    def below_of(x):
        return jnp.max(jnp.where(mask, x[..., None, :], neg), axis=-1)

    def above_of(x):
        v = jnp.min(jnp.where(mask, pos, x[..., None, :]), axis=-1)
        # inds == M (u beyond the last cdf entry): reference clamps to M-1
        return jnp.where(jnp.isfinite(v), v, x[..., -1:])

    cdf_below = below_of(cdf)
    cdf_above = above_of(cdf)
    bins_below = below_of(bins)
    bins_above = above_of(bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
