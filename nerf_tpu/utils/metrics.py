"""Image metrics (ref run_nerf_helpers.py:9-11)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def psnr_np(x: np.ndarray, y: np.ndarray) -> float:
    """Host-side PSNR (same formula as img2mse+mse2psnr, no device
    round-trip) — for eval pipelines whose frames are already fetched."""
    return float(-10.0 * np.log10(np.mean(np.square(x - y))))
