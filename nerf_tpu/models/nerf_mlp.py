"""The NeRF MLP as a pure-functional pytree model.

Architecture parity with the reference ``NeRF`` module
(run_nerf_helpers.py:67-119), "official code release" variant:

- D=8 trunk of Linear(…,W)+ReLU, with the embedded input re-concatenated
  *after* the layer whose index is in ``skips`` (default [4]), i.e. the input
  of trunk layer 5 is ``cat([x_emb, h])`` (input first — run_nerf_helpers.py:103).
- viewdirs head: ``alpha = Linear(W,1)(trunk)``; ``feature = Linear(W,W)(trunk)``;
  one view layer ``Linear(W + view_dim, W/2) + ReLU`` over
  ``cat([feature, dirs_emb])``; ``rgb = Linear(W/2, 3)``; output
  ``cat([rgb, alpha])`` -> 4 channels.
- no-viewdirs head: single ``Linear(W, output_ch)``.

TPU-first design differences from the reference:
- parameters are a plain pytree (dict of {"w","b"} leaves), weights stored
  ``[in, out]`` so application is ``x @ w + b`` (row-major MXU layout);
- application is a pure function of (params, inputs) — jit/vmap/grad-safe;
- a ``compute_dtype`` lets the trunk matmuls run in bfloat16 with float32
  accumulation (MXU-native) while parameters stay float32.

Initialization matches torch.nn.Linear defaults (uniform ±1/sqrt(fan_in) for
both weight and bias) so convergence behaviour is comparable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Static NeRF MLP configuration (ref flags netdepth/netwidth etc.)."""

    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    output_ch: int = 4  # used only when use_viewdirs=False
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True


def _linear_init(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_params(
    key: jax.Array, cfg: MLPConfig, dtype=jnp.float32, sigma_bias: float = 0.1
) -> Params:
    """Build the parameter pytree.

    ``sigma_bias`` is added to the density head's bias at init. With the
    reference's init distribution the raw sigma at init is a near-constant
    whose SIGN is a coin flip per network; a negative draw means
    ``relu(sigma) = 0`` everywhere — zero density AND zero density-gradient,
    so that network can never learn geometry (a known failure mode of the
    reference: torch Linear init has the same coin flip). A small positive
    bias removes the trap without visibly changing init density
    (sigma ~ 0.1 -> alpha ~ 0.6% per sample). Set 0.0 for strict init parity.
    """
    n_layers = cfg.depth + (4 if cfg.use_viewdirs else 1)
    keys = iter(jax.random.split(key, n_layers))
    trunk = []
    fan_in = cfg.input_ch
    for i in range(cfg.depth):
        trunk.append(_linear_init(next(keys), fan_in, cfg.width, dtype))
        # layer i's *output* gets the input concatenated when i in skips,
        # so layer i+1 sees width + input_ch fan-in (run_nerf_helpers.py:79-80)
        fan_in = cfg.width + (cfg.input_ch if i in cfg.skips else 0)
    params: Params = {"trunk": trunk}
    if cfg.use_viewdirs:
        params["alpha"] = _linear_init(next(keys), cfg.width, 1, dtype)
        params["alpha"]["b"] = params["alpha"]["b"] + sigma_bias
        params["feature"] = _linear_init(next(keys), cfg.width, cfg.width, dtype)
        params["views"] = _linear_init(
            next(keys), cfg.width + cfg.input_ch_views, cfg.width // 2, dtype
        )
        params["rgb"] = _linear_init(next(keys), cfg.width // 2, 3, dtype)
    else:
        params["output"] = _linear_init(next(keys), cfg.width, cfg.output_ch, dtype)
        # channel 3 is sigma (run_nerf.py:282,293)
        params["output"]["b"] = params["output"]["b"].at[3].add(sigma_bias)
    return params


def _dense(p, x, compute_dtype=None):
    w, b = p["w"], p["b"]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # f32 operands: force true-f32 MXU passes (parity); bf16: native mode
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=prec)
    return y + b.astype(jnp.float32)


def apply_mlp(
    params: Params,
    cfg: MLPConfig,
    x_emb: jnp.ndarray,
    views_emb: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Apply the MLP to embedded points (and embedded viewdirs).

    Args:
        x_emb: [..., input_ch] embedded positions.
        views_emb: [..., input_ch_views] embedded view directions
            (required iff cfg.use_viewdirs).
        compute_dtype: optional matmul dtype (e.g. jnp.bfloat16); accumulation
            and outputs are always float32.

    Returns: [..., 4] raw (r, g, b, sigma) — or [..., output_ch] without
    viewdirs (matching run_nerf_helpers.py:96-119).
    """
    h = x_emb
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dense(layer, h, compute_dtype))
        if i in cfg.skips:
            h = jnp.concatenate([x_emb, h], axis=-1)
    if cfg.use_viewdirs:
        if views_emb is None:
            raise ValueError("use_viewdirs=True requires views_emb")
        alpha = _dense(params["alpha"], h, compute_dtype)
        feature = _dense(params["feature"], h, compute_dtype)
        h = jnp.concatenate([feature, views_emb.astype(feature.dtype)], axis=-1)
        h = jax.nn.relu(_dense(params["views"], h, compute_dtype))
        rgb = _dense(params["rgb"], h, compute_dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return _dense(params["output"], h, compute_dtype)


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
