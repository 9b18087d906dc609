"""Network query: embed sampled points (+viewdirs) and evaluate the MLP.

Equivalent of the reference's ``run_network``/``batchify`` (run_nerf.py:27-51)
— with the serial ``netchunk`` microbatching deleted: on TPU the whole
[R·S, width] batch is one set of large MXU matmuls, and memory is managed by
the caller's ray chunking plus XLA, not a Python loop.

Two execution paths with identical semantics:
- jnp: posenc + apply_mlp (XLA-fused; activations round-trip HBM)
- fused: single Pallas kernel (ops/fused_mlp.py) computing posenc + all MLP
  layers per VMEM tile — the input is 6 floats/point and the output 4, so the
  kernel is compute-bound instead of HBM-bound.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from nerf_tpu.models.embedding import PosEncConfig, posenc
from nerf_tpu.models.nerf_mlp import MLPConfig, apply_mlp


@dataclasses.dataclass(frozen=True)
class NeRFModel:
    """Static description of the full model (embedders + coarse/fine MLPs).

    Mirrors what the reference assembles in ``create_nerf`` (run_nerf.py:178-207)
    minus the closures: params live in a separate pytree
    ``{"coarse": ..., "fine": ...}``.
    """

    pe_pts: PosEncConfig
    pe_views: Optional[PosEncConfig]
    coarse: MLPConfig
    fine: Optional[MLPConfig]
    compute_dtype: str = "float32"
    fused: bool = False
    # single-kernel rays->maps path (ops/fused_render.py): compositing fused
    # into the MLP kernel; falls back per-level when unsupported (retraw,
    # no-viewdirs, sample count not a multiple of 8)
    fused_render: bool = False

    def mlp_config(self, level: str) -> MLPConfig:
        if level == "fine" and self.fine is not None:
            return self.fine
        return self.coarse


def query_raw(
    params,
    mlp_cfg: MLPConfig,
    model: NeRFModel,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    input_grads: bool = True,
) -> jnp.ndarray:
    """Evaluate raw (r,g,b,sigma) at sampled points.

    Args:
        pts: [R, S, 3] sample positions.
        viewdirs: [R, 3] unit view directions (None when not use_viewdirs).
        input_grads: False when the caller guarantees pts/viewdirs carry no
            gradient (the renderer stop-grads them) — the fused backward
            kernel then skips the whole input-grad branch.

    Returns: raw [R, S, 4] float32 (or [R, S, output_ch] without viewdirs).
    """
    R, S, _ = pts.shape
    compute_dtype = (
        jnp.bfloat16 if model.compute_dtype == "bfloat16" else jnp.float32
    )
    if model.fused and viewdirs is not None:
        from nerf_tpu.ops import fused_mlp  # lazy: pallas import

        if fused_mlp.supports(mlp_cfg, model.pe_pts, model.pe_views):
            return fused_mlp.fused_query(
                params, mlp_cfg, model.pe_pts, model.pe_views, pts, viewdirs,
                compute_dtype=compute_dtype, input_grads=input_grads,
            )
    x_emb = posenc(pts.reshape(R * S, 3), model.pe_pts)
    v_emb = None
    if viewdirs is not None:
        v_emb = posenc(viewdirs, model.pe_views)  # [R, Cv]
        v_emb = jnp.broadcast_to(v_emb[:, None, :], (R, S, v_emb.shape[-1]))
        v_emb = v_emb.reshape(R * S, -1)
    raw = apply_mlp(params, mlp_cfg, x_emb, v_emb, compute_dtype=compute_dtype)
    return raw.reshape(R, S, raw.shape[-1])
