"""Model factory: NeRFConfig -> NeRFModel + initial params.

Equivalent of the model-building half of the reference ``create_nerf``
(run_nerf.py:178-207); checkpoint discovery/resume lives in
utils/checkpoint.py and optimizer creation in train/step.py.
"""

from __future__ import annotations

from typing import Dict

import jax

from nerf_tpu.config import NeRFConfig
from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.nerf_mlp import MLPConfig, init_params
from nerf_tpu.render.network import NeRFModel


def make_model(cfg: NeRFConfig) -> NeRFModel:
    if cfg.i_embed == -1:  # identity embedding (ref run_nerf_helpers.py:49-50)
        pe_pts = PosEncConfig.identity()
    else:
        pe_pts = PosEncConfig(num_freqs=cfg.multires)
    pe_views = None
    input_ch_views = 0
    if cfg.use_viewdirs:
        pe_views = (
            PosEncConfig.identity()
            if cfg.i_embed == -1
            else PosEncConfig(num_freqs=cfg.multires_views)
        )
        input_ch_views = pe_views.out_dim
    # output_ch=5 when N_importance>0 mirrors ref run_nerf.py:187; the 5th
    # channel is only ever produced in the no-viewdirs path (and unused there
    # too — run_nerf_helpers.py:115-117)
    output_ch = 5 if cfg.N_importance > 0 else 4
    coarse = MLPConfig(
        depth=cfg.netdepth,
        width=cfg.netwidth,
        input_ch=pe_pts.out_dim,
        input_ch_views=input_ch_views,
        output_ch=output_ch,
        use_viewdirs=cfg.use_viewdirs,
    )
    fine = None
    if cfg.N_importance > 0:
        fine = MLPConfig(
            depth=cfg.netdepth_fine,
            width=cfg.netwidth_fine,
            input_ch=pe_pts.out_dim,
            input_ch_views=input_ch_views,
            output_ch=output_ch,
            use_viewdirs=cfg.use_viewdirs,
        )
    return NeRFModel(
        pe_pts=pe_pts,
        pe_views=pe_views,
        coarse=coarse,
        fine=fine,
        compute_dtype=cfg.compute_dtype,
        fused=cfg.fused_kernels,
        fused_render=cfg.fused_kernels and cfg.fused_render,
    )


def init_model_params(key: jax.Array, model: NeRFModel) -> Dict:
    k_coarse, k_fine = jax.random.split(key)
    params = {"coarse": init_params(k_coarse, model.coarse)}
    if model.fine is not None:
        params["fine"] = init_params(k_fine, model.fine)
    return params
