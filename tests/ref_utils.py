"""Helpers for parity tests against the reference implementation.

Transplants torch module weights into nerf_tpu pytree params (torch Linear
stores weight [out, in]; we store [in, out]) and builds matched model pairs.
"""

from __future__ import annotations

import numpy as np

from nerf_tpu.models.nerf_mlp import MLPConfig


def torch_linear_to_params(linear):
    return {
        "w": np.asarray(linear.weight.detach().numpy().T),
        "b": np.asarray(linear.bias.detach().numpy()),
    }


def transplant_nerf_weights(ref_model):
    """torch reference NeRF module -> nerf_tpu params pytree + MLPConfig."""
    params = {"trunk": [torch_linear_to_params(l) for l in ref_model.pts_linears]}
    if ref_model.use_viewdirs:
        params["alpha"] = torch_linear_to_params(ref_model.alpha_linear)
        params["feature"] = torch_linear_to_params(ref_model.feature_linear)
        params["views"] = torch_linear_to_params(ref_model.views_linears[0])
        params["rgb"] = torch_linear_to_params(ref_model.rgb_linear)
    else:
        params["output"] = torch_linear_to_params(ref_model.output_linear)
    cfg = MLPConfig(
        depth=ref_model.D,
        width=ref_model.W,
        input_ch=ref_model.input_ch,
        input_ch_views=ref_model.input_ch_views,
        output_ch=4 if ref_model.use_viewdirs else ref_model.output_linear.out_features,
        skips=tuple(ref_model.skips),
        use_viewdirs=ref_model.use_viewdirs,
    )
    return params, cfg
