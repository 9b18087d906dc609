"""Keras-weight import parity vs the reference's load_weights_from_keras
(run_nerf_helpers.py:121-148)."""

import jax.numpy as jnp
import numpy as np
import torch

from nerf_tpu.models.keras_import import params_from_keras
from nerf_tpu.models.nerf_mlp import MLPConfig, apply_mlp


def test_keras_import_forward_parity(ref_helpers):
    rng = np.random.default_rng(0)
    D, W = 8, 256
    dims = (
        [(63, W)] + [(W, W) if i != 4 else (W, W) for i in range(1, D)]
    )
    # trunk fan-ins per the official arch: layer 5 sees W+63 after the skip
    dims[5] = (W + 63, W)
    weights = []
    for fan_in, fan_out in dims:
        weights += [rng.standard_normal((fan_in, fan_out)).astype(np.float32) * 0.05,
                    rng.standard_normal((fan_out,)).astype(np.float32) * 0.05]
    weights += [rng.standard_normal((W, W)).astype(np.float32) * 0.05,
                rng.standard_normal((W,)).astype(np.float32) * 0.05]  # feature
    weights += [rng.standard_normal((W + 27, W // 2)).astype(np.float32) * 0.05,
                rng.standard_normal((W // 2,)).astype(np.float32) * 0.05]  # views
    weights += [rng.standard_normal((W // 2, 3)).astype(np.float32) * 0.05,
                rng.standard_normal((3,)).astype(np.float32) * 0.05]  # rgb
    weights += [rng.standard_normal((W, 1)).astype(np.float32) * 0.05,
                rng.standard_normal((1,)).astype(np.float32) * 0.05]  # alpha

    ref_model = ref_helpers.NeRF(
        D=D, W=W, input_ch=63, input_ch_views=27, output_ch=4, skips=[4],
        use_viewdirs=True,
    )
    ref_model.load_weights_from_keras(weights)

    cfg = MLPConfig(depth=D, width=W, input_ch=63, input_ch_views=27)
    params = params_from_keras(weights, cfg)

    x = rng.standard_normal((64, 63)).astype(np.float32)
    v = rng.standard_normal((64, 27)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(np.concatenate([x, v], -1))).numpy()
    ours = np.asarray(apply_mlp(params, cfg, jnp.asarray(x), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)
