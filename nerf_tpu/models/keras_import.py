"""Import weights exported from the original TF/Keras NeRF.

Equivalent of the reference's ``NeRF.load_weights_from_keras``
(run_nerf_helpers.py:121-148): the npy list holds [W, b] pairs in order
trunk(0..D-1), feature, views[0], rgb, alpha — Keras stores W as [in, out],
which matches this framework's layout directly (the reference transposes for
torch; we don't need to).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from nerf_tpu.models.nerf_mlp import MLPConfig, Params


def params_from_keras(weights: Sequence[np.ndarray], cfg: MLPConfig) -> Params:
    if not cfg.use_viewdirs:
        # same restriction as the reference's own assert
        # (run_nerf_helpers.py:123 "Not implemented if use_viewdirs=False"):
        # the Keras reference weights were exported from the viewdirs model,
        # so there is no no-viewdirs layout to map from.
        raise ValueError(
            "params_from_keras only supports use_viewdirs=True: the TF/Keras "
            "reference checkpoint layout has feature/alpha/views/rgb heads "
            "(ref run_nerf_helpers.py:121-148)"
        )

    def pair(i):
        return {
            "w": np.asarray(weights[2 * i], np.float32),
            "b": np.asarray(weights[2 * i + 1], np.float32).reshape(-1),
        }

    params: Params = {"trunk": [pair(i) for i in range(cfg.depth)]}
    params["feature"] = pair(cfg.depth)
    params["views"] = pair(cfg.depth + 1)
    params["rgb"] = pair(cfg.depth + 2)
    params["alpha"] = pair(cfg.depth + 3)
    return params
