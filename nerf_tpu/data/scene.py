"""The common Scene structure all dataset loaders emit.

The reference's four loaders each return a slightly different tuple
(load_llff.py:316, load_blender.py:89, load_deepvoxels.py:108,
load_LINEMOD.py:93); here they all produce one ``Scene`` so the trainer and
renderer are dataset-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Scene:
    """Host-side (numpy) scene bundle.

    images: [N, H, W, 3] float32 in [0,1] (white/black background already
        composited for RGBA sources, ref run_nerf.py:577-580).
    poses: [N, 3, 4] camera-to-world.
    render_poses: [M, 3, 4] (or [M, 4, 4]) eval/video camera path.
    hwf: (H, W, focal).
    K: [3, 3] intrinsics (assembled from hwf when the dataset has none,
        ref run_nerf.py:615-620).
    i_train / i_val / i_test: index arrays into images/poses.
    near, far: scene bounds (dataset-specific policy, ref run_nerf.py:559-604).
    """

    images: np.ndarray
    poses: np.ndarray
    render_poses: np.ndarray
    hwf: tuple
    K: np.ndarray
    i_train: np.ndarray
    i_val: np.ndarray
    i_test: np.ndarray
    near: float
    far: float
    bds: Optional[np.ndarray] = None  # llff per-image depth bounds

    @property
    def H(self) -> int:
        return int(self.hwf[0])

    @property
    def W(self) -> int:
        return int(self.hwf[1])

    @property
    def focal(self) -> float:
        return float(self.hwf[2])


def default_intrinsics(H: int, W: int, focal: float) -> np.ndarray:
    return np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], dtype=np.float32
    )
