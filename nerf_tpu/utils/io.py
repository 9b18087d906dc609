"""Image/video output (ref run_nerf.py:166-169, 670, 808-809)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from nerf_tpu.utils.metrics import to8b


def save_png(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio

    imageio.imwrite(path, to8b(np.asarray(img)))


def save_video(path: str, frames: np.ndarray, fps: int = 30, quality: int = 8) -> Optional[str]:
    """Write an mp4 (ref fps=30 quality=8). Falls back to a PNG sequence when
    no ffmpeg backend is available; returns the path actually written."""
    frames = to8b(np.asarray(frames))
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps, quality=quality)
        return path
    except Exception:
        outdir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(outdir, exist_ok=True)
        import imageio.v2 as imageio

        for i, f in enumerate(frames):
            imageio.imwrite(os.path.join(outdir, f"{i:03d}.png"), f)
        return outdir
