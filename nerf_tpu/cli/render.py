"""Render-only CLI (the reference's --render_only path, run_nerf.py:654-672).

``python -m nerf_tpu.cli.render --config configs/lego.txt [--render_test]``
loads the newest checkpoint and renders the pose path (or test set) to PNGs
and an mp4.
"""

from __future__ import annotations

import dataclasses
import sys

from nerf_tpu.config import load_config
from nerf_tpu.train.loop import train


def main(argv=None):
    cfg = load_config(argv)
    cfg = dataclasses.replace(cfg, render_only=True)
    from nerf_tpu.utils import compile_cache

    compile_cache.enable()
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
