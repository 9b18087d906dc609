"""Train CLI — the reference's entry point surface (run_nerf.py:875-878).

Usage parity: ``python -m nerf_tpu.cli.train --config configs/lego.txt
[--flag value ...]`` with the reference's flag set (nerf_tpu/config.py).
"""

from __future__ import annotations

import sys

from nerf_tpu.config import load_config
from nerf_tpu.parallel import distributed
from nerf_tpu.train.loop import train


def main(argv=None):
    cfg = load_config(argv)
    # bring up the multi-host process group before any backend init; no-op
    # for single-process runs (SURVEY.md §5 distributed backend)
    distributed.initialize(
        cfg.coordinator_address, cfg.num_processes, cfg.process_id
    )
    from nerf_tpu.utils import compile_cache

    compile_cache.enable()
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
