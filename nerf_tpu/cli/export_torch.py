"""Export the newest checkpoint as a reference-format torch ``.tar``.

``python -m nerf_tpu.cli.export_torch --config configs/lego.txt [--out X.tar]``
resolves the experiment's newest checkpoint (or ``--ft_path``, either
format) and writes ``{global_step, network_fn_state_dict,
network_fine_state_dict, optimizer_state_dict}`` exactly as the reference
saves it (run_nerf.py:794-800) — loadable by the stock nerf-pytorch resume,
so a TPU-trained model plugs back into any torch-based downstream tooling.
"""

from __future__ import annotations

import os
import sys

import jax

from nerf_tpu.config import load_config
from nerf_tpu.models.factory import init_model_params, make_model
from nerf_tpu.models.torch_import import (
    export_torch_checkpoint,
    train_state_from_torch_checkpoint,
)
from nerf_tpu.train.step import init_train_state
from nerf_tpu.utils import checkpoint as ckpt_lib


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i : i + 2]
    cfg = load_config(argv)

    model = make_model(cfg)
    params = init_model_params(jax.random.key(cfg.seed), model)
    state = init_train_state(params, cfg.lrate, cfg.lrate_decay)
    if cfg.ft_path not in (None, "None") and cfg.ft_path.endswith(".tar"):
        state = train_state_from_torch_checkpoint(
            cfg.ft_path, model, cfg.lrate, cfg.lrate_decay
        )
    else:
        state = ckpt_lib.maybe_resume(
            cfg.basedir, cfg.expname, state, no_reload=False, ft_path=cfg.ft_path
        )
    step = int(state.step)
    if step == 0:
        print("warning: no checkpoint found; exporting the INITIAL state")
    if out is None:
        out = os.path.join(cfg.basedir, cfg.expname, f"{step:06d}.tar")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    export_torch_checkpoint(out, state, model)
    print(f"exported step {step} -> {out}")


if __name__ == "__main__":
    main()
