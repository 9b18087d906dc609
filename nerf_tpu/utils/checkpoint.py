"""Checkpointing: save/restore {step, params, opt_state} with discovery/resume.

Reference behaviour (run_nerf.py:216-233, 792-800): save every ``i_weights``
steps to ``basedir/expname/{step:06d}.tar``; on startup scan the expdir,
sort, load the newest unless ``--no_reload``; ``--ft_path`` overrides. The
optimizer moments ARE checkpointed; LR is recomputed from the step so the
schedule survives resume. The reference's crash when the fine network is
absent (run_nerf.py:797, SURVEY.md §2 "known bug") is fixed here: the state
pytree is saved whole, fine params or not.

Uses orbax (the TPU-native, multi-host-capable checkpointer) with directories
named ``ckpt_{step:06d}``.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from nerf_tpu.train.step import TrainState

_CKPT_RE = re.compile(r"ckpt_(\d+)$")


def ckpt_dir(basedir: str, expname: str, step: int) -> str:
    return os.path.join(basedir, expname, f"ckpt_{step:06d}")


def save_checkpoint(basedir: str, expname: str, state: TrainState) -> str:
    step = int(state.step)
    path = os.path.abspath(ckpt_dir(basedir, expname, step))
    if jax.process_count() > 1:
        # multi-host: hand orbax the global (sharded/replicated) arrays; it
        # coordinates the collective write across processes
        payload = state
    else:
        payload = jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def find_checkpoints(basedir: str, expname: str) -> list:
    """Sorted (by step) checkpoint paths in the experiment dir."""
    d = os.path.join(basedir, expname)
    if not os.path.isdir(d):
        return []
    found = []
    for name in os.listdir(d):
        m = _CKPT_RE.match(name)
        if m:
            found.append((int(m.group(1)), os.path.join(d, name)))
    return [p for _, p in sorted(found)]


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def maybe_resume(
    basedir: str,
    expname: str,
    template: TrainState,
    no_reload: bool = False,
    ft_path: Optional[str] = None,
) -> TrainState:
    """Checkpoint discovery + resume policy (ref run_nerf.py:216-233)."""
    if ft_path is not None and ft_path != "None":
        return restore_checkpoint(ft_path, template)
    ckpts = find_checkpoints(basedir, expname)
    if ckpts and not no_reload:
        return restore_checkpoint(ckpts[-1], template)
    return template
