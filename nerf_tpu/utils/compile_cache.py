"""Persistent XLA compile cache.

The flagship fused train step is a large program; a cold compile through the
remote TPU compile service takes minutes. Caching it on disk makes every
subsequent CLI/bench launch start in seconds. (The reference has no analog —
PyTorch eager has no compile step.)
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(cache_dir: str | None = None) -> None:
    """Idempotent; call before the first compile (CLI entry points do)."""
    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.environ.get("NERF_TPU_CACHE_DIR", _DEFAULT_DIR),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
