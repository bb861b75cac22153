"""Persistent XLA compilation cache.

The axon-tunneled TPU compiles remotely with high and variable latency
(minutes for the fused train step); the persistent cache makes every
process after the first start instantly. Call ``enable()`` before the
first jit — bench.py, the CLI, and __graft_entry__ all do.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/scaling_rgcn_tpu_jax")


def enable(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("SCALING_RGCN_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
