"""Profiling / tracing hooks (aux subsystem; reference has only wall-clock
banners, SURVEY.md §5).

- ``trace(dir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of device execution.
- ``annotate(name)``: named region (shows up in the trace timeline).
- ``throughput(edges, seconds)``: the north-star meter (edges/s).
- ``determinism_check(fn, *args)``: runs a jitted fn twice and asserts
  bitwise-equal outputs — the jit-level determinism audit that replaces a
  single-process race detector in this framework's execution model.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def throughput(num_edges: int, num_layers: int, seconds: float) -> float:
    """edge traversals per second (the BASELINE.json north-star metric)."""
    return num_edges * num_layers / max(seconds, 1e-12)


def determinism_check(fn: Callable, *args, tries: int = 2) -> bool:
    """Assert a jitted computation is run-to-run deterministic (bitwise)."""
    jfn = jax.jit(fn)
    ref = jax.tree_util.tree_leaves(jfn(*args))
    for _ in range(tries - 1):
        for a, b in zip(ref, jax.tree_util.tree_leaves(jfn(*args))):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                return False
    return True
