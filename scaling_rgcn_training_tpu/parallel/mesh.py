"""Device mesh management.

One mesh axis, ``"e"`` (edges), is the workhorse: the per-relation edge
list is partitioned across it and partial aggregations ride an ICI
all-reduce. Multi-host initialization goes through
``jax.distributed.initialize`` before mesh construction.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_current_mesh: Optional[Mesh] = None

EDGE_AXIS = "e"


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = (EDGE_AXIS,)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"asked for {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]).reshape(n), axis_names=tuple(axis_names))


def current_mesh() -> Optional[Mesh]:
    return _current_mesh


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Ambient mesh for the sharded conv dispatch (ops/rgcn_conv.py)."""
    global _current_mesh
    prev = _current_mesh
    _current_mesh = mesh
    try:
        yield mesh
    finally:
        _current_mesh = prev


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the NCCL-init equivalent; no-op when single)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
