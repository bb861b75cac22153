"""On-disk cache for host-built edge plans (RelEdges / halo partitions).

Plan construction is host-side preprocessing that runs once per graph
(ops/rgcn_conv.py `build_rel_edges`, parallel/halo.py
`halo_partition_edges`). At AM scale (~12M directed edges) a cold build
costs minutes per process even with the native packer — the reference
rebuilds everything per run (reference main.py:46-47), but a framework
meant for repeated large-scale training should not. This cache persists
the finished plan pytrees keyed by a content hash of the raw edge arrays
plus every knob that shapes the plan, so the second process start loads
in seconds.

Format: one pickle per plan holding the NamedTuple pytree with all array
leaves converted to host numpy (atomic rename on write). The key hashes
the *inputs*, so any edit to the raw graph or the layout knobs misses
cleanly; `_VERSION` must be bumped whenever the plan layout changes
(e.g. the column-packed code/norm layout of RelSpanEdges).

Trust model: plans are PICKLES. Loading executes whatever the file says,
so the cache dir must be private to the user/job (the default — a local
path the trainer owns). Do NOT point ``plan_cache`` at a directory other
principals can write to (e.g. a world-writable shared checkpoint dir).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, Iterable

import numpy as np

# bump when any plan NamedTuple layout / packing convention changes
_VERSION = 8  # v8: fwd bucket default 384 + fallback (defaults are plan semantics)

# env knobs that change plan contents (ops/span_kernels.py,
# ops/segment_kernels.py, ops/rgcn_conv.py read these at build time)
_KNOB_ENVS = (
    "RGCN_SPAN_K", "RGCN_SPAN_BUCKET_ROWS", "RGCN_SPAN_FWD_S",
    "RGCN_SPAN_BWD_S", "RGCN_SPAN_BWD_K", "RGCN_SPAN_CHUNK",
    "RGCN_SPAN_FWD_CHUNK", "RGCN_SPAN_BWD_CHUNK",
    "RGCN_SEG_BUCKET_ROWS", "RGCN_SEG_CHUNK",
    "RGCN_HALO_FPLAN", "RGCN_HALO_FPLAN_MAX_BLOWUP",
)


def plan_key(kind: str, arrays: Iterable[np.ndarray], statics: tuple) -> str:
    """Content hash of raw inputs + layout knobs + format version."""
    h = hashlib.blake2b(digest_size=20)
    h.update(f"{kind}|v{_VERSION}|{statics!r}".encode())
    for name in _KNOB_ENVS:
        h.update(f"|{name}={os.environ.get(name, '')}".encode())
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(f"|{a.dtype}{a.shape}".encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _to_host(obj):
    import jax

    return jax.tree_util.tree_map(np.asarray, obj)


def to_device(obj):
    """Convert a host-built (numpy-leaf) plan pytree to device arrays.

    Builders construct plans entirely in numpy so that caching never
    fetches arrays back through the accelerator (over the axon tunnel a
    device->host pull of an AM-scale plan costs minutes); this is the one
    conversion point."""
    import jax.numpy as jnp

    import jax

    return jax.tree_util.tree_map(jnp.asarray, obj)


_to_device = to_device


def save_plan(path: str, obj) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(obj), f, protocol=4)
    os.replace(tmp, path)


def load_plan(path: str):
    with open(path, "rb") as f:
        return _to_device(pickle.load(f))


def get_or_build(cache_dir: str | None, kind: str,
                 arrays: Iterable[np.ndarray], statics: tuple,
                 build: Callable[[], object]):
    """Load the cached plan for (kind, inputs) or build + persist it.

    ``build`` must return a HOST (numpy-leaf) plan; the result is
    converted to device arrays on the way out. ``cache_dir=None`` (or
    empty) disables caching.
    """
    if not cache_dir:
        return to_device(build())
    arrays = [np.asarray(a) for a in arrays]
    key = plan_key(kind, arrays, statics)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{kind}-{key}.plan")
    if os.path.exists(path):
        try:
            return load_plan(path)
        except (pickle.UnpicklingError, EOFError, OSError, ValueError,
                AttributeError, ImportError) as e:
            # corrupt/partial/stale-format file: rebuild and overwrite —
            # but say so, a silently-discarded cache hides real I/O issues
            import warnings

            warnings.warn(f"discarding unreadable plan cache entry "
                          f"{path}: {type(e).__name__}: {e}", stacklevel=2)
    obj = build()
    save_plan(path, obj)
    return to_device(obj)
