"""ctypes binding for the native span-plan packer (native/spanplan.cpp).

The packer is the host-side hot loop of plan_rel_span (ops/span_kernels.py)
— ~19s per plan at AM scale in Python, ~0.1s native. Degrades to None so
the pure-Python packer remains the fallback (and the parity oracle:
tests/test_native.py asserts bitwise-equal plans).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    from scaling_rgcn_training_tpu.graphs._native import _build_lib

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native = os.path.join(here, "native")
    path = os.path.join(native, "build", "libspanplan.so")
    src = os.path.join(native, "spanplan.cpp")
    if not os.path.exists(path) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(path)):
        _build_lib(native)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.span_padded_exact.restype = ctypes.c_int64
    lib.span_padded_exact.argtypes = [
        ctypes.c_int64, _i64p, _i32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32]
    lib.span_pack.restype = ctypes.c_int64
    lib.span_pack.argtypes = [
        ctypes.c_int64, _i32p, _i64p, _i32p, _f32p,
        ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, _i32p, _i32p, _f32p,
        ctypes.c_int64, _i32p, _i32p, ctypes.c_int64, _i32p]
    _LIB = lib
    return _LIB


def pack(gather: np.ndarray, key: np.ndarray, rel: np.ndarray,
         norm: np.ndarray, num_segments: int, num_slots: int, s: int,
         chunk: int, kspan: int, shift: int,
         chunk_candidates=(1024, 512, 256)) -> Optional[dict]:
    """Sorted inputs -> packed plan arrays, or None (no native lib).

    ``chunk=0`` picks the adaptive chunk by EXACT padded size per
    candidate (a dry run of the packer walk — the old band-length
    estimate could not see window slides at chunk refills and mispicked;
    same policy as the Python packer: min padded size, larger chunk wins
    within 10%).
    """
    lib = get_lib()
    if lib is None or len(rel) == 0:
        return None
    e = len(rel)
    if not chunk:
        sizes = {int(c): int(lib.span_padded_exact(e, key, rel, s, int(c),
                                                   kspan))
                 for c in chunk_candidates}
        best = min(sizes.values())
        chunk = max(c for c, p in sizes.items() if p <= 1.1 * best)
        exact = sizes[chunk]
    else:
        exact = int(lib.span_padded_exact(e, key, rel, s, chunk, kspan))
    nb = -(-num_segments // s)
    cap_edges = exact + chunk
    cap_chunks = cap_edges // chunk + nb + 1
    out_g = np.empty(cap_edges, np.int32)
    out_c = np.empty(cap_edges, np.int32)
    out_n = np.empty(cap_edges, np.float32)
    rbase_stream = np.empty(cap_chunks, np.int32)
    chunk_counts = np.zeros(nb, np.int32)
    offsets = np.zeros(nb + 1, np.int32)
    total = lib.span_pack(e, gather, key, rel, norm,
                          num_segments, num_slots, s, chunk, kspan, shift,
                          cap_edges, out_g, out_c, out_n,
                          cap_chunks, rbase_stream, chunk_counts, nb, offsets)
    if total < 0:
        return None  # capacity bound violated (shouldn't happen)
    max_chunks = max(1, int(chunk_counts.max())) if nb else 1
    rbase = np.zeros((nb, max_chunks), np.int32)
    pos = 0
    for b in range(nb):
        c = int(chunk_counts[b])
        rbase[b, :c] = rbase_stream[pos:pos + c]
        pos += c
    return {
        "gather": out_g[:total], "code": out_c[:total], "norm": out_n[:total],
        "offsets": offsets, "rbase": rbase.reshape(-1), "chunk": int(chunk),
        "max_chunks": max_chunks, "padded": int(total),
    }
