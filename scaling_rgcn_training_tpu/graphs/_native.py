"""ctypes binding for the native N-Triples graph builder (native/ntgraph.cpp).

Loads ``native/build/libntgraph.so`` when present; all entry points degrade
to None so callers fall back to the pure-Python path transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "build", "libntgraph.so")
    src = os.path.join(here, "native", "ntgraph.cpp")
    if not os.path.exists(cand) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(cand)):
        _build_lib(os.path.join(here, "native"))
    return cand if os.path.exists(cand) else None


def _build_lib(native_dir: str) -> None:
    """Build the .so on demand (once) when a compiler is available, so the
    native fast path — and its tests — work out of the box."""
    import shutil
    import subprocess

    if os.environ.get("RGCN_NO_NATIVE_BUILD") or not os.path.isdir(native_dir):
        return
    make = shutil.which("make")
    if make is None or shutil.which(os.environ.get("CXX", "g++")) is None:
        return
    try:
        subprocess.run([make, "-C", native_dir], check=True, timeout=120,
                       capture_output=True)
    except (subprocess.SubprocessError, OSError):
        pass  # callers fall back to the pure-Python parser


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ntg_parse.restype = ctypes.c_void_p
    lib.ntg_parse.argtypes = [ctypes.c_char_p]
    lib.ntg_free.argtypes = [ctypes.c_void_p]
    for fn in ["ntg_num_nodes", "ntg_num_relations", "ntg_num_edges_unique",
               "ntg_num_edge_entries", "ntg_num_type_pairs"]:
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ["ntg_edge_src", "ntg_edge_dst", "ntg_edge_type"]:
        getattr(lib, fn).restype = ctypes.POINTER(ctypes.c_int32)
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ["ntg_nodes_blob", "ntg_rels_blob", "ntg_types_blob"]:
        getattr(lib, fn).restype = ctypes.POINTER(ctypes.c_char)
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ["ntg_nodes_offsets", "ntg_rels_offsets", "ntg_types_offsets"]:
        getattr(lib, fn).restype = ctypes.POINTER(ctypes.c_int64)
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def _strings_from_blob(blob_ptr, offsets_ptr, count: int) -> List[str]:
    if count == 0:
        return []
    offs = np.ctypeslib.as_array(offsets_ptr, shape=(count + 1,))
    total = int(offs[count])
    raw = ctypes.string_at(blob_ptr, total)
    return [raw[offs[i]:offs[i + 1]].decode("utf-8", errors="surrogateescape")
            for i in range(count)]


def parse_graph(path: str):
    """-> (nodes, relations, edge_src, edge_dst, edge_type, num_unique_lines,
           type_pairs) or None when the native lib is unavailable.

    ``type_pairs`` is a list of (subject, object) of rdf:type triples, in
    file order — enough for get_classes / nodes2type_mapping without
    iterating all triples in Python.
    """
    lib = get_lib()
    if lib is None:
        return None
    h = lib.ntg_parse(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        n_nodes = lib.ntg_num_nodes(h)
        n_rels = lib.ntg_num_relations(h)
        n_uniq = lib.ntg_num_edges_unique(h)
        n_entries = lib.ntg_num_edge_entries(h)
        n_types = lib.ntg_num_type_pairs(h)

        nodes = _strings_from_blob(lib.ntg_nodes_blob(h), lib.ntg_nodes_offsets(h), n_nodes)
        rels = _strings_from_blob(lib.ntg_rels_blob(h), lib.ntg_rels_offsets(h), n_rels)
        tflat = _strings_from_blob(lib.ntg_types_blob(h), lib.ntg_types_offsets(h), 2 * n_types)
        type_pairs = list(zip(tflat[0::2], tflat[1::2]))

        if n_entries:
            src = np.ctypeslib.as_array(lib.ntg_edge_src(h), shape=(n_entries,)).copy()
            dst = np.ctypeslib.as_array(lib.ntg_edge_dst(h), shape=(n_entries,)).copy()
            typ = np.ctypeslib.as_array(lib.ntg_edge_type(h), shape=(n_entries,)).copy()
        else:
            src = dst = typ = np.zeros(0, np.int32)
        return nodes, rels, src, dst, typ, int(n_uniq), type_pairs
    finally:
        lib.ntg_free(h)
