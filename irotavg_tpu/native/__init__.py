"""ctypes bindings for the native host-side kernels (native.cpp).

The shared library is built on demand with g++ (cached next to the
source; rebuilt when the source is newer).  Every entry point has a pure
Python/numpy fallback at its call site, so a missing toolchain degrades
to slower parity, never to failure — check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LIB = os.path.join(_DIR, "libirotavg_native.so")

_lib = None
_tried = False


class _VocabData(ctypes.Structure):
    _fields_ = [
        ("k", ctypes.c_int32),
        ("L", ctypes.c_int32),
        ("scoring", ctypes.c_int32),
        ("weighting", ctypes.c_int32),
        ("n_nodes", ctypes.c_int64),
        ("parent", ctypes.POINTER(ctypes.c_int32)),
        ("is_leaf", ctypes.POINTER(ctypes.c_uint8)),
        ("desc", ctypes.POINTER(ctypes.c_uint8)),
        ("weight", ctypes.POINTER(ctypes.c_double)),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("IROTAVG_NO_NATIVE"):
        return None
    needs_build = (not os.path.exists(_LIB)
                   or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
    if needs_build and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.vocab_parse.restype = ctypes.POINTER(_VocabData)
    lib.vocab_parse.argtypes = [ctypes.c_char_p]
    lib.vocab_free.argtypes = [ctypes.POINTER(_VocabData)]
    lib.spanning_tree_init.restype = ctypes.c_int64
    lib.spanning_tree_init.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.bow_l1_scores.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_vocab_text(path: str):
    """Parse a DBoW2 text vocabulary.  Returns
    (k, L, scoring_idx, weighting_idx, parent, is_leaf, desc_bytes, weight)
    with per-node arrays (root excluded, matching the file), or None when
    the native library is unavailable or the file is unreadable."""
    lib = _load()
    if lib is None:
        return None
    v = lib.vocab_parse(path.encode())
    if not v:
        return None
    try:
        d = v.contents
        n = d.n_nodes
        parent = np.ctypeslib.as_array(d.parent, (n,)).copy()
        is_leaf = np.ctypeslib.as_array(d.is_leaf, (n,)).astype(bool)
        desc = np.ctypeslib.as_array(d.desc, (n, 32)).copy()
        weight = np.ctypeslib.as_array(d.weight, (n,)).copy()
        return (int(d.k), int(d.L), int(d.scoring), int(d.weighting),
                parent, is_leaf, desc, weight)
    finally:
        lib.vocab_free(v)


def spanning_tree_init(edges, QQ, Q, f):
    """In-place spanning-tree propagation over ``Q`` (rows [x y z w]).
    Returns the number of reached nodes, or -1 if unavailable."""
    lib = _load()
    if lib is None:
        return -1
    edges = np.ascontiguousarray(edges, np.int32)
    QQ = np.ascontiguousarray(QQ, np.float64)
    assert Q.dtype == np.float64 and Q.flags.c_contiguous
    m, n = len(edges), len(Q)
    return int(lib.spanning_tree_init(
        m, n, int(f),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        QQ.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        Q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    ))


def bow_l1_scores(q_ids, q_w, c_ids, c_w, c_off):
    """Batched L1 BoW scores of one query against CSR candidates, or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    q_ids = np.ascontiguousarray(q_ids, np.int64)
    q_w = np.ascontiguousarray(q_w, np.float64)
    c_ids = np.ascontiguousarray(c_ids, np.int64)
    c_w = np.ascontiguousarray(c_w, np.float64)
    c_off = np.ascontiguousarray(c_off, np.int64)
    nc = len(c_off) - 1
    out = np.zeros(nc, np.float64)
    lib.bow_l1_scores(
        q_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        q_w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(q_ids),
        c_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        c_w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        c_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nc,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
