"""Native (C++) host-side IO runtime, bound via ctypes.

The reference's host runtime is native Rust end to end; here the
device compute is JAX/XLA/Pallas and this library supplies the native
host pieces: the `.vec` dataset parser (`vers/src/utils.rs:7-66`
equivalent) and a one-pass HNSW bincode scanner
(`vers/src/indexes/base.rs:31-58` + `models.rs:149-153` layout).

The shared library is built on demand with g++ (`make native` or the
lazy auto-build below). Everything here degrades gracefully: if the
toolchain or the .so is unavailable, callers fall back to the pure
Python implementations (`vers_tpu.utils.data`, `vers_tpu.io.bincode`).
Set ``VERS_NATIVE=0`` to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io_native.cpp")
_SO = os.path.join(_DIR, "libversio.so")

_lib = None
_lib_tried = False


class _VecFile(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("words", ctypes.POINTER(ctypes.c_char)),
        ("word_ends", ctypes.POINTER(ctypes.c_uint64)),
        ("n_rows", ctypes.c_uint64),
        ("words_len", ctypes.c_uint64),
    ]


class _HnswScan(ctypes.Structure):
    _fields_ = [
        ("ef_construction", ctypes.c_uint64),
        ("ef_search", ctypes.c_uint64),
        ("num_neighbours", ctypes.c_uint64),
        ("num_layers", ctypes.c_uint64),
        ("layer_counts", ctypes.POINTER(ctypes.c_uint64)),
        ("n_nodes_total", ctypes.c_uint64),
        ("node_ids", ctypes.POINTER(ctypes.c_uint64)),
        ("heap_lens", ctypes.POINTER(ctypes.c_uint64)),
        ("nbr_lens", ctypes.POINTER(ctypes.c_uint64)),
        ("heap_ids", ctypes.POINTER(ctypes.c_uint64)),
        ("heap_dists", ctypes.POINTER(ctypes.c_float)),
        ("nbrs", ctypes.POINTER(ctypes.c_uint64)),
        ("heap_total", ctypes.c_uint64),
        ("nbr_total", ctypes.c_uint64),
        ("layer_multiplier", ctypes.c_float),
        ("n_vecs", ctypes.c_uint64),
        ("vec_ids", ctypes.POINTER(ctypes.c_uint64)),
        ("vecs", ctypes.POINTER(ctypes.c_float)),
        ("error", ctypes.c_int),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # no toolchain / compile error -> Python path
        print(f"vers_tpu.native: build skipped ({e})", file=sys.stderr)
        return False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("VERS_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        print(f"vers_tpu.native: load failed ({e})", file=sys.stderr)
        return None
    lib.vers_parse_vec.restype = ctypes.POINTER(_VecFile)
    lib.vers_parse_vec.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
    ]
    lib.vers_free_vec.argtypes = [ctypes.POINTER(_VecFile)]
    lib.vers_hnsw_scan.restype = ctypes.POINTER(_HnswScan)
    lib.vers_hnsw_scan.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.vers_free_hnsw.argtypes = [ctypes.POINTER(_HnswScan)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_vec(
    path: str, dim: int, header: bool = True, max_rows: Optional[int] = None
) -> Optional[Tuple[List[str], np.ndarray]]:
    """Native `.vec` parse -> (words, (n, dim) float32). None if the
    native library is unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    ptr = lib.vers_parse_vec(
        path.encode(), dim, 1 if header else 0, max_rows or 0
    )
    if not ptr:
        raise FileNotFoundError(path)
    try:
        v = ptr.contents
        n = int(v.n_rows)
        embs = np.ctypeslib.as_array(v.data, shape=(n, dim)).copy() if n else (
            np.zeros((0, dim), np.float32)
        )
        ends = (
            np.ctypeslib.as_array(v.word_ends, shape=(n,)).copy()
            if n
            else np.zeros((0,), np.uint64)
        )
        blob = ctypes.string_at(v.words, int(v.words_len))
        words, prev = [], 0
        for e in ends:
            words.append(blob[prev:int(e)].decode("utf-8", errors="replace"))
            prev = int(e)
        return words, embs
    finally:
        lib.vers_free_vec(ptr)


def hnsw_scan(path: str, dim: int) -> Optional[dict]:
    """One-pass native decode of an HNSW bincode file into flat numpy
    arrays (see io_native.cpp for the layout). None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    ptr = lib.vers_hnsw_scan(path.encode(), dim)
    if not ptr:
        raise FileNotFoundError(path)
    try:
        s = ptr.contents
        if s.error:
            raise EOFError(f"truncated/corrupt HNSW file: {path}")

        def arr(p, n, dt):
            n = int(n)
            if n == 0:
                return np.zeros((0,), dt)
            return np.ctypeslib.as_array(p, shape=(n,)).astype(dt, copy=True)

        nv, d = int(s.n_vecs), dim
        return dict(
            ef_construction=int(s.ef_construction),
            ef_search=int(s.ef_search),
            num_neighbours=int(s.num_neighbours),
            num_layers=int(s.num_layers),
            layer_counts=arr(s.layer_counts, s.num_layers, np.int64),
            node_ids=arr(s.node_ids, s.n_nodes_total, np.int64),
            heap_lens=arr(s.heap_lens, s.n_nodes_total, np.int64),
            nbr_lens=arr(s.nbr_lens, s.n_nodes_total, np.int64),
            heap_ids=arr(s.heap_ids, s.heap_total, np.int64),
            heap_dists=arr(s.heap_dists, s.heap_total, np.float32),
            nbrs=arr(s.nbrs, s.nbr_total, np.int64),
            layer_multiplier=float(s.layer_multiplier),
            vec_ids=arr(s.vec_ids, s.n_vecs, np.int64),
            vecs=(
                np.ctypeslib.as_array(s.vecs, shape=(nv, d)).copy()
                if nv
                else np.zeros((0, d), np.float32)
            ),
        )
    finally:
        lib.vers_free_hnsw(ptr)
