"""ctypes bindings for the native C++ road-graph engine (native/roadgraph.cpp).

Compiled on first import with g++ (no pybind11 in the image — C ABI + ctypes).
`cilrs_tpu.maps.routing` falls back to pure-Python Dijkstra when the toolchain
is unavailable; the native path is ~10^4x faster on full town graphs, which
matters because fleet setup traces hundreds of routes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "roadgraph.cpp",
)
_LIB_DIR = os.path.join(os.path.dirname(_SRC), "build")
_LIB = os.path.join(_LIB_DIR, "libroadgraph.so")


def _compile() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
    return _LIB


_lib = ctypes.CDLL(_compile())
_lib.rg_build.restype = ctypes.c_void_p
_lib.rg_build.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
]
_lib.rg_free.argtypes = [ctypes.c_void_p]
_lib.rg_shortest_path.restype = ctypes.c_int32
_lib.rg_shortest_path.argtypes = [
    ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
]
_lib.rg_shortest_paths.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32),
]
_lib.rg_distances.argtypes = [
    ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
]

_MAX_PATH = 8192


class _NativeGraph:
    def __init__(self, handle: int, W: int):
        self._h = handle
        self.W = W

    def __del__(self):
        if getattr(self, "_h", None) and _lib is not None:
            _lib.rg_free(self._h)
            self._h = None


def build(xy: np.ndarray, nxt: np.ndarray, num_next: np.ndarray) -> _NativeGraph:
    xy = np.ascontiguousarray(xy, np.float32)
    nxt = np.ascontiguousarray(nxt, np.int32)
    num_next = np.ascontiguousarray(num_next, np.int32)
    W, max_next = nxt.shape
    h = _lib.rg_build(
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nxt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_next.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        W, max_next,
    )
    return _NativeGraph(h, W)


def shortest_path(g: _NativeGraph, src: int, dst: int) -> np.ndarray:
    out = np.empty(_MAX_PATH, np.int32)
    n = _lib.rg_shortest_path(
        g._h, src, dst, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _MAX_PATH
    )
    return out[:n].copy()


def shortest_paths(g: _NativeGraph, srcs: np.ndarray, dsts: np.ndarray,
                   max_len: int = _MAX_PATH):
    srcs = np.ascontiguousarray(srcs, np.int32)
    dsts = np.ascontiguousarray(dsts, np.int32)
    count = len(srcs)
    out = np.empty((count, max_len), np.int32)
    lens = np.empty(count, np.int32)
    _lib.rg_shortest_paths(
        g._h, srcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dsts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, lens


def distances(g: _NativeGraph, src: int) -> np.ndarray:
    out = np.empty(g.W, np.float32)
    _lib.rg_distances(g._h, src, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
