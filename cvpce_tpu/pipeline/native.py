"""ctypes bindings for the native planogram graph engine
(native/graph_match.cpp).

Builds the shared library on first use (g++ -O3) and exposes
`build_graph` / `large_common_subgraph` with the same contracts as the
Python implementations in pipeline/planograms.py. Falls back silently if
no compiler is available; `available()` reports the state.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from os import path
from typing import Dict, Optional, Sequence, Set, Tuple

import networkx as nx
import numpy as np

from .planograms import CARDINALS

_REPO_ROOT = path.dirname(path.dirname(path.dirname(path.abspath(__file__))))
_SRC = path.join(_REPO_ROOT, "native", "graph_match.cpp")
_BUILD_DIR = path.join(_REPO_ROOT, "native", "build")
_LIB = path.join(_BUILD_DIR, "libgraphmatch.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if path.exists(_LIB) and path.getmtime(_LIB) >= path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native graph engine build failed: {e}")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib_path = _build()
    if lib_path is None:
        return None
    lib = ctypes.CDLL(lib_path)
    lib.build_graph.restype = ctypes.c_int32
    lib.build_graph.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.large_common_subgraph.restype = ctypes.c_int32
    lib.large_common_subgraph.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr_f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ptr_i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_graph(boxes, labels: Sequence, thresh_size: float = 0.5
                ) -> nx.DiGraph:
    """Native-accelerated version of pipeline.planograms.build_graph."""
    lib = _load()
    assert lib is not None, "native graph engine unavailable"
    boxes = np.ascontiguousarray(np.asarray(boxes, np.float32))
    n = len(boxes)
    cap = max(16 * n, 64)
    edges = np.empty((cap, 3), np.int32)
    weights = np.empty(cap, np.float32)
    cnt = lib.build_graph(_ptr_f32(boxes), n, ctypes.c_float(thresh_size),
                          _ptr_i32(edges), _ptr_f32(weights), cap)
    assert cnt >= 0, "edge capacity exceeded"

    g = nx.DiGraph()
    g.add_nodes_from((i, {"label": labels[i]}) for i in range(n))
    for k in range(cnt):
        i, j, d = edges[k]
        g.add_edge(int(i), int(j), dir=CARDINALS[int(d)],
                   weight=float(weights[k]))
    return g


def _graph_arrays(g: nx.DiGraph, label_ids: Dict) -> Tuple[np.ndarray, ...]:
    nodes = sorted(g.nodes)
    index = {node: i for i, node in enumerate(nodes)}
    labels = np.asarray(
        [label_ids.setdefault(g.nodes[node]["label"], len(label_ids))
         for node in nodes], np.int32)
    rows = []
    for u in nodes:
        for v in g[u]:
            rows.append((index[u], index[v],
                         CARDINALS.index(g[u][v]["dir"])))
    edges = (np.asarray(rows, np.int32) if rows
             else np.zeros((0, 3), np.int32))
    return labels, edges, np.asarray(nodes)


def large_common_subgraph(g1: nx.DiGraph, g2: nx.DiGraph,
                          min_score: float = -0.2,
                          stop_at_fraction: float = 0.5) -> Set[Tuple]:
    """Native-accelerated version of
    pipeline.planograms.large_common_subgraph."""
    lib = _load()
    assert lib is not None, "native graph engine unavailable"
    label_ids: Dict = {}
    l1, e1, nodes1 = _graph_arrays(g1, label_ids)
    l2, e2, nodes2 = _graph_arrays(g2, label_ids)
    cap = max(min(len(l1), len(l2)), 1)
    out = np.empty((cap, 2), np.int32)
    cnt = lib.large_common_subgraph(
        len(l1), _ptr_i32(l1), _ptr_i32(np.ascontiguousarray(e1)), len(e1),
        len(l2), _ptr_i32(l2), _ptr_i32(np.ascontiguousarray(e2)), len(e2),
        ctypes.c_float(min_score), ctypes.c_float(stop_at_fraction),
        _ptr_i32(out), cap,
    )
    assert cnt >= 0, "pair capacity exceeded"
    return {(int(nodes1[a]), int(nodes2[b])) for a, b in out[:cnt]}
