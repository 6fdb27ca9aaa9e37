"""ctypes bindings for the native C++ runtime components.

Builds ``librecsys_native.so`` on first use (g++ -O3; see Makefile) and
exposes numpy-friendly wrappers.  Every entry point has a pure-Python
fallback in the main package, so the engine works without a compiler; the
native path accelerates host-side preprocessing (TSV parsing, k-core, CSR
builds, co-occurrence graphs) by 1-2 orders of magnitude at elec scale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librecsys_native.so")
_SRC = os.path.join(_DIR, "recsys_native.cpp")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.inter_count_rows.restype = ctypes.c_int64
        lib.inter_count_rows.argtypes = [ctypes.c_char_p]
        lib.inter_parse.restype = ctypes.c_int64
        lib.inter_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i64p, i64p, i64p, ctypes.c_int64,
        ]
        lib.kcore_filter.restype = ctypes.c_int32
        lib.kcore_filter.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, u8p,
        ]
        lib.build_csr.restype = ctypes.c_int64
        lib.build_csr.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ]
        lib.sym_norm_values.restype = None
        lib.sym_norm_values.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, f32p,
        ]
        lib.cooccurrence_topk.restype = None
        lib.cooccurrence_topk.argtypes = [
            i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, i32p, f32p,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def _p(a, t):
    return a.ctypes.data_as(t)


_I64 = ctypes.POINTER(ctypes.c_int64)
_I32 = ctypes.POINTER(ctypes.c_int32)
_U8 = ctypes.POINTER(ctypes.c_uint8)
_F32 = ctypes.POINTER(ctypes.c_float)


def parse_inter(
    path: str, user_col: int = 0, item_col: int = 1, label_col: int = 3
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _ensure_built()
    if lib is None:
        return None
    n = lib.inter_count_rows(path.encode())
    if n <= 0:
        return None
    users = np.empty(n, np.int64)
    items = np.empty(n, np.int64)
    labels = np.empty(n, np.int64)
    got = lib.inter_parse(
        path.encode(), user_col, item_col, label_col,
        _p(users, _I64), _p(items, _I64), _p(labels, _I64), n,
    )
    if got < 0:
        return None
    return users[:got], items[:got], labels[:got]


def kcore_filter(users: np.ndarray, items: np.ndarray, k: int = 5) -> Optional[np.ndarray]:
    lib = _ensure_built()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, np.int64)
    items = np.ascontiguousarray(items, np.int64)
    keep = np.empty(len(users), np.uint8)
    lib.kcore_filter(
        _p(users, _I64), _p(items, _I64), len(users),
        int(users.max()) + 1 if len(users) else 0,
        int(items.max()) + 1 if len(items) else 0,
        k, _p(keep, _U8),
    )
    return keep.astype(bool)


def build_csr(rows: np.ndarray, cols: np.ndarray, n_rows: int):
    lib = _ensure_built()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    indptr = np.empty(n_rows + 1, np.int64)
    out_cols = np.empty(len(cols), np.int64)
    nnz = lib.build_csr(
        _p(rows, _I64), _p(cols, _I64), len(rows), n_rows,
        _p(indptr, _I64), _p(out_cols, _I64),
    )
    return indptr, out_cols[:nnz]


def sym_norm_values(
    users: np.ndarray, items: np.ndarray, n_users: int, n_items: int,
    eps: float = 1e-7,
) -> Optional[np.ndarray]:
    lib = _ensure_built()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, np.int64)
    items = np.ascontiguousarray(items, np.int64)
    vals = np.empty(len(users), np.float32)
    lib.sym_norm_values(
        _p(users, _I64), _p(items, _I64), len(users), n_users, n_items,
        eps, _p(vals, _F32),
    )
    return vals


def cooccurrence_topk(
    users: np.ndarray, items: np.ndarray, n_users: int, n_items: int, k: int
):
    lib = _ensure_built()
    if lib is None:
        return None
    u_csr = build_csr(users, items, n_users)
    i_csr = build_csr(items, users, n_items)
    if u_csr is None or i_csr is None:
        return None
    idx = np.empty(n_users * k, np.int32)
    w = np.empty(n_users * k, np.float32)
    lib.cooccurrence_topk(
        _p(u_csr[0], _I64), _p(np.ascontiguousarray(u_csr[1]), _I64),
        _p(i_csr[0], _I64), _p(np.ascontiguousarray(i_csr[1]), _I64),
        n_users, k, _p(idx, _I32), _p(w, _F32),
    )
    return idx.reshape(n_users, k), w.reshape(n_users, k)
