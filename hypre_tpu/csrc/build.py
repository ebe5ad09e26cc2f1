"""Build + load the native setup kernels (ctypes, compiled on demand)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None


def load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        here = os.path.dirname(__file__)
        src = os.path.join(here, "setup_kernels.cpp")
        so = os.path.join(here, "libsetup_kernels.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.check_call([
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", src, "-o", so,
            ])
        lib = ctypes.CDLL(so)
        lib.rs_first_pass.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rs_first_pass.restype = None
        _lib = lib
        return lib


def rs_first_pass(S, ST):
    """Run the native Ruge-Stüben first pass on scipy CSR S and S^T."""
    import numpy as np

    lib = load()
    n = S.shape[0]
    s_indptr = np.ascontiguousarray(S.indptr, dtype=np.int64)
    s_indices = np.ascontiguousarray(S.indices, dtype=np.int32)
    st_indptr = np.ascontiguousarray(ST.indptr, dtype=np.int64)
    st_indices = np.ascontiguousarray(ST.indices, dtype=np.int32)
    cf = np.zeros(n, dtype=np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.rs_first_pass(
        n, ptr(s_indptr, ctypes.c_int64), ptr(s_indices, ctypes.c_int32),
        ptr(st_indptr, ctypes.c_int64), ptr(st_indices, ctypes.c_int32),
        ptr(cf, ctypes.c_int32))
    return cf
