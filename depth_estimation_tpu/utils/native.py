"""ctypes binding to the native CPU lattice engine (native/lattice_cpu.cpp).

The host-side counterpart of `ops.permutohedral`: same filter conventions,
independent implementation (C++, sort-based dedup) — used for data
preprocessing off the accelerator, as a CPU serving fallback, and as an
oracle in tests. Builds lazily with `make` on first use (g++ is in the
image; no pybind11 dependency — plain C ABI via ctypes).

API:
  lattice_filter_cpu(src, ref, normalize='none') -> np.ndarray
  LatticePlanCPU(ref): reusable plan (init/compute split) with .apply(src)
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "liblattice_cpu.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.det_lattice_filter_f32.argtypes = [
        f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.det_lattice_filter_f32.restype = ctypes.c_int
    lib.det_lattice_plan_build.argtypes = [f32p, ctypes.c_int64, ctypes.c_int]
    lib.det_lattice_plan_build.restype = ctypes.c_void_p
    lib.det_lattice_plan_apply.argtypes = [
        ctypes.c_void_p, f32p, f32p, ctypes.c_int, ctypes.c_int,
    ]
    lib.det_lattice_plan_apply.restype = ctypes.c_int
    lib.det_lattice_plan_vertices.argtypes = [ctypes.c_void_p]
    lib.det_lattice_plan_vertices.restype = ctypes.c_int64
    lib.det_lattice_plan_free.argtypes = [ctypes.c_void_p]
    lib.det_lattice_plan_free.restype = None
    _lib = lib
    return lib


def _as_f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def lattice_filter_cpu(src, ref, normalize: str = "none") -> np.ndarray:
    """One-shot native filter: (n, L), (n, d) → (n, L) float32."""
    lib = _load()
    src = _as_f32(src)
    ref = _as_f32(ref)
    n, L = src.shape
    d = ref.shape[1]
    assert ref.shape[0] == n
    out = np.empty((n, L), np.float32)
    rc = lib.det_lattice_filter_f32(
        _ptr(src), _ptr(ref), _ptr(out), n, L, d, 1 if normalize == "homogeneous" else 0
    )
    if rc != 0:
        raise RuntimeError(f"native lattice filter failed (rc={rc})")
    return out


class LatticePlanCPU:
    """Reusable native plan — build once per reference, apply many."""

    def __init__(self, ref):
        lib = _load()
        ref = _as_f32(ref)
        self._lib = lib
        self._n, self._d = ref.shape
        self._handle = lib.det_lattice_plan_build(_ptr(ref), self._n, self._d)
        if not self._handle:
            raise RuntimeError("native plan build failed")

    @property
    def num_vertices(self) -> int:
        return int(self._lib.det_lattice_plan_vertices(self._handle))

    def apply(self, src, normalize: str = "none") -> np.ndarray:
        src = _as_f32(src)
        n, L = src.shape
        assert n == self._n
        out = np.empty((n, L), np.float32)
        rc = self._lib.det_lattice_plan_apply(
            self._handle, _ptr(src), _ptr(out), L, 1 if normalize == "homogeneous" else 0
        )
        if rc != 0:
            raise RuntimeError(f"native plan apply failed (rc={rc})")
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.det_lattice_plan_free(self._handle)
            self._handle = None
