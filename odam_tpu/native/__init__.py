"""Native (C++) host components, loaded via ctypes with lazy build.

The reference's only native component is its Cython/C++ superquadric sampler
(SURVEY.md C1); :func:`sample_sq_batch` is the equivalent here — used for
host-side parity validation of the on-device sampler and as a fast CPU path
for tooling.  The shared library is compiled on first use with g++ and
cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sq_sampler.cpp")
_LIB = os.path.join(_HERE, "libodam_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.odam_sample_sq_batch.restype = ctypes.c_int
        lib.odam_sample_sq_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return lib


def sample_sq_batch(scales: np.ndarray, epsilons: np.ndarray,
                    n_samples: int = 1000, grid: int = 201, seed: int = 0,
                    deterministic: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Sample (eta, omega) angle pairs for a batch of superquadrics.

    Args:
        scales: [B, M, 3] axis scales; epsilons: [B, M, 2] exponents.
        deterministic: stratified/golden-ratio mode (matches the on-device
            sampler); False = seeded mt19937 draws (reference-compatible
            randomized semantics, seed 0 by default as in _sampler.pyx:438).

    Returns:
        (etas [B, M, N], omegas [B, M, N]) float32.
    """
    lib = load_library()
    scales = np.ascontiguousarray(scales, np.float32)
    epsilons = np.ascontiguousarray(epsilons, np.float32)
    assert scales.ndim == 3 and scales.shape[-1] == 3, scales.shape
    assert epsilons.shape == scales.shape[:2] + (2,), epsilons.shape
    B, M = scales.shape[:2]
    etas = np.empty((B, M, n_samples), np.float32)
    omegas = np.empty((B, M, n_samples), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.odam_sample_sq_batch(
        scales.ctypes.data_as(fp), epsilons.ctypes.data_as(fp),
        B, M, n_samples, grid, seed, 0 if not deterministic else 1,
        etas.ctypes.data_as(fp), omegas.ctypes.data_as(fp),
    )
    if rc != 0:
        raise RuntimeError(f"odam_sample_sq_batch failed with code {rc}")
    return etas, omegas
