"""Loader for the native (C++) runtime components.

The C++ sources live in ``torch_nfft_tpu/csrc/`` and expose a plain C ABI
consumed through ctypes — no libtorch/pybind build dependency, mirroring how
the reference ships a compiled ``core.so`` loaded at import time
(``torch_nfft/__init__.py:11``) without requiring users to touch the build.

The shared library is compiled once with g++ into a per-version cache under
``~/.cache/torch_nfft_tpu`` on first use; set ``TORCH_NFFT_TPU_NO_NATIVE=1``
to force the pure-NumPy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["get_lib", "native_available", "plan_tables", "benes_route"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SOURCES = ["plan_builder.cpp", "benes_router.cpp"]
_CACHE_TAG = "v3"


def _build_lib() -> ctypes.CDLL | None:
    src_dir = Path(__file__).parent / "csrc"
    cache = Path(
        os.environ.get(
            "TORCH_NFFT_TPU_CACHE", Path.home() / ".cache" / "torch_nfft_tpu"
        )
    )
    cache.mkdir(parents=True, exist_ok=True)
    so_path = cache / f"libnfft_native_{_CACHE_TAG}.so"

    srcs = [str(src_dir / s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if not so_path.exists() or os.path.getmtime(so_path) < newest_src:
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            *srcs,
            "-o",
            f"{so_path}.{os.getpid()}.tmp",  # per-pid: concurrent builds race
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
        os.replace(f"{so_path}.{os.getpid()}.tmp", so_path)
    try:
        return ctypes.CDLL(str(so_path))
    except OSError:
        return None


def get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        if os.environ.get("TORCH_NFFT_TPU_NO_NATIVE"):
            _LIB = None
        else:
            _LIB = _build_lib()
            if _LIB is not None:
                _LIB.nfft_plan_count.restype = ctypes.c_int64
                _LIB.nfft_plan_fill.restype = ctypes.c_int32
                _LIB.nfft_benes_route.restype = ctypes.c_int32
        _TRIED = True
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def plan_tables(pos, batch, M, m, T, nb, K, batch_size, pick_K=None):
    """Native two-pass plan construction. Returns (tables, K) or None if the
    native library is unavailable (caller falls back to NumPy).

    pos: (n, dim) float32 C-contiguous; batch: (n,) int32 or None. When K is
    None, ``pick_K(counts)`` chooses the row capacity from the per-bin counts
    after the counting pass.
    """
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    n, dim = pos.shape
    num_bins = int(batch_size) * nb**dim
    if batch is not None:
        batch = np.ascontiguousarray(batch, dtype=np.int32)

    bin_of_point = np.empty(n, np.int64)
    counts = np.empty(num_bins, np.int64)
    S = lib.nfft_plan_count(
        _ptr(pos, ctypes.c_float),
        _ptr(batch, ctypes.c_int32) if batch is not None else None,
        ctypes.c_int64(n),
        ctypes.c_int32(dim),
        ctypes.c_int32(M),
        ctypes.c_int32(m),
        ctypes.c_int32(T),
        ctypes.c_int32(nb),
        ctypes.c_int32(K if K is not None else 1),
        ctypes.c_int64(num_bins),
        _ptr(bin_of_point, ctypes.c_int64),
        _ptr(counts, ctypes.c_int64),
    )
    if S < 0:
        return None
    if K is None:
        K = int(pick_K(counts))
        S = int(np.sum(-(-counts // K)))

    slot_pt = np.empty((S, K), np.int32)
    slot_valid = np.empty((S, K), np.float32)
    origin = np.empty((S, dim), np.int32)
    row_batch = np.empty(S, np.int32)
    inv_slot = np.empty(n, np.int32)
    order = np.empty(n, np.int32)
    row_start = np.empty(S, np.int32)
    row_count = np.empty(S, np.int32)
    rc = lib.nfft_plan_fill(
        _ptr(bin_of_point, ctypes.c_int64),
        _ptr(counts, ctypes.c_int64),
        ctypes.c_int64(n),
        ctypes.c_int32(dim),
        ctypes.c_int32(T),
        ctypes.c_int32(nb),
        ctypes.c_int32(K),
        ctypes.c_int64(num_bins),
        ctypes.c_int64(S),
        _ptr(slot_pt, ctypes.c_int32),
        _ptr(slot_valid, ctypes.c_float),
        _ptr(origin, ctypes.c_int32),
        _ptr(row_batch, ctypes.c_int32),
        _ptr(inv_slot, ctypes.c_int32),
        _ptr(order, ctypes.c_int32),
        _ptr(row_start, ctypes.c_int32),
        _ptr(row_count, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return (slot_pt, slot_valid, origin, row_batch, inv_slot, order, row_start, row_count), K


def benes_route(perm, n_threads: int | None = None):
    """Route ``perm`` (a permutation of [0, 2^q)) through the Benes network.

    Returns the per-pair swap bits as a (2q-1, n//64) uint32 array (bit
    p & 31 of word p >> 5 = pair p of that stage), or None when the native
    library is unavailable (callers fall back to the NumPy router in
    ops/pallas/benes.py — fine for small n, hours at plan scale).
    """
    lib = get_lib()
    if lib is None:
        return None
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    n = perm.shape[0]
    q = int(n).bit_length() - 1
    if (1 << q) != n or n < 64:
        raise ValueError(f"benes_route needs a power-of-two length >= 64, got {n}")
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    out = np.zeros((2 * q - 1, n // 64), np.uint32)
    rc = lib.nfft_benes_route(
        _ptr(perm, ctypes.c_int32),
        ctypes.c_int64(n),
        _ptr(out, ctypes.c_uint32),
        ctypes.c_int32(int(n_threads)),
    )
    if rc != 0:
        return None
    return out
