"""ctypes bindings for the native byte-shuffle + zstd slab codec.

Compiled on first use with g++ (cached next to the source, like
geometry/native); falls back to a pure-Python numpy-shuffle + zlib codec
when the toolchain or libzstd is unavailable (or ``XLB_TPU_NO_NATIVE=1``).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "compress.cpp")
_LIB = os.path.join(_HERE, "libslabcodec.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    # compile to a temp file and os.replace() into place: the atomic rename
    # keeps a concurrently-compiling sibling process from dlopen'ing a
    # partially written .so (advisor finding, round 2)
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC, "-lzstd"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("XLB_TPU_NO_NATIVE"):
            _build_failed = True
            return None
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sc_bound.argtypes = [ctypes.c_int64]
        lib.sc_bound.restype = ctypes.c_int64
        lib.sc_compress.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, u8p, ctypes.c_int64, ctypes.c_int32]
        lib.sc_compress.restype = ctypes.c_int64
        lib.sc_decompress.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int32]
        lib.sc_decompress.restype = ctypes.c_int64
        _lib = lib
    return _lib


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress(array, level=1):
    """Compress a contiguous ndarray -> bytes (byte-shuffled + zstd).
    Falls back to numpy shuffle + zlib when the native codec is absent."""
    a = np.ascontiguousarray(array)
    lib = _load()
    if lib is None:
        import zlib

        planes = a.reshape(-1).view(np.uint8).reshape(-1, a.itemsize).T
        return zlib.compress(np.ascontiguousarray(planes).tobytes(), 1)
    n = a.size
    cap = int(lib.sc_bound(n * a.itemsize))
    dst = np.empty(cap, dtype=np.uint8)
    src = a.reshape(-1).view(np.uint8)
    size = int(lib.sc_compress(_u8(src), n, a.itemsize, _u8(dst), cap, int(level)))
    if size < 0:
        raise RuntimeError("zstd compression failed")
    return dst[:size].tobytes()


def decompress(blob, shape, dtype):
    """Inverse of :func:`compress` -> ndarray of the given shape/dtype."""
    dtype = np.dtype(dtype)
    out = np.empty(shape, dtype=dtype)
    n = out.size
    lib = _load()
    if lib is None:
        import zlib

        raw = np.frombuffer(zlib.decompress(blob), dtype=np.uint8)
        planes = raw.reshape(dtype.itemsize, n).T
        out.reshape(-1).view(np.uint8)[...] = np.ascontiguousarray(planes).reshape(-1)
        return out
    src = np.frombuffer(blob, dtype=np.uint8)
    size = int(lib.sc_decompress(_u8(src), src.size, _u8(out.reshape(-1).view(np.uint8)), n, dtype.itemsize))
    if size < 0:
        raise RuntimeError("zstd decompression failed")
    return out
