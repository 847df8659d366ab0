"""ctypes bindings for the native C++ voxelizer.

The shared library is compiled on first use with g++ (-O3 -fopenmp) and
cached next to the source; set ``XLB_TPU_NO_NATIVE=1`` to force the pure
NumPy fallback in xlb_tpu.geometry.voxelize.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "voxelizer.cpp")
_LIB = os.path.join(_HERE, "libvoxelizer.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    # atomic temp + rename so concurrent processes never load a partial .so
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", "-o", tmp, _SRC]
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
            import warnings

            warnings.warn(
                "native voxelizer unavailable (g++ build failed); mesh voxelization "
                "falls back to the much slower pure-NumPy path",
                RuntimeWarning,
            )
            return None

        c_double_p = ctypes.POINTER(ctypes.c_double)
        c_uint8_p = ctypes.POINTER(ctypes.c_uint8)
        lib.voxelize_ray.argtypes = [c_double_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, c_double_p, ctypes.c_double, c_uint8_p]
        lib.winding_numbers.argtypes = [c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64, c_double_p]
        lib.directional_distances.argtypes = [c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64, c_double_p]
        lib.triangle_shell.argtypes = [c_double_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, c_double_p, ctypes.c_double, c_uint8_p]
        _lib = lib
    return _lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ray_fill(tris, shape, origin, spacing):
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    origin = np.ascontiguousarray(origin, dtype=np.float64)
    out = np.zeros(shape, dtype=np.uint8)
    lib.voxelize_ray(_dptr(tris), tris.shape[0], shape[0], shape[1], shape[2], _dptr(origin), float(spacing), _u8ptr(out))
    return out.astype(bool)


def shell(tris, shape, origin, spacing):
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    origin = np.ascontiguousarray(origin, dtype=np.float64)
    out = np.zeros(shape, dtype=np.uint8)
    lib.triangle_shell(_dptr(tris), tris.shape[0], shape[0], shape[1], shape[2], _dptr(origin), float(spacing), _u8ptr(out))
    return out.astype(bool)


def winding(tris, points):
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    points = np.ascontiguousarray(points, dtype=np.float64)
    out = np.zeros(points.shape[0], dtype=np.float64)
    lib.winding_numbers(_dptr(tris), tris.shape[0], _dptr(points), points.shape[0], _dptr(out))
    return out


def directional_distances_native(tris, voxels, directions):
    """Native Moller-Trumbore sweep for geometry.distances; None -> NumPy
    fallback.  tris (m,3,3); voxels (d,n) centers; directions (d,q)."""
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, dtype=np.float64)
    origins = np.ascontiguousarray(np.asarray(voxels, dtype=np.float64).T)  # (n, 3)
    dirs = np.ascontiguousarray(np.asarray(directions, dtype=np.float64).T)  # (q, 3)
    n, q = origins.shape[0], dirs.shape[0]
    out = np.empty((q, n), dtype=np.float64)
    lib.directional_distances(_dptr(tris), tris.shape[0], _dptr(origins), n, _dptr(dirs), q, _dptr(out))
    return out


def voxelize_native(tris, shape, origin, spacing, method_name, close_voxels):
    """Native fast path for xlb_tpu.geometry.voxelize; None -> fall back."""
    lib = _load()
    if lib is None:
        return None
    if method_name == "RAY":
        return ray_fill(tris, shape, origin, spacing)
    if method_name == "AABB":
        sh = shell(tris, shape, origin, spacing)
        return sh | ray_fill(tris, shape, origin, spacing)
    if method_name == "AABB_CLOSE":
        from xlb_tpu.geometry.voxelize import _dilate, _erode

        sh = shell(tris, shape, origin, spacing)
        closed = _erode(_dilate(sh, close_voxels), close_voxels)
        return closed | ray_fill(tris, shape, origin, spacing)
    if method_name == "WINDING":
        grid = np.stack(np.meshgrid(*[np.arange(s) + 0.5 for s in shape], indexing="ij"), axis=-1)
        points = np.asarray(origin) + grid.reshape(-1, 3) * spacing
        w = winding(tris, points)
        return (w > 0.5).reshape(shape)
    return None
