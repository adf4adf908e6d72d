"""ctypes bindings + auto-build for the C++ host kernels."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostops.cpp")
_LIB = os.path.join(_DIR, "libhostops.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without openmp/native (portability)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.rays_from_krt.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.float32)]
        lib.rays_intersect_bbox.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.uint8)]
        lib.composite_background.argtypes = [
            ctypes.c_int64, np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def get_rays_from_KRT(H: int, W: int, K, R, T):
    """Native version of utils/camera.get_rays_from_KRT; numpy fallback."""
    lib = _load()
    if lib is None:
        from humannerf_tpu.utils.camera import get_rays_from_KRT as np_impl
        return np_impl(H, W, K, R, T)
    K_inv_T = np.ascontiguousarray(np.linalg.inv(np.asarray(K, np.float64)).T)
    R64 = np.ascontiguousarray(np.asarray(R, np.float64))
    T64 = np.ascontiguousarray(np.asarray(T, np.float64).ravel())
    rays_o = np.empty((H, W, 3), np.float32)
    rays_d = np.empty((H, W, 3), np.float32)
    lib.rays_from_krt(H, W, K_inv_T, R64, T64,
                      rays_o.reshape(-1), rays_d.reshape(-1))
    return rays_o, rays_d


def rays_intersect_3d_bbox(bounds, ray_o, ray_d):
    """Native ray-AABB cull; numpy fallback. Same contract as
    utils/camera.rays_intersect_3d_bbox."""
    lib = _load()
    if lib is None:
        from humannerf_tpu.utils.camera import \
            rays_intersect_3d_bbox as np_impl
        return np_impl(bounds, ray_o, ray_d)
    if isinstance(bounds, dict):
        b = np.concatenate([bounds["min_xyz"], bounds["max_xyz"]])
    else:
        b = np.asarray(bounds).reshape(-1)
    b = np.ascontiguousarray(b.astype(np.float64))
    n = ray_o.shape[0]
    ro = np.ascontiguousarray(ray_o.astype(np.float32)).reshape(-1)
    rd = np.ascontiguousarray(ray_d.astype(np.float32)).reshape(-1)
    near = np.empty(n, np.float32)
    far = np.empty(n, np.float32)
    mask = np.empty(n, np.uint8)
    lib.rays_intersect_bbox(n, ro, rd, b, near, far, mask)
    m = mask.astype(bool)
    return near[m], far[m], m


def composite_background(img: np.ndarray, mask: np.ndarray,
                         bg: np.ndarray) -> np.ndarray:
    """img = mask*img + (1-mask)*bg, in float32. Fallback: numpy."""
    lib = _load()
    img32 = np.ascontiguousarray(img, np.float32)
    if lib is None:
        return mask * img32 + (1.0 - mask) * bg[None, None, :]
    out = img32.copy()
    m32 = np.ascontiguousarray(mask, np.float32)
    bg32 = np.ascontiguousarray(bg, np.float32)
    lib.composite_background(out.shape[0] * out.shape[1],
                             out.reshape(-1), m32.reshape(-1), bg32)
    return out
