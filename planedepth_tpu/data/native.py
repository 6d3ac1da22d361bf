"""ctypes bindings for the native data-prep library (native/pdnative.cpp).

Every entry point has a numpy fallback with identical semantics; the data
pipeline calls through :func:`resize_bicubic_native` etc. and transparently
uses whichever is available.  Build with ``python scripts/build_native.py``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_F32 = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_F64 = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_U8 = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "native", "libpdnative.so",
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pd_resize_bicubic.argtypes = [
            _F32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _F32, ctypes.c_int, ctypes.c_int,
        ]
        lib.pd_resize_nearest.argtypes = lib.pd_resize_bicubic.argtypes
        lib.pd_photometric_aug.argtypes = [
            _F32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, _F32,
        ]
        lib.pd_velodyne_to_depth.argtypes = [
            _F32, ctypes.c_int, _F64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, _F32,
        ]
        lib.pd_u8_to_f32.argtypes = [_U8, ctypes.c_int, _F32]
        lib.pd_version.restype = ctypes.c_int
        assert lib.pd_version() == 1
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def resize_bicubic_native(img: np.ndarray, out_hw) -> Optional[np.ndarray]:
    """Native bicubic align_corners=True resize; None if lib missing."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = img.shape
    ho, wo = out_hw
    out = np.empty((ho, wo, c), np.float32)
    lib.pd_resize_bicubic(img, h, w, c, out, ho, wo)
    return out


def resize_nearest_native(img: np.ndarray, out_hw) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    if img.ndim == 2:
        img3 = img[..., None]
        out = resize_nearest_native(img3, out_hw)
        return None if out is None else out[..., 0]
    h, w, c = img.shape
    ho, wo = out_hw
    out = np.empty((ho, wo, c), np.float32)
    lib.pd_resize_nearest(img, h, w, c, out, ho, wo)
    return out


def photometric_aug_native(
    img: np.ndarray, gamma: float, brightness: float, channel_factors
) -> Optional[np.ndarray]:
    """Fused gamma -> brightness(clip) -> per-channel(clip), in place."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = img.shape
    cf = np.ascontiguousarray(channel_factors, dtype=np.float32)
    lib.pd_photometric_aug(img, h, w, c, gamma, brightness, cf)
    return img


def velodyne_to_depth_native(
    points: np.ndarray, P: np.ndarray, h: int, w: int,
    use_x_as_depth: bool = False,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    P = np.ascontiguousarray(P[:3, :4], dtype=np.float64)
    out = np.empty((h, w), np.float32)
    lib.pd_velodyne_to_depth(pts, pts.shape[0], P, h, w,
                             int(use_x_as_depth), out)
    return out


def u8_to_f32_native(img: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.pd_u8_to_f32(img, img.size, out.reshape(-1))
    return out
