"""ctypes bindings for the native host runtime (``native/host_ops.cpp``).

The native layer plays the role of the reference's C++ driver code
(``Examples/Stereo-Inertial/stereo_inertial_euroc.cc``): image decode,
rectification (``cv::remap``), and a threaded prefetch feeder. Everything
degrades gracefully to the numpy fallbacks in ``datasets.py`` if the
toolchain is unavailable (the library is built lazily with ``make``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
    )


def load():
    """Load (building if needed) the native library; raises on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _Module(_lib)
        if _tried:
            raise RuntimeError("native host_ops unavailable")
        _tried = True
        d = _native_dir()
        so = os.path.join(d, "libhost_ops.so")
        if not os.path.exists(so):
            subprocess.run(
                ["make", "-s", "libhost_ops.so"], cwd=d, check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.decode_gray.restype = ctypes.c_int
        lib.decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.remap_bilinear.restype = None
        lib.remap_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.feeder_create.restype = ctypes.c_void_p
        lib.feeder_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.feeder_next.restype = ctypes.c_int
        lib.feeder_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.feeder_destroy.restype = None
        lib.feeder_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _Module(_lib)


def _fptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class _Module:
    def __init__(self, lib):
        self._lib = lib

    def load_gray(self, path: str, cap_h: int = 2048,
                  cap_w: int = 2048) -> Optional[np.ndarray]:
        """Decode PNG/PGM to float32 gray; None if format unsupported."""
        buf = np.empty((cap_h, cap_w), np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.decode_gray(
            path.encode(), _fptr(buf), cap_h, cap_w,
            ctypes.byref(h), ctypes.byref(w),
        )
        if rc != 0:
            return None
        return np.ascontiguousarray(buf[: h.value, : w.value])

    def remap_bilinear(self, img: np.ndarray, map_x: np.ndarray,
                       map_y: np.ndarray) -> np.ndarray:
        img = np.ascontiguousarray(img, np.float32)
        h, w = img.shape
        out = np.empty_like(img)
        self._lib.remap_bilinear(
            _fptr(img), h, w,
            _fptr(np.ascontiguousarray(map_x, np.float32)),
            _fptr(np.ascontiguousarray(map_y, np.float32)), _fptr(out),
        )
        return out


class StereoFeeder:
    """Prefetching decode+rectify pipeline over the native thread pool.

    Replaces the reference's synchronous per-frame imread/remap in the
    driver loop with lookahead decoding, so the tracker never waits on disk.
    Falls back to synchronous Python decode if the native lib is missing.
    """

    def __init__(
        self,
        left_paths: List[str],
        right_paths: Optional[List[str]],
        height: int,
        width: int,
        maps_l=None,  # (map_x, map_y) or None
        maps_r=None,
        depth: int = 6,
        workers: int = 3,
    ):
        self.n = len(left_paths)
        self.h, self.w = height, width
        self._i = 0
        self._native = None
        self._handle = None
        self._paths = (left_paths, right_paths)
        self._maps = (maps_l, maps_r)
        try:
            self._native = load()
        except Exception:
            return
        LP = (ctypes.c_char_p * self.n)(*[p.encode() for p in left_paths])
        RP = None
        if right_paths is not None:
            RP = (ctypes.c_char_p * self.n)(*[p.encode() for p in right_paths])
        self._keep = (LP, RP)  # keep alive
        mlx = mly = mrx = mry = None
        if maps_l is not None:
            mlx = np.ascontiguousarray(maps_l[0], np.float32)
            mly = np.ascontiguousarray(maps_l[1], np.float32)
        if maps_r is not None:
            mrx = np.ascontiguousarray(maps_r[0], np.float32)
            mry = np.ascontiguousarray(maps_r[1], np.float32)
        self._keep_maps = (mlx, mly, mrx, mry)
        self._handle = self._native._lib.feeder_create(
            LP, RP, self.n, height, width,
            _fptr(mlx), _fptr(mly), _fptr(mrx), _fptr(mry), depth, workers,
        )

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= self.n:
            self.close()
            raise StopIteration
        self._i += 1
        if self._handle is not None:
            out_l = np.empty((self.h, self.w), np.float32)
            out_r = (
                np.empty((self.h, self.w), np.float32)
                if self._paths[1] is not None else None
            )
            rc = self._native._lib.feeder_next(
                self._handle, _fptr(out_l), _fptr(out_r)
            )
            if rc != 0:
                raise IOError(f"decode failed for frame {self._i - 1} rc={rc}")
            return out_l, out_r
        # fallback: synchronous python decode
        from orb_slam3_detailed_comments_kor_tpu.io import datasets as ds

        i = self._i - 1
        left_paths, right_paths = self._paths
        maps_l, maps_r = self._maps
        img_l = ds.load_gray(left_paths[i])
        if maps_l is not None:
            img_l = ds.remap_bilinear(img_l, maps_l[0], maps_l[1])
        img_r = None
        if right_paths is not None:
            img_r = ds.load_gray(right_paths[i])
            if maps_r is not None:
                img_r = ds.remap_bilinear(img_r, maps_r[0], maps_r[1])
        return img_l, img_r

    def close(self):
        if self._handle is not None:
            self._native._lib.feeder_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
