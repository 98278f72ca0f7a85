"""ctypes bindings for the C++ superpixel runtime (native/superpixels.cpp).

The shared library is compiled on first use with g++ (cached next to the
source). Replaces the reference's OpenCV LSC superpixels
(``uemda/gast/superpixels.py:49-83``) and the O(H*W*49) Python
``edge_shrinking`` loop (``:129-152``) — the C++ shrink is a separable
min/max window pass.
"""

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

def _find_src() -> str:
    """Locate superpixels.cpp in the repo layout or an installed layout
    (setup.py ships it as data under <sys.prefix>/uemda_tpu_native)."""
    import sys

    candidates = [
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            "native",
            "superpixels.cpp",
        ),
        os.path.join(sys.prefix, "uemda_tpu_native", "superpixels.cpp"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        f"superpixels.cpp not found in any of: {candidates}"
    )


def _so_path(src: str) -> str:
    """Cache the compiled library next to the source if writable, else in
    the user cache dir."""
    native_dir = os.path.dirname(src)
    if os.access(native_dir, os.W_OK):
        return os.path.join(native_dir, "libsuperpixels.so")
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "uemda_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libsuperpixels.so")


_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = _find_src()
        so = _so_path(src)
        if (not os.path.exists(so)) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True,
            )
        lib = ctypes.CDLL(so)
        for fn_name in ("slic_superpixels", "lsc_superpixels"):
            fn = getattr(lib, fn_name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
            ]
        lib.edge_shrink.restype = None
        lib.edge_shrink.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def slic_superpixels(
    image: np.ndarray,
    region_size: int = 16,
    ratio: float = 0.075,
    iterations: int = 100,
    algo: str = "lsc",
) -> Tuple[int, np.ndarray]:
    """(H, W, 3) uint8 RGB -> (n_superpixels, (H, W) int32 label map).
    algo='lsc' (default, the reference's algorithm) runs kernelized linear
    spectral clustering; algo='slic' runs plain SLIC. Parameter defaults
    mirror the reference LSC call (superpixels.py:106)."""
    lib = _load()
    img = np.ascontiguousarray(image[..., :3], dtype=np.uint8)
    h, w = img.shape[:2]
    labels = np.empty((h, w), np.int32)
    fn = lib.lsc_superpixels if algo == "lsc" else lib.slic_superpixels
    n = fn(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, region_size, ctypes.c_float(ratio), iterations,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return int(n), labels


def edge_shrink(
    labels: np.ndarray, win_size: int = 3, boundary_id: int = None
) -> np.ndarray:
    """Mark every pixel with a differing label inside the (2w+1)^2 window as
    ``boundary_id`` (reference default: cnt_sup = (h/16)*(w/16),
    superpixels.py:129-133)."""
    lib = _load()
    lab = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = lab.shape
    if boundary_id is None:
        boundary_id = (h // 16) * (w // 16)
    out = np.empty_like(lab)
    lib.edge_shrink(
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h, w, win_size, boundary_id,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def superpixels_with_shrink(
    image: np.ndarray,
    region_size: int = 16,
    ratio: float = 0.075,
    iterations: int = 100,
    win_size: int = 3,
    algo: str = "lsc",
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Full offline product: (n, labels, shrunk labels with boundary id =
    (h/rs)*(w/rs), as consumed by the 's' refinement view)."""
    n, labels = slic_superpixels(image, region_size, ratio, iterations, algo)
    h, w = labels.shape
    boundary = (h // region_size) * (w // region_size)
    shrunk = edge_shrink(labels, win_size, boundary)
    return n, labels, shrunk
