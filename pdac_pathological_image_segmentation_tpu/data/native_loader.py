"""ctypes bindings for the native C++ batch PNG decoder.

Replaces the reference's PIL-in-DataLoader-worker decode hot loop
(reference ``dataset.py:24-30`` — the CPU bottleneck called out in
SURVEY.md §3.1) with a GIL-free C++ thread pool (``native/pngloader.cpp``)
that inflates+unfilters scanlines directly into the NHWC uint8 batch buffer
that ships to the device.

The library auto-builds with ``g++`` on first use (cached next to the
source); any build/decode failure falls back to PIL per image, so the
pipeline never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
# Portable codegen on purpose: a shipped/cached binary must not SIGILL on a
# host lacking the build machine's ISA extensions (no -march=native).
_BUILD_CMD = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared"]

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _lib_path() -> Optional[str]:
    """Build-artifact path keyed by a hash of the source + compile flags, so
    a stale binary can never shadow ``pngloader.cpp`` changes and we never
    dlopen a binary we didn't build from the checked-in source."""
    src = os.path.join(_NATIVE_DIR, "pngloader.cpp")
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(
            f.read() + " ".join(_BUILD_CMD).encode()
        ).hexdigest()[:12]
    return os.path.join(_NATIVE_DIR, f"libpngloader-{digest}.so")


def _build(lib_path: str) -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "pngloader.cpp")
    try:
        subprocess.run(
            _BUILD_CMD + ["-o", lib_path, src, "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return lib_path
    except Exception:
        return None


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _lib_path()
        if path is not None and not os.path.exists(path):
            path = _build(path)
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.decode_png_batch.restype = ctypes.c_int
        lib.decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.png_info.restype = ctypes.c_int
        lib.png_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def png_info(path: str) -> Optional[Tuple[int, int]]:
    """(height, width) of a PNG via the native header probe, or None."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int32(0)
    w = ctypes.c_int32(0)
    rc = lib.png_info(path.encode(), ctypes.byref(h), ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None


def _pil_decode_into(path: str, out: np.ndarray) -> bool:
    from PIL import Image

    try:
        img = Image.open(path)
        if out.shape[-1] == 3:
            arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        else:
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 3:
                arr = arr[..., 0]
            arr = arr[..., None]
        if arr.shape != out.shape:
            return False
        out[...] = arr
        return True
    except Exception:
        return False


def decode_batch(
    paths: Sequence[str], height: int, width: int, channels: int,
    threads: int = 8, out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode ``paths`` into an (N, H, W, C) uint8 array.

    Uses the native thread-pool decoder; images it rejects (16-bit,
    interlaced, wrong size) are decoded by PIL.  Raises on images neither
    path can decode.
    """
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, channels), dtype=np.uint8)
    assert out.shape == (n, height, width, channels) and out.dtype == np.uint8

    lib = _get_lib()
    status = np.zeros(n, dtype=np.int32)
    if lib is not None and n:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = lib.decode_png_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height, width, channels, threads,
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        failures = n
        status[:] = -1

    if failures:
        for i in np.nonzero(status != 0)[0]:
            if not _pil_decode_into(paths[int(i)], out[int(i)]):
                raise IOError(
                    f"cannot decode {paths[int(i)]} "
                    f"(native rc={int(status[i])})"
                )
    return out
