"""ctypes binding to the native JPEG decode+resize library.

The uncached pipeline's host bound is image decode (11 x 224^2 images per
sample, SURVEY.md section 7 "hard parts").  ``native/fastimage.cc`` is the
C++ replacement for the reference's PIL-under-DataLoader-workers decode
(Code_Uncached/data_utils/dataset.py:123-144): libjpeg with DCT-domain
downscaling fused into decode, bilinear remainder, and a C++ thread pool -
called through ctypes, which releases the GIL, so Python prefetch threads
overlap for free.

Auto-builds on first use when g++ is available; every caller must be
prepared for ``available() == False`` (no compiler / no libjpeg) and fall
back to the PIL path - the stores do this transparently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

log = logging.getLogger("iisan_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
# Installed wheels don't carry native/ next to the package; deployments
# point at a prebuilt library (native/build.sh output) via this env var.
_LIB_PATH = os.environ.get(
    "IISAN_FASTIMAGE_LIB", os.path.join(_NATIVE_DIR, "libfastimage.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if "IISAN_FASTIMAGE_LIB" in os.environ:
                # explicit path that doesn't exist: report, don't auto-build
                # into a different location
                log.warning("IISAN_FASTIMAGE_LIB=%s not found", _LIB_PATH)
                return None
            try:
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True, text=True)
            except Exception as e:  # no g++ / no libjpeg dev
                log.info("fastimage native build unavailable: %s", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fastimage_decode_resize_batch.restype = ctypes.c_int
            lib.fastimage_decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            assert lib.fastimage_abi_version() == 1
            _lib = lib
        except Exception as e:  # pragma: no cover - load failure
            log.warning("fastimage load failed: %s", e)
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize_batch(jpeg_blobs: Sequence[Optional[bytes]], resize: int,
                        n_threads: int = 0) -> np.ndarray:
    """Decode a batch of JPEG byte strings to (n, resize, resize, 3) uint8.

    ``None`` entries (pad positions) and undecodable blobs come back as
    zeros - the reference's zero pad-image semantics (dataset.py:66-70).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastimage unavailable; use the PIL path")
    n = len(jpeg_blobs)
    out = np.empty((n, resize, resize, 3), dtype=np.uint8)
    datas = (ctypes.c_char_p * n)()
    lens = (ctypes.c_size_t * n)()
    for i, b in enumerate(jpeg_blobs):
        if b:
            datas[i] = b  # keeps a borrowed pointer; blobs list outlives call
            lens[i] = len(b)
        else:
            datas[i] = None
            lens[i] = 0
    if n_threads <= 0:
        n_threads = min(max(os.cpu_count() or 4, 1), 16)
    lib.fastimage_decode_resize_batch(
        datas, lens, n, resize, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def decode_resize(jpeg_blob: bytes, resize: int) -> np.ndarray:
    return decode_resize_batch([jpeg_blob], resize, n_threads=1)[0]
