"""ctypes bindings + auto-build for the C++ threaded frame loader.

native/frameloader.cpp decodes JPEG/PNG frames on worker threads (libjpeg/
libpng, GIL-free) and hands them to Python strictly in order — host decode
overlaps device compute in the batched video path (the reference decodes on
the Python thread via PIL, reference: pipeline.py:1086-1099).

The shared library builds on first use with the system toolchain and is
cached next to the source; every entry point degrades gracefully (returns
None / PIL fallback) when the toolchain or decode libs are unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "frameloader.cpp"
_LIB = _SRC.parent / "_frameloader.so"
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-ljpeg", "-lpng",
           "-o", str(_LIB)]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        print(f"[native_loader][warn] build failed:\n{res.stderr[-500:]}")
        return False
    return True


def get_lib():
    """The loaded shared library, building it on first use; None if broken."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _lib_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.fl_open.restype = ctypes.c_void_p
        lib.fl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
        lib.fl_next_info.restype = ctypes.c_int
        lib.fl_next_info.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.fl_next_copy.restype = ctypes.c_int
        lib.fl_next_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.fl_close.restype = None
        lib.fl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError as e:
        print(f"[native_loader][warn] unavailable: {e}")
        _lib_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


class NativeFrameLoader:
    """In-order iterator over decoded RGB uint8 frames with C++ prefetch.

    Falls back to PIL per-frame when a file fails to decode natively."""

    def __init__(self, paths, threads: int = 4, capacity: int = 16):
        self.paths = [str(p) for p in paths]
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native frame loader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._keepalive = arr
        self._h = lib.fl_open(arr, len(self.paths), threads, capacity)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= len(self.paths):
            raise StopIteration
        hh = ctypes.c_int()
        ww = ctypes.c_int()
        rc = self._lib.fl_next_info(self._h, ctypes.byref(hh), ctypes.byref(ww))
        if rc == -1:
            raise StopIteration
        if rc == -2:
            # native decode failed → skip the slot, decode with PIL
            self._lib.fl_next_copy(self._h, None)
            from PIL import Image

            img = np.asarray(Image.open(self.paths[self._i]).convert("RGB"))
            self._i += 1
            return img
        out = np.empty((hh.value, ww.value, 3), np.uint8)
        self._lib.fl_next_copy(self._h, out.ctypes.data_as(ctypes.c_void_p))
        self._i += 1
        return out

    def close(self):
        if self._h:
            self._lib.fl_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
