"""ctypes bindings for the native C++ video decode loader.

``NativeVideoReader`` is drop-in for :class:`retargetvid_tpu.io.video.
VideoReader`'s ``chunks``/``frames`` surface, but decode + BGR->RGB run in a
C++ worker thread (no GIL on the decode path; chunk assembly is one memcpy
into a caller-owned numpy buffer).  The shared object builds on first use
with the repo Makefile; callers fall back to the Python reader when the
toolchain or OpenCV dev headers are absent (``open_reader``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent / 'native'
_LIB_PATH = _NATIVE_DIR / 'libvideoreader.so'
_LIB = None
_BUILD_FAILED = False


def _load_library():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    if not _LIB_PATH.exists():
        try:
            subprocess.run(['make', '-C', str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _BUILD_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _BUILD_FAILED = True
        return None
    lib.vr_open.restype = ctypes.c_void_p
    lib.vr_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.vr_probe.restype = None
    lib.vr_probe.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_double)]
    lib.vr_next_batch.restype = ctypes.c_int
    lib.vr_next_batch.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int]
    lib.vr_close.restype = None
    lib.vr_close.argtypes = [ctypes.c_void_p]
    lib.vr_last_error.restype = ctypes.c_char_p
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class NativeVideoReader:
    """C++-threaded decoder yielding RGB uint8 frame chunks."""

    def __init__(self, path, queue_size: int = 256):
        lib = _load_library()
        if lib is None:
            raise RuntimeError('native video reader unavailable '
                               '(build failed or OpenCV missing)')
        self._lib = lib
        self._handle = lib.vr_open(str(path).encode(), queue_size)
        if not self._handle:
            raise FileNotFoundError(
                lib.vr_last_error().decode() or f'cannot open {path}')
        probe = (ctypes.c_double * 4)()
        lib.vr_probe(self._handle, probe)
        self.fps = float(probe[0])
        self.frame_count = int(probe[1])
        self.width = int(probe[2])
        self.height = int(probe[3])

    def chunks(self, chunk_size: int) -> Iterator[Tuple[np.ndarray, int]]:
        start = 0
        while True:
            buf = np.empty((chunk_size, self.height, self.width, 3),
                           np.uint8)
            n = self._lib.vr_next_batch(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                chunk_size)
            if n <= 0:
                return
            yield buf[:n], start
            start += n
            if n < chunk_size:
                return

    def frames(self) -> Iterator[np.ndarray]:
        for chunk, _ in self.chunks(64):
            yield from chunk

    def stop(self):
        if self._handle:
            self._lib.vr_close(self._handle)
            self._handle = None

    def __del__(self):                                  # pragma: no cover
        try:
            self.stop()
        except Exception:
            pass


def open_reader(path, queue_size: int = 256, prefer_native: bool = True):
    """Best-available reader: native C++ loader, else the Python thread."""
    if prefer_native and native_available():
        try:
            return NativeVideoReader(path, queue_size)
        except (RuntimeError, FileNotFoundError):
            pass
    from retargetvid_tpu.io.video import VideoReader
    return VideoReader(path, queue_size)
