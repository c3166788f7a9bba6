"""Native video reader: ctypes wrapper over native/decode/libvlb_decode.so.

Implements the :class:`~phantom_vlb_tpu.data.video.VideoSource` protocol with
decord-compatible semantics (frame indexing by decode order,
``get_batch(indices)``), backed by the C++ libav reader.  Decoding is
forward-only with an LRU cache sized to cover the extraction pipeline's
overlapping TR windows, so a whole episode decodes in a single pass (each
frame decoded exactly once) — the reference decodes through decord's random
access with internal seeks (extractfeatures.py:303-349).

The library is built on demand with ``make`` (g++ + libav dev headers).
"""

from __future__ import annotations

import ctypes
import subprocess
from collections import OrderedDict
from pathlib import Path

import numpy as np

__all__ = ["native_lib_path", "ensure_built", "NativeVideoSource", "write_test_video"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "decode"
_LIB = None


def native_lib_path() -> Path:
    return _NATIVE_DIR / "libvlb_decode.so"


def ensure_built() -> Path:
    path = native_lib_path()
    src = _NATIVE_DIR / "vlb_decode.cpp"
    if not path.exists() or path.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    return path


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(ensure_built()))
        lib.vlb_open.restype = ctypes.c_void_p
        lib.vlb_open.argtypes = [ctypes.c_char_p]
        lib.vlb_close.argtypes = [ctypes.c_void_p]
        lib.vlb_fps.restype = ctypes.c_double
        lib.vlb_fps.argtypes = [ctypes.c_void_p]
        lib.vlb_width.restype = ctypes.c_int
        lib.vlb_width.argtypes = [ctypes.c_void_p]
        lib.vlb_height.restype = ctypes.c_int
        lib.vlb_height.argtypes = [ctypes.c_void_p]
        lib.vlb_num_frames_estimate.restype = ctypes.c_long
        lib.vlb_num_frames_estimate.argtypes = [ctypes.c_void_p]
        lib.vlb_count_frames.restype = ctypes.c_long
        lib.vlb_count_frames.argtypes = [ctypes.c_char_p]
        lib.vlb_read_next.restype = ctypes.c_long
        lib.vlb_read_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.vlb_write_test_video.restype = ctypes.c_int
        lib.vlb_write_test_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double,
        ]
        _LIB = lib
    return _LIB


def write_test_video(path: str | Path, w: int, h: int, n: int, fps: float) -> None:
    rc = _lib().vlb_write_test_video(str(path).encode(), w, h, n, fps)
    if rc != 0:
        raise RuntimeError(f"vlb_write_test_video failed: {rc}")


class NativeVideoSource:
    """Frame-exact sequential reader with an overlap cache."""

    def __init__(self, path: str | Path, cache_size: int = 256,
                 exact_count: bool = True):
        self.path = str(path)
        self._h = _lib().vlb_open(self.path.encode())
        if not self._h:
            raise IOError(f"cannot open video {path}")
        self._fps = float(_lib().vlb_fps(self._h))
        if exact_count:
            n = int(_lib().vlb_count_frames(self.path.encode()))
        else:
            n = int(_lib().vlb_num_frames_estimate(self._h))
        if n <= 0:
            raise IOError(f"cannot determine frame count for {path}")
        self._num_frames = n
        self._next = 0
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._cache_size = cache_size
        self._w = int(_lib().vlb_width(self._h))
        self._hgt = int(_lib().vlb_height(self._h))

    # VideoSource protocol -------------------------------------------------
    @property
    def fps(self) -> float:
        return self._fps

    @property
    def num_frames(self) -> int:
        return self._num_frames

    def get_batch(self, indices) -> np.ndarray:
        frames = [self._get_frame(int(i)) for i in indices]
        return np.stack(frames)

    # ----------------------------------------------------------------------
    def _reopen(self) -> None:
        _lib().vlb_close(self._h)
        self._h = _lib().vlb_open(self.path.encode())
        if not self._h:
            raise IOError(f"cannot reopen video {self.path}")
        self._next = 0

    def _decode_next(self) -> np.ndarray:
        buf = np.empty((self._hgt, self._w, 3), np.uint8)
        idx = _lib().vlb_read_next(
            self._h, buf.ctypes.data_as(ctypes.c_char_p)
        )
        if idx < 0:
            raise EOFError(f"unexpected EOF at frame {self._next} of {self.path}")
        assert idx == self._next
        self._next += 1
        self._cache[idx] = buf
        while len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return buf

    def _get_frame(self, idx: int) -> np.ndarray:
        if idx in self._cache:
            return self._cache[idx]
        if idx < self._next:
            # Backward access beyond the cache: restart the stream (rare).
            self._reopen()
            self._cache.clear()
        frame = None
        while self._next <= idx:
            frame = self._decode_next()
        assert frame is not None
        return frame

    def close(self) -> None:
        if self._h:
            _lib().vlb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
