"""ctypes bindings to the native IO runtime (native/mqio.cpp).

Builds the shared library on first use with the system g++ and caches it
next to the source.  Every entry point has a pure-Python fallback, so the
framework runs (slower) without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "_mqio.so"
_LIB = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _NATIVE_DIR / "mqio.cpp"
    if not src.exists():
        return None
    try:
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", str(src),
                 "-o", str(_SO_PATH), "-lz"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.mqio_read_raw_batch.restype = ctypes.c_int
        lib.mqio_read_raw_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mqio_write_png.restype = ctypes.c_int
        lib.mqio_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mqio_destride_plane.restype = None
        lib.mqio_destride_plane.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        for name in ("mqio_read_raw_batch_mt", "mqio_write_png_batch"):
            if not hasattr(lib, name):  # stale .so without MT entry points
                raise OSError(f"{name} missing; rebuild")
        lib.mqio_read_raw_batch_mt.restype = ctypes.c_int
        lib.mqio_read_raw_batch_mt.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.mqio_write_png_batch.restype = ctypes.c_int
        lib.mqio_write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _LIB = lib
    except Exception as e:  # pragma: no cover
        print(f"[Info] native mqio unavailable ({e}); using Python fallbacks")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def read_raw_batch(paths: List[Path], frame_bytes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Read n same-sized binary frames into one contiguous (n, frame_bytes)
    uint8 array.  Returns (buffer, ok mask)."""
    n = len(paths)
    out = np.zeros((n, frame_bytes), np.uint8)
    ok = np.zeros(n, np.uint8)
    lib = _load()
    if lib is not None and n:
        arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        lib.mqio_read_raw_batch_mt(
            arr, n, frame_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            0,  # auto thread count
        )
        return out, ok.astype(bool)
    for i, p in enumerate(paths):  # fallback
        try:
            buf = np.fromfile(p, dtype=np.uint8)
        except (FileNotFoundError, OSError):
            continue
        if len(buf) == frame_bytes:
            out[i] = buf
            ok[i] = 1
    return out, ok.astype(bool)


def write_png(path: Path, img: np.ndarray, compression_level: int = 3) -> bool:
    """Native PNG encode (gray8 or 3-channel).  3-channel input is BGR (the
    pipeline's convention); PNG stores RGB, so channels are swapped here.
    Returns False when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img)
    if img.ndim == 2:
        channels = 1
        data = img
    elif img.ndim == 3 and img.shape[2] == 3:
        channels = 3
        data = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
    else:
        return False
    rc = lib.mqio_write_png(
        str(path).encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[1], img.shape[0], channels, compression_level,
    )
    return rc == 0


def write_png_batch(paths: List[Path], imgs: np.ndarray,
                    compression_level: int = 3,
                    n_threads: int = 0) -> np.ndarray:
    """Parallel native PNG encode of a (n, H, W[, 3]) batch (BGR input for
    3-channel, matching the pipeline convention).  Returns a success mask;
    falls back to per-image write_png / zlib-free paths when the native
    library is unavailable."""
    n = len(paths)
    ok = np.zeros(n, bool)
    if n == 0:
        return ok
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    lib = _load()
    if lib is not None and imgs.ndim in (3, 4):
        channels = 1 if imgs.ndim == 3 else imgs.shape[3]
        if channels in (1, 3):
            data = imgs if channels == 1 else np.ascontiguousarray(
                imgs[..., ::-1])  # BGR -> RGB
            okc = np.zeros(n, np.uint8)
            arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
            lib.mqio_write_png_batch(
                arr, data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n, imgs.shape[2], imgs.shape[1], channels,
                compression_level,
                okc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n_threads,
            )
            return okc.astype(bool)
    for i, p in enumerate(paths):  # fallback
        ok[i] = write_png(p, imgs[i], compression_level)
    return ok
