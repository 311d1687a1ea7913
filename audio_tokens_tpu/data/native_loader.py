"""ctypes binding for the native audio ingestion library (native/audiodec.cpp).

``decode_batch`` decodes N clips in a C++ thread pool straight into the
reflect-padded (B, pad+clip+pad) float32 buffer the device mel program
consumes — one memcpy-free handoff from disk to ``MelFrontend``.

Falls back silently when the library isn't built; ``available()`` reports
status and ``config.audio_backend`` selects the path ('auto'/'native'/'python').
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libaudiodec.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.atk_version.restype = ctypes.c_int
        lib.atk_last_error.restype = ctypes.c_char_p
        lib.atk_decode_file.restype = ctypes.c_int64
        lib.atk_decode_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.atk_decode_batch.restype = ctypes.c_int
        lib.atk_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ]
        got = lib.atk_version()
        if got != 3:
            # a bare assert would vanish under python -O and let a stale
            # libaudiodec.so be called with the wrong argument layout
            raise RuntimeError(
                f"libaudiodec ABI {got} != 3 — rebuild with "
                f"python native/build.py")
        _lib = lib
        logger.info("native audio decoder loaded: %s", _LIB_PATH)
    except Exception as e:
        logger.warning("native audio decoder unavailable: %s", e)
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def last_error() -> str:
    lib = _load()
    return lib.atk_last_error().decode() if lib else "library not loaded"


def decode_file(path, target_sr: int, max_seconds: float = 60.0) -> np.ndarray:
    """Decode one file to mono float32 at target_sr (native)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (python native/build.py)")
    max_samples = int(target_sr * max_seconds)
    out = np.empty(max_samples, np.float32)
    n = lib.atk_decode_file(
        str(path).encode(), target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
    )
    if n < 0:
        raise RuntimeError(f"decode failed for {path}: {last_error()}")
    return out[:n].copy()


def decode_batch(
    paths: List, target_sr: int, clip_samples: int, n_fft: int,
    n_threads: int = 8, row_len: Optional[int] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch decode -> (padded (B, row_len) ``dtype``, lengths (B,)).

    ``row_len`` (default pad+clip+pad) sets the output row stride directly —
    consumers with wider layouts (the megakernel's over-allocated DMA
    windows) get their final buffer in one pass instead of re-padding a
    multi-10-MB batch on the host.  ``dtype=np.int16`` selects the PCM wire
    format (sample = round(x*32768) clamped): half the host->device bytes,
    reconstructed on device as s/32768 — exact for mono 16-bit sources at
    the target rate, <=-96 dB quantization noise otherwise.  lengths[i] ==
    -1 marks a failed decode (row zeroed); caller applies the reference's
    skip-and-log semantics.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (python native/build.py)")
    dtype = np.dtype(dtype)
    try:
        fmt = {np.dtype(np.float32): 0, np.dtype(np.int16): 1}[dtype]
    except KeyError:
        raise ValueError(f"dtype must be float32 or int16, got {dtype}")
    n = len(paths)
    pad = n_fft // 2
    row_min = clip_samples + 2 * pad
    if row_len is None:
        row_len = row_min
    elif row_len < row_min:
        raise ValueError(f"row_len {row_len} < clip+2*pad {row_min}")
    out = np.empty((n, row_len), dtype)  # fully written by the library
    lengths = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.atk_decode_batch(
        c_paths, n, target_sr, clip_samples, n_fft, n_threads,
        ctypes.c_int64(row_len), fmt,
        out.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        raise RuntimeError(f"decode_batch failed: {last_error()}")
    return out, lengths
