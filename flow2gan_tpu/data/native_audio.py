"""ctypes bindings for the native WAV loader (data/native/wav_loader.cpp).

Builds the shared library lazily with g++ on first use (cached next to the
source); falls back silently to the pure-Python reader when no compiler is
available or FLOW2GAN_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwavloader.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "wav_loader.cpp"
    try:
        subprocess.run(
            [
                os.environ.get("CXX", "g++"),
                "-O3",
                "-march=native",
                "-fPIC",
                "-shared",
                "-o",
                str(_LIB_PATH),
                str(src),
                "-lm",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logging.info(f"native wav loader build failed ({e}); using Python reader")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("FLOW2GAN_NO_NATIVE") == "1":
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists():
            src = _NATIVE_DIR / "wav_loader.cpp"
            if not src.exists() or not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            logging.info(f"native wav loader load failed: {e}")
            return None
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_decode_crop.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wav_decode_crop.restype = ctypes.c_longlong
        lib.peak_normalize_db.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_float,
        ]
        lib.rms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
        lib.rms.restype = ctypes.c_float
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path) -> Optional[Tuple[int, int, int]]:
    """(sample_rate, num_frames, channels) or None if unreadable natively."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int()
    n = ctypes.c_longlong()
    ch = ctypes.c_int()
    rc = lib.wav_info(str(path).encode(), ctypes.byref(sr), ctypes.byref(n),
                      ctypes.byref(ch))
    if rc != 0:
        return None
    return sr.value, n.value, ch.value


def read_crop_mono(path, start: int, count: int) -> Optional[np.ndarray]:
    """Decode `count` frames at `start` as mono float32, or None on failure
    (caller falls back to the Python reader)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, np.float32)
    got = lib.wav_decode_crop(
        str(path).encode(),
        start,
        count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        return None
    return out[:got]


def peak_normalize_db_(x: np.ndarray, db: float) -> np.ndarray:
    """In-place native peak normalization; returns x."""
    lib = get_lib()
    if lib is None or x.dtype != np.float32 or not x.flags.c_contiguous:
        from flow2gan_tpu.data.audio_io import peak_normalize_db

        return peak_normalize_db(x, db)
    lib.peak_normalize_db(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, db
    )
    return x
