"""ctypes bindings for the native data-loading core (pwcdata.cc).

The shared library is built lazily with g++ on first use and cached next to
the source. All functionality has a pure-Python fallback in
`pwcnet_tpu.data.datasets`; this module accelerates the image/.flo hot path
— PPM (FlyingChairs) and 8-bit non-interlaced PNG (Sintel) decode — with a
threaded C++ batch assembler.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "pwcdata.cc"
_LIB = _DIR / "libpwcdata.so"
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    base = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    # PNG IDAT inflate: prefer libdeflate (2.1x faster than zlib on the
    # Sintel-frame benchmark, scripts/bench_host.py); fall back to zlib
    # where libdeflate headers are absent.
    attempts = [base + ["-DUSE_LIBDEFLATE", "-ldeflate"], base + ["-lz"]]
    errors = []
    for cmd in attempts:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode == 0:
            return
        errors.append(proc.stderr[-1000:])
    raise NativeUnavailable("g++ build failed:\n" + "\n---\n".join(errors))


def load_library():
    """Build (if needed) and load the native library; raises
    NativeUnavailable when no toolchain is present."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.pwc_image_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pwc_image_size.restype = ctypes.c_int
        lib.pwc_read_flo.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pwc_read_flo.restype = ctypes.c_int
        lib.pwc_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.pwc_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


def image_size(path: str) -> tuple[int, int]:
    """(H, W) of a PPM/PNG frame via the native decoder; raises IOError
    for formats it cannot decode (the loader's decodability probe)."""
    lib = load_library()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.pwc_image_size(
        str(path).encode(), ctypes.byref(h), ctypes.byref(w)
    )
    if rc != 0:
        raise IOError(f"pwc_image_size({path}) failed with code {rc}")
    return (h.value, w.value)


def read_flo(path: str, max_hw: tuple[int, int] = (4096, 4096)) -> np.ndarray:
    """Read a .flo via the native core -> (H, W, 2) float32."""
    lib = load_library()
    buf = np.empty(max_hw[0] * max_hw[1] * 2, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.pwc_read_flo(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(f"pwc_read_flo({path}) failed with code {rc}")
    return buf[: h.value * w.value * 2].reshape(h.value, w.value, 2).copy()


def load_batch(
    samples,
    crop_hw: tuple[int, int],
    y0s,
    x0s,
    flips,
    num_threads: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble a normalized batch from (img0, img1, flo) PPM/flo triples.

    Returns (images (B,2,ch,cw,3) f32 in [0,1], flows (B,ch,cw,2) f32).
    ``flips`` bits: 1 = horizontal, 2 = vertical.
    """
    lib = load_library()
    batch = len(samples)
    ch, cw = crop_hw
    images = np.empty((batch, 2, ch, cw, 3), np.float32)
    flows = np.empty((batch, ch, cw, 2), np.float32)

    def _paths(i):
        return (ctypes.c_char_p * batch)(
            *[str(s[i]).encode() for s in samples]
        )

    y0_arr = (ctypes.c_int * batch)(*[int(v) for v in y0s])
    x0_arr = (ctypes.c_int * batch)(*[int(v) for v in x0s])
    flip_arr = (ctypes.c_ubyte * batch)(*[int(v) for v in flips])
    rc = lib.pwc_load_batch(
        _paths(0),
        _paths(1),
        _paths(2),
        batch,
        ch,
        cw,
        y0_arr,
        x0_arr,
        flip_arr,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"pwc_load_batch failed with code {rc}")
    return images, flows
