"""Native (C) components, loaded via ctypes with build-on-demand.

``build()`` compiles the shared library with the system compiler; import
falls back silently to the pure-numpy implementations when no compiler or
prebuilt ``.so`` is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "_rlecodec.so")
_lib = None
_lock = threading.Lock()  # loader decode threads race into _load()


def build(force: bool = False) -> str | None:
    """Compile rlecodec.c into _rlecodec.so; returns the path or None."""
    src = os.path.join(_DIR, "rlecodec.c")
    if os.path.exists(_SO_PATH) and not force \
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    tmp = _SO_PATH + f".tmp{os.getpid()}"
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True)
            os.replace(tmp, _SO_PATH)  # atomic; dlopen never sees a torso
            return _SO_PATH
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        return _load_locked()


def _load_locked():
    global _lib
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long]
    lib.rle_encode.restype = ctypes.c_long
    lib.rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        return _load() is not None
    except OSError:
        return False


def rle_decode_native(counts: str | bytes, h: int, w: int):
    """Decode compressed counts to a (h, w) uint8 mask, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    # decoded buffer is column-major (w, h) in C order == (h, w) Fortran
    out = np.zeros(h * w, np.uint8)
    rc = lib.rle_decode(
        counts, len(counts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    if rc != 0:
        raise ValueError("invalid RLE counts")
    return out.reshape((w, h)).T


def rle_encode_native(mask) -> str | None:
    """Encode a (h, w) binary mask into a compressed counts string, or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    m = np.asarray(mask, np.uint8)
    flat = np.ascontiguousarray(m.T.reshape(-1))  # column-major walk
    cap = flat.size * 7 + 16
    out = ctypes.create_string_buffer(cap)
    n = lib.rle_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flat.size, 1, out, cap)
    if n < 0:
        raise ValueError("rle_encode overflow")
    return out.raw[:n].decode("ascii")
