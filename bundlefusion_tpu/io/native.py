"""ctypes bindings for the native .sens codec (``native/sensio.cpp``).

Builds the shared library on first use (g++, cached next to the source) and
exposes RVL encode/decode + zlib helpers; every entry point has a pure-Python
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "sensio.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libsensio.so"))
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.rvl_encode.restype = ctypes.c_long
            lib.rvl_encode.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p]
            lib.rvl_decode.restype = ctypes.c_long
            lib.rvl_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ]
            lib.zlib_inflate.restype = ctypes.c_long
            lib.zlib_inflate.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ]
            lib.zlib_deflate.restype = ctypes.c_long
            lib.zlib_deflate.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# RVL codec
# ---------------------------------------------------------------------------


def rvl_encode(depth: np.ndarray) -> bytes:
    """uint16 array (any shape) -> RVL bytes."""
    d = np.ascontiguousarray(depth, dtype=np.uint16).reshape(-1)
    lib = _load()
    if lib is not None:
        out = np.empty(d.size * 3 + 16, dtype=np.uint8)
        n = lib.rvl_encode(d.ctypes.data, d.size, out.ctypes.data)
        return out[:n].tobytes()
    return _rvl_encode_py(d)


def rvl_decode(data: bytes, npix: int) -> np.ndarray:
    """RVL bytes -> uint16 array [npix]."""
    lib = _load()
    if lib is not None:
        buf = np.frombuffer(data, dtype=np.uint8)
        # pad to a whole number of 32-bit words for the reader
        pad = (-len(buf)) % 4 + 8
        buf = np.concatenate([buf, np.zeros(pad, np.uint8)])
        out = np.empty(npix, dtype=np.uint16)
        n = lib.rvl_decode(buf.ctypes.data, len(buf), out.ctypes.data, npix)
        if n != npix:
            raise ValueError(f"RVL decode produced {n} of {npix} pixels")
        return out
    return _rvl_decode_py(data, npix)


def _rvl_encode_py(d: np.ndarray) -> bytes:
    nibbles: list[int] = []

    def put(value: int) -> None:
        while True:
            nib = value & 0x7
            value >>= 3
            if value:
                nib |= 0x8
            nibbles.append(nib)
            if not value:
                break

    i, n, prev = 0, d.size, 0
    while i < n:
        start = i
        while i < n and d[i] == 0:
            i += 1
        put(i - start)
        start = i
        while i < n and d[i] != 0:
            i += 1
        put(i - start)
        for j in range(start, i):
            delta = int(d[j]) - prev
            prev = int(d[j])
            put((delta << 1) ^ (delta >> 63) if delta >= 0 else ((delta << 1) ^ -1) & 0xFFFFFFFF)
    # pack nibbles into little-endian 32-bit words, low nibble first
    if len(nibbles) % 8:
        nibbles += [0] * (8 - len(nibbles) % 8)
    arr = np.asarray(nibbles, dtype=np.uint32).reshape(-1, 8)
    words = np.zeros(arr.shape[0], dtype=np.uint32)
    for k in range(8):
        words |= arr[:, k] << (4 * k)
    return words.astype("<u4").tobytes()


def _rvl_decode_py(data: bytes, npix: int) -> np.ndarray:
    words = np.frombuffer(data.ljust((len(data) + 3) // 4 * 4 + 8, b"\0"), dtype="<u4")
    nibbles = np.zeros(len(words) * 8, dtype=np.uint8)
    for k in range(8):
        nibbles[k::8] = (words >> (4 * k)) & 0xF
    pos = 0

    def get() -> int:
        nonlocal pos
        value, shift = 0, 0
        while True:
            nib = int(nibbles[pos])
            pos += 1
            value |= (nib & 0x7) << shift
            shift += 3
            if not (nib & 0x8):
                return value

    out = np.zeros(npix, dtype=np.uint16)
    i, current = 0, 0
    while i < npix:
        zeros = get()
        i += zeros
        if i >= npix:
            break
        nonzeros = get()
        for _ in range(nonzeros):
            zig = get()
            delta = (zig >> 1) ^ -(zig & 1)
            current += delta
            out[i] = current
            i += 1
    return out


# ---------------------------------------------------------------------------
# zlib (native fast path; stdlib fallback)
# ---------------------------------------------------------------------------


def inflate(data: bytes, out_size: int) -> bytes:
    lib = _load()
    if lib is not None:
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(out_size, dtype=np.uint8)
        n = lib.zlib_inflate(buf.ctypes.data, len(buf), out.ctypes.data, out_size)
        if n < 0:
            raise ValueError("zlib inflate failed")
        return out[:n].tobytes()
    import zlib

    return zlib.decompress(data)


def deflate(data: bytes, level: int = 1) -> bytes:
    lib = _load()
    if lib is not None:
        buf = np.frombuffer(data, dtype=np.uint8)
        cap = len(data) + (len(data) >> 9) + 64
        out = np.empty(cap, dtype=np.uint8)
        n = lib.zlib_deflate(buf.ctypes.data, len(buf), out.ctypes.data, cap, level)
        if n < 0:
            raise ValueError("zlib deflate failed")
        return out[:n].tobytes()
    import zlib

    return zlib.compress(data, level)
