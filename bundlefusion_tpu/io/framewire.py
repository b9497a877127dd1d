"""ctypes bindings for the native frame wire converter (``native/framewire.cpp``).

The ingest hot path (float frame -> uint16 mm depth + uint8 color, plus the
optional wire-level bilateral when ``integrate_filtered_depth`` is on) is the
only per-frame host compute the pipeline performs; this runs it in OpenMP C++
(numpy fallback kept, as with the .sens codec).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "framewire.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libframewire.so"))
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
                    # -march=native: built on the host it runs on (build
                    # happens at import); the conversion loops vectorize to
                    # AVX-512 — ~4x on this machine's single core
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                     "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.frame_to_wire.restype = None
            lib.frame_to_wire.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.bilateral_wire_u16.restype = None
            lib.bilateral_wire_u16.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
            ]
            lib.frame_to_wire2.restype = None
            lib.frame_to_wire2.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                ctypes.c_float, ctypes.c_float,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.pack_depth12.restype = None
            lib.pack_depth12.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def frame_to_wire(
    depth: np.ndarray,
    color: np.ndarray,
    out: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """float depth (meters) [H, W] + float color [H, W, 3] -> (uint16 mm,
    uint8) wire arrays.

    ``out=(d16, c8)`` writes into caller-provided contiguous buffers (the
    pipeline passes warm pooled slab rows: fresh allocations on this host
    page-fault ~50x slower than warm rewrites)."""
    lib = _load()
    h, w = depth.shape
    if out is not None:
        d16, c8 = out
        if not (d16.flags.c_contiguous and c8.flags.c_contiguous):
            raise ValueError("frame_to_wire out buffers must be C-contiguous")
    else:
        d16 = np.empty((h, w), np.uint16)
        c8 = np.empty((h, w, 3), np.uint8)
    if lib is not None and color.shape == (h, w, 3):
        d = np.ascontiguousarray(depth, dtype=np.float32)
        c = np.ascontiguousarray(color, dtype=np.float32)
        lib.frame_to_wire(
            d.ctypes.data, c.ctypes.data, h, w, d16.ctypes.data, c8.ctypes.data
        )
        return d16, c8
    d16[:] = (np.clip(depth, 0.0, 65.0) * 1000.0 + 0.5).astype(np.uint16)
    c8[:] = (np.clip(color, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return d16, c8


def frame_to_wire2(
    depth: np.ndarray,
    color: np.ndarray,
    out: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
    depth_min: float = 0.0,
    depth_max: float = 65.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """v2 wire: float depth [H, W] + float color [H, W, 3] -> (uint16 mm
    depth [H, W], uint8 LUMA [H, W], uint8 RGB [H/2, W/2, 3]).

    Depth outside [depth_min, depth_max] becomes INVALID (0) — the
    reference's sensor-range gate (s_sensorDepthMin/Max at capture). The
    bundling half of the pipeline consumes only full-res intensity
    (SIFT + the photometric cache); RGB is consumed only by TSDF voxel
    coloring — shipping Y at full res and RGB 2x2-box-downsampled cuts the
    host->device wire ~24% with no effect on tracking. H and W must be even.
    """
    lib = _load()
    h, w = depth.shape
    if out is not None:
        d16, y8, c8h = out
        for a in (d16, y8, c8h):
            if not a.flags.c_contiguous:
                raise ValueError("frame_to_wire2 out buffers must be C-contiguous")
    else:
        d16 = np.empty((h, w), np.uint16)
        y8 = np.empty((h, w), np.uint8)
        c8h = np.empty((h // 2, w // 2, 3), np.uint8)
    if lib is not None and color.shape == (h, w, 3):
        d = np.ascontiguousarray(depth, dtype=np.float32)
        c = np.ascontiguousarray(color, dtype=np.float32)
        lib.frame_to_wire2(
            d.ctypes.data, c.ctypes.data, h, w,
            ctypes.c_float(depth_min), ctypes.c_float(depth_max),
            d16.ctypes.data, y8.ctypes.data, c8h.ctypes.data,
        )
        return d16, y8, c8h
    din = np.where((depth >= depth_min) & (depth <= depth_max), depth, 0.0)
    d16[:] = (din.astype(np.float32) * np.float32(1000.0) + np.float32(0.5)).astype(
        np.uint16
    )
    lum = color[..., 0] * 0.299 + color[..., 1] * 0.587 + color[..., 2] * 0.114
    y8[:] = (np.clip(lum, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    half = 0.25 * (
        color[0::2, 0::2] + color[0::2, 1::2] + color[1::2, 0::2] + color[1::2, 1::2]
    )
    c8h[:] = (np.clip(half, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return d16, y8, c8h


def pack_depth12(d16: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """2 depth pixels -> 3 wire bytes (values must be < 4096 mm — callers
    gate on the sensor ceiling). d16 flattens row-major; size must be even."""
    flat = d16.reshape(-1)
    n = flat.shape[0]
    if out is None:
        out = np.empty((n // 2 * 3,), np.uint8)
    lib = _load()
    if lib is not None and flat.flags.c_contiguous and out.flags.c_contiguous:
        lib.pack_depth12(flat.ctypes.data, n, out.ctypes.data)
        return out
    p = flat.reshape(-1, 2).astype(np.uint32)
    trip = out.reshape(-1, 3)
    trip[:, 0] = p[:, 0] & 0xFF
    trip[:, 1] = (p[:, 0] >> 8) | ((p[:, 1] & 0xF) << 4)
    trip[:, 2] = p[:, 1] >> 4
    return out


def bilateral_wire(d16: np.ndarray, sigma_d: float, sigma_r: float) -> np.ndarray:
    """5x5 zero-aware bilateral on wire-format depth (uint16 mm)."""
    lib = _load()
    h, w = d16.shape
    if lib is not None:
        src = np.ascontiguousarray(d16, dtype=np.uint16)
        out = np.empty((h, w), np.uint16)
        lib.bilateral_wire_u16(
            src.ctypes.data, h, w,
            ctypes.c_float(sigma_d), ctypes.c_float(sigma_r), out.ctypes.data,
        )
        return out
    return _bilateral_wire_np(d16, sigma_d, sigma_r)


def _bilateral_wire_np(d16: np.ndarray, sigma_d: float, sigma_r: float) -> np.ndarray:
    """numpy fallback; zero-fill shifts (out-of-bounds neighbors contribute
    nothing, matching the C++ border handling)."""
    d = d16.astype(np.float32) * 1e-3
    radius = 2
    acc = np.zeros_like(d)
    wacc = np.zeros_like(d)
    valid = d > 0

    def shifted(a, dy, dx, fill=0.0):
        out = np.full_like(a, fill)
        ys0, ys1 = max(dy, 0), a.shape[0] + min(dy, 0)
        xs0, xs1 = max(dx, 0), a.shape[1] + min(dx, 0)
        out[ys0:ys1, xs0:xs1] = a[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
        return out

    inv_2sd2 = 1.0 / (2.0 * sigma_d * sigma_d)
    inv_2sr2 = 1.0 / (2.0 * sigma_r * sigma_r)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            n = shifted(d, dy, dx)
            nv = n > 0
            w = (
                np.exp(-(dy * dy + dx * dx) * inv_2sd2)
                * np.exp(-((n - d) ** 2) * inv_2sr2)
                * nv
            )
            acc += w * n
            wacc += w
    out = np.where(valid & (wacc > 0), acc / np.maximum(wacc, 1e-12), 0.0)
    return np.clip(out * 1000.0 + 0.5, 0, 65535).astype(np.uint16)
