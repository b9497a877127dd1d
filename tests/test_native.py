"""Tests for the native .sens codec (C++ via ctypes, with Python fallback)."""

import numpy as np
import pytest

from bundlefusion_tpu.io import native


def _depth_like(rng, n=64 * 48):
    """Realistic depth: runs of zeros (invalid) + smooth nonzero spans."""
    d = (rng.uniform(500, 4000, size=n)).astype(np.uint16)
    mask = rng.random(n) < 0.25
    # zero out a few runs
    for start in rng.integers(0, n - 50, size=8):
        d[start : start + int(rng.integers(5, 50))] = 0
    d[mask] = d[mask]  # keep
    return d


def test_native_builds():
    assert native.have_native(), "C++ sensio library should build on this image"


def test_rvl_roundtrip_native(rng):
    d = _depth_like(rng)
    enc = native.rvl_encode(d)
    dec = native.rvl_decode(enc, d.size)
    np.testing.assert_array_equal(dec, d)
    assert len(enc) < d.size * 2  # compresses vs raw


def test_rvl_python_fallback_matches_native(rng):
    d = _depth_like(rng, n=1024)
    enc_native = native.rvl_encode(d)
    enc_py = native._rvl_encode_py(d)
    assert enc_native == enc_py, "bitstream must match across implementations"
    dec_py = native._rvl_decode_py(enc_native, d.size)
    np.testing.assert_array_equal(dec_py, d)


def test_rvl_all_zero_and_all_nonzero(rng):
    z = np.zeros(256, np.uint16)
    np.testing.assert_array_equal(native.rvl_decode(native.rvl_encode(z), 256), z)
    nz = rng.integers(1, 65535, size=256).astype(np.uint16)
    np.testing.assert_array_equal(native.rvl_decode(native.rvl_encode(nz), 256), nz)


def test_rvl_corrupt_raises():
    with pytest.raises(ValueError):
        native.rvl_decode(b"\xff\xff\xff\xff" * 2, 1 << 16)


def test_zlib_roundtrip(rng):
    data = rng.integers(0, 255, size=10000).astype(np.uint8).tobytes()
    comp = native.deflate(data)
    out = native.inflate(comp, len(data))
    assert out == data


def test_sens_rvl_depth_path(tmp_path, rng):
    """A .sens written with RVL depth decodes through the reader."""
    import struct

    from bundlefusion_tpu.geometry.camera import CameraModel
    from bundlefusion_tpu.io import sens

    h, w = 24, 32
    depth_m = rng.uniform(0.5, 3.0, size=(2, h, w)).astype(np.float32)
    cam = CameraModel.create(30, 30, 15.5, 11.5, w, h)
    path = str(tmp_path / "rvl.sens")
    # write with zlib then patch compression type + payload to RVL
    sens.write_sens(path, depth_m, np.zeros((2, h, w, 3), np.float32), np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)), cam)
    frames = list(sens.iter_frames(path))
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"x"
        f.write(struct.pack("<Q", len(name)))
        f.write(name)
        intr = np.eye(4, dtype="<f4")
        intr[0, 0] = intr[1, 1] = 30
        intr[0, 2], intr[1, 2] = 15.5, 11.5
        for _ in range(2):
            f.write(intr.tobytes())
            f.write(np.eye(4, dtype="<f4").tobytes())
        f.write(struct.pack("<II", 0, 2))  # raw color, occi (RVL) depth
        f.write(struct.pack("<IIII", w, h, w, h))
        f.write(struct.pack("<f", 1000.0))
        f.write(struct.pack("<Q", 2))
        for _, fr in frames:
            f.write(np.asarray(fr.camera_to_world, dtype="<f4").tobytes())
            f.write(struct.pack("<QQ", fr.timestamp_color, fr.timestamp_depth))
            dshort = (depth_m[0] * 1000).astype(np.uint16)  # frame 0 content
            rvl = native.rvl_encode(dshort)
            f.write(struct.pack("<QQ", len(fr.color_bytes), len(rvl)))
            f.write(fr.color_bytes)
            f.write(rvl)
    hdr_frames = list(sens.iter_frames(path))
    d = sens.decode_depth(hdr_frames[0][0], hdr_frames[0][1])
    np.testing.assert_allclose(d, depth_m[0], atol=1e-3)


def test_framewire_native_matches_numpy():
    """native/framewire.cpp (wire conversion + wire-level bilateral) must
    agree with the numpy fallback: conversion exactly, the bilateral within
    the 1 mm wire quantum (the C++ tabulates range weights on integer mm)."""
    import numpy as np

    from bundlefusion_tpu.io import framewire

    rng = np.random.default_rng(3)
    depth = (
        rng.uniform(0.3, 4.0, (48, 64)) * (rng.random((48, 64)) > 0.07)
    ).astype(np.float32)
    color = rng.random((48, 64, 3)).astype(np.float32)

    d16, c8 = framewire.frame_to_wire(depth, color)
    d16_ref = (np.clip(depth, 0.0, 65.0) * 1000.0 + 0.5).astype(np.uint16)
    c8_ref = (np.clip(color, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(d16, d16_ref)
    np.testing.assert_array_equal(c8, c8_ref)

    f_np = framewire._bilateral_wire_np(d16, 2.0, 0.1)
    f = framewire.bilateral_wire(d16, 2.0, 0.1)
    diff = np.abs(f.astype(np.int32) - f_np.astype(np.int32))
    assert diff.max() <= 1, f"bilateral diverges beyond the wire quantum: {diff.max()}"
    # invalid pixels must stay invalid in both
    np.testing.assert_array_equal(f == 0, f_np == 0)


def test_framewire2_native_matches_numpy():
    """native frame_to_wire2 (luma + half-res color + sensor-range gate) and
    pack_depth12 must agree with their numpy fallbacks bit-for-bit, and the
    12-bit pack must round-trip through the device-side unpack."""
    import numpy as np

    from bundlefusion_tpu.bundle import pipeline as P
    from bundlefusion_tpu.io import framewire

    rng = np.random.default_rng(5)
    depth = (
        rng.uniform(0.0, 5.0, (48, 64)) * (rng.random((48, 64)) > 0.07)
    ).astype(np.float32)
    color = rng.random((48, 64, 3)).astype(np.float32)

    nat = framewire.frame_to_wire2(depth, color, depth_min=0.1, depth_max=4.0)
    lib, framewire._lib = framewire._lib, None
    bf_prev = framewire._build_failed
    framewire._build_failed = True
    try:
        ref = framewire.frame_to_wire2(depth, color, depth_min=0.1, depth_max=4.0)
        d16 = nat[0]
        packed_ref = framewire.pack_depth12(d16)
    finally:
        framewire._lib, framewire._build_failed = lib, bf_prev
    for a, b, name in zip(nat, ref, ("d16", "y8", "c8h")):
        np.testing.assert_array_equal(a, b, err_msg=name)
    # sensor gate: out-of-range depth must be invalid
    assert (nat[0][(depth > 4.0) | ((depth < 0.1) & (depth > 0))] == 0).all()

    packed = framewire.pack_depth12(d16)
    np.testing.assert_array_equal(packed, packed_ref)
    # device-side unpack of a crafted flat buffer restores every segment
    import jax.numpy as jnp

    cf, h, w = 1, 48, 64
    y8 = nat[1][None]
    c8h = nat[2][None]
    flat = np.concatenate([packed.reshape(-1), y8.reshape(-1), c8h.reshape(-1)])
    out = P._unpack_wire(jnp.asarray(flat), cf, h, w, h, w, True)
    np.testing.assert_array_equal(np.asarray(out[0])[0], d16)
    np.testing.assert_array_equal(np.asarray(out[1]), y8)
    np.testing.assert_array_equal(np.asarray(out[2]), c8h)
