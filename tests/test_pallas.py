"""Pallas kernel equivalence tests (interpreter mode on CPU; the same kernels
compile for real on TPU — exercised by bench/the driver's entry check)."""

import jax
import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.geometry.camera import unproject
from bundlefusion_tpu.ops import preprocess as pp
from bundlefusion_tpu.ops.pallas_kernels import fused_preprocess_pallas
from util import cached_sequence


def test_fused_preprocess_matches_xla():
    seq = cached_sequence(4, width=64, height=48)
    depth = jnp.asarray(seq.depth[:2])
    fd, pts, nrm = fused_preprocess_pallas(depth, seq.camera, interpret=True)
    fd_ref = pp.bilateral_filter_depth(depth)
    pts_ref = unproject(seq.camera, fd_ref)
    nrm_ref = pp.compute_normals(pts_ref)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(fd_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(pts_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm), np.asarray(nrm_ref), atol=1e-4)


def test_fused_preprocess_invalid_depth():
    d = np.zeros((1, 48, 64), np.float32)
    d[0, 10:20, 10:20] = 2.0
    seq = cached_sequence(4, width=64, height=48)
    fd, pts, nrm = fused_preprocess_pallas(jnp.asarray(d), seq.camera, interpret=True)
    assert float(jnp.abs(fd[0, :5, :5]).max()) == 0.0
    assert float(fd[0, 15, 15]) > 1.9


def test_pallas_tsdf_matches_xla():
    """The Pallas integrate kernel (interpret mode) equals the XLA path."""
    import numpy as _np

    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.fusion import blocks, tsdf
    from bundlefusion_tpu.fusion.pallas_tsdf import integrate_blocks_pallas

    APP = tiny_test_config().app
    seq = cached_sequence(8, width=64, height=48)
    table = blocks.make_table(2048)
    for i in range(3):
        table, _ = tsdf.integrate(
            table,
            jnp.asarray(seq.depth[i]),
            jnp.asarray(seq.color[i]),
            jnp.asarray(seq.poses[i]),
            seq.camera,
            APP,
        )
    d, c, T = jnp.asarray(seq.depth[3]), jnp.asarray(seq.color[3]), jnp.asarray(seq.poses[3])
    # the Pallas kernel samples color through an exact packed-uint8 plane; the
    # pipeline always feeds uint8 wire color, so compare at wire precision
    c = jnp.round(c * 255.0) / 255.0
    keys = tsdf.frame_alloc_keys(d, T, seq.camera, APP)
    upd = blocks.dedup_keys(keys, APP.blocks_per_frame_cap)
    table2, _ = blocks.allocate(table, upd)
    slots, mask = blocks.lookup(table2, upd)
    ref = tsdf._integrate_blocks(slots, mask, table2, d, c, T, seq.camera, APP, 1.0)
    pal = integrate_blocks_pallas(
        table2, slots, mask, d, c, T, seq.camera, APP, 1.0, interpret=True
    )
    _np.testing.assert_allclose(_np.asarray(pal.sdf), _np.asarray(ref.sdf), atol=1e-5)
    _np.testing.assert_array_equal(_np.asarray(pal.weight), _np.asarray(ref.weight))
    _np.testing.assert_allclose(_np.asarray(pal.color), _np.asarray(ref.color), atol=1e-5)


def test_pallas_tsdf_deintegrate_exact():
    """integrate then deintegrate through the Pallas kernel is an exact no-op."""
    import numpy as _np

    from bundlefusion_tpu.config import tiny_test_config
    from bundlefusion_tpu.fusion import blocks, tsdf
    from bundlefusion_tpu.fusion.pallas_tsdf import integrate_blocks_pallas

    APP = tiny_test_config().app
    seq = cached_sequence(8, width=64, height=48)
    table = blocks.make_table(2048)
    d, c, T = jnp.asarray(seq.depth[0]), jnp.asarray(seq.color[0]), jnp.asarray(seq.poses[0])
    keys = tsdf.frame_alloc_keys(d, T, seq.camera, APP)
    upd = blocks.dedup_keys(keys, APP.blocks_per_frame_cap)
    table, _ = blocks.allocate(table, upd)
    slots, mask = blocks.lookup(table, upd)
    t1 = integrate_blocks_pallas(table, slots, mask, d, c, T, seq.camera, APP, 1.0, interpret=True)
    t2 = integrate_blocks_pallas(t1, slots, mask, d, c, T, seq.camera, APP, -1.0, interpret=True)
    _np.testing.assert_array_equal(_np.asarray(t2.weight), _np.asarray(table.weight))
    assert float(jnp.abs(t2.sdf).max()) < 1e-6


def test_depth_split_planes_exact():
    """The 3-way bf16 Dekker split must reconstruct EVERY f32 depth exactly
    (hi+mid+lo == x bit-for-bit) — this is what keeps the kernel's native-bf16
    MXU sampling bit-equal to the XLA path's f32 sampling."""
    from bundlefusion_tpu.fusion.pallas_tsdf import split_depth_planes

    rng = np.random.default_rng(7)
    # adversarial mix: wire-quantized mm depths, raw f32, denormal-ish tiny,
    # values straddling bf16 rounding boundaries
    mm = rng.integers(0, 65536, size=4096).astype(np.float32) * np.float32(1e-3)
    raw = rng.uniform(0.0, 12.0, size=4096).astype(np.float32)
    edge = (np.float32(1.0) + np.float32(2.0) ** -16) * rng.uniform(
        0.25, 8.0, size=4096
    ).astype(np.float32)
    x = jnp.asarray(np.concatenate([mm, raw, edge, [0.0, 65.535]]).reshape(-1, 2))
    hi, mid, lo = split_depth_planes(x)
    rec = (hi.astype(jnp.float32) + mid.astype(jnp.float32)) + lo.astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))
