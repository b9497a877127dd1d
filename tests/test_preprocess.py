"""Tests for frame preprocessing ops (oracles: numpy reference implementations
and geometric consistency on synthetic frames)."""

import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.geometry.camera import CameraModel, project, unproject
from bundlefusion_tpu.ops import preprocess as pp
from util import cached_sequence


def test_bilateral_preserves_flat_regions(rng):
    d = np.full((32, 32), 2.0, dtype=np.float32)
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(d)))
    np.testing.assert_allclose(out, d, atol=1e-5)


def test_bilateral_preserves_edges_smooths_noise(rng):
    d = np.full((32, 32), 2.0, dtype=np.float32)
    d[:, 16:] = 3.0  # sharp depth edge
    noisy = d + rng.normal(scale=0.01, size=d.shape).astype(np.float32)
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(noisy), sigma_r=0.05))
    # noise reduced
    assert np.abs(out - d).std() < np.abs(noisy - d).std() * 0.6
    # edge not smeared: columns adjacent to the edge stay near their side's value
    assert abs(out[16, 15] - 2.0) < 0.05
    assert abs(out[16, 16] - 3.0) < 0.05


def test_bilateral_keeps_invalid_invalid():
    d = np.full((16, 16), 2.0, dtype=np.float32)
    d[4:8, 4:8] = 0.0
    out = np.asarray(pp.bilateral_filter_depth(jnp.asarray(d)))
    assert (out[4:8, 4:8] == 0.0).all()
    assert (out[12:, 12:] > 0).all()


def test_project_unproject_roundtrip(rng):
    cam = CameraModel.create(40.0, 40.0, 23.5, 15.5, 48, 32)
    depth = (rng.random((32, 48)) * 3 + 0.5).astype(np.float32)
    pts = unproject(cam, jnp.asarray(depth))
    uv, valid = project(cam, pts.reshape(-1, 3))
    v = np.asarray(valid).reshape(32, 48)
    expected_u, expected_v = np.meshgrid(np.arange(48), np.arange(32))
    got = np.asarray(uv).reshape(32, 48, 2)
    np.testing.assert_allclose(got[v][:, 0], expected_u[v], atol=1e-3)
    np.testing.assert_allclose(got[v][:, 1], expected_v[v], atol=1e-3)


def test_normals_of_plane():
    """Normals of a fronto-parallel plane must be (0, 0, -1) (toward camera)."""
    cam = CameraModel.create(40.0, 40.0, 23.5, 15.5, 48, 32)
    depth = jnp.full((32, 48), 2.0)
    pts = unproject(cam, depth)
    n = np.asarray(pp.compute_normals(pts))
    inner = n[2:-2, 2:-2]
    np.testing.assert_allclose(inner, np.broadcast_to([0, 0, -1.0], inner.shape), atol=1e-4)


def test_normals_match_scene_sdf_normals():
    """Computed normals on rendered depth match analytic scene normals."""
    from bundlefusion_tpu.geometry import se3
    from bundlefusion_tpu.io.synthetic import scene_normal

    seq = cached_sequence(4, width=48, height=32)
    pts = unproject(seq.camera, jnp.asarray(seq.depth[0]))
    n_cam = np.asarray(pp.compute_normals(pts))
    T = seq.poses[0]
    n_world = n_cam @ T[:3, :3].T
    p_world = np.asarray(se3.transform_points(jnp.asarray(T), pts.reshape(-1, 3))).reshape(32, 48, 3)
    n_true = np.asarray(scene_normal(jnp.asarray(p_world)))
    valid = (np.linalg.norm(n_cam, axis=-1) > 0.5) & (seq.depth[0] > 0)
    # ignore borders and depth discontinuities (central differences straddle them)
    interior = np.zeros_like(valid)
    interior[3:-3, 3:-3] = True
    dots = np.abs(np.sum(n_world * n_true, axis=-1))
    agree = dots[valid & interior]
    assert np.median(agree) > 0.95


def test_intensity_and_gradients():
    c = np.zeros((8, 8, 3), dtype=np.float32)
    c[..., 0] = 1.0  # pure red
    i = np.asarray(pp.color_to_intensity(jnp.asarray(c)))
    np.testing.assert_allclose(i, 0.299, atol=1e-6)
    ramp = np.tile(np.arange(16, dtype=np.float32), (16, 1))
    gx, gy = pp.image_gradients(jnp.asarray(ramp))
    np.testing.assert_allclose(np.asarray(gx)[2:-2, 2:-2], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy)[2:-2, 2:-2], 0.0, atol=1e-5)


def test_downsample_depth_valid_aware():
    d = np.zeros((4, 4), dtype=np.float32)
    d[0, 0] = 2.0  # single valid pixel in the 2x2 block
    out = np.asarray(pp.downsample_depth(jnp.asarray(d), 2, 2))
    assert out.shape == (2, 2)
    assert out[0, 0] == 2.0  # mean of valid only, not diluted by zeros
    assert out[1, 1] == 0.0


def test_preprocess_frames_end_to_end():
    seq = cached_sequence(4, width=48, height=32)
    cache_cam = seq.camera.scaled(16, 8)
    frames, cache = pp.preprocess_frames(
        jnp.asarray(seq.depth), jnp.asarray(seq.color), seq.camera, cache_cam
    )
    assert frames.depth.shape == (4, 32, 48)
    assert frames.points.shape == (4, 32, 48, 3)
    assert cache.depth.shape == (4, 8, 16)
    assert cache.grad.shape == (4, 8, 16, 2)
    # cached depth consistent with full-res depth
    full = np.asarray(frames.depth[0])
    lo = np.asarray(cache.depth[0])
    np.testing.assert_allclose(lo[4, 8], full[16:20, 24:27].mean(), rtol=0.1)


def test_bilinear_sample():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    uv = jnp.asarray([[1.5, 0.5], [0.0, 0.0], [3.5, 2.5]])
    vals, ok = pp.bilinear_sample(img, uv)
    np.testing.assert_allclose(np.asarray(vals)[:2], [3.5, 0.0], atol=1e-6)
    assert np.asarray(ok).tolist() == [True, True, False]
