"""Tests for the IO layer: synthetic renderer, .sens round-trip, replayer, ATE."""

import numpy as np

from bundlefusion_tpu.eval.ate import ate_rmse, rpe
from bundlefusion_tpu.geometry.camera import unproject
from bundlefusion_tpu.io import ply, sens
from bundlefusion_tpu.io.replayer import Replayer, SensSource, SyntheticSource
from bundlefusion_tpu.io.synthetic import generate_sequence
from util import cached_sequence


def test_synthetic_sequence_shapes():
    seq = cached_sequence(4, width=48, height=32)
    assert seq.depth.shape == (4, 32, 48)
    assert seq.color.shape == (4, 32, 48, 3)
    assert seq.poses.shape == (4, 4, 4)
    # Most pixels should hit the scene at valid depth.
    assert (seq.depth > 0).mean() > 0.9
    assert seq.color.max() <= 1.0 and seq.color.min() >= 0.0


def test_synthetic_depth_geometrically_consistent():
    """Unprojected depth, moved to world space, must lie on the scene surface."""
    import jax.numpy as jnp

    from bundlefusion_tpu.geometry import se3
    from bundlefusion_tpu.io.synthetic import scene_sdf

    seq = cached_sequence(4, width=48, height=32)
    pts_cam = unproject(seq.camera, jnp.asarray(seq.depth[0]))
    valid = seq.depth[0] > 0
    pts_world = se3.transform_points(jnp.asarray(seq.poses[0]), pts_cam.reshape(-1, 3))
    sdf = np.asarray(scene_sdf(pts_world)).reshape(32, 48)
    assert np.abs(sdf[valid]).mean() < 5e-3


def test_sens_roundtrip(tmp_path):
    seq = cached_sequence(3, width=32, height=24)
    path = str(tmp_path / "test.sens")
    sens.write_sens(path, seq.depth, seq.color, seq.poses, seq.camera)
    src = SensSource(path)
    assert len(src) == 3
    d, c = src.get(1)
    np.testing.assert_allclose(d, seq.depth[1], atol=1e-3)  # 1mm quantization
    np.testing.assert_allclose(c, seq.color[1], atol=1 / 255.0 + 1e-6)
    np.testing.assert_allclose(src.gt_poses[1], seq.poses[1], atol=1e-6)
    assert src.camera.width == 32


def test_replayer_batching_and_padding():
    seq = cached_sequence(5, width=32, height=24)
    rep = Replayer(SyntheticSource(seq), batch_size=2)
    batches = list(rep)
    assert len(batches) == 3
    assert batches[0].depth.shape == (2, 24, 32)
    assert batches[2].valid.tolist() == [True, False]
    np.testing.assert_array_equal(batches[1].frame_ids, [2, 3])


def test_ate_rmse_zero_for_identical():
    seq = cached_sequence(6, width=32, height=24)
    assert ate_rmse(seq.poses, seq.poses) < 1e-9


def test_ate_rmse_alignment_invariance(rng):
    """ATE after alignment is invariant to a global rigid transform of the estimate."""
    import jax.numpy as jnp

    from bundlefusion_tpu.geometry import se3

    seq = cached_sequence(8, width=32, height=24)
    offset = np.asarray(se3.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.5, 0.3, 0.2], dtype=np.float32)))
    moved = np.einsum("ij,njk->nik", offset, seq.poses)
    assert ate_rmse(moved, seq.poses) < 1e-5


def test_ate_rmse_detects_error():
    seq = cached_sequence(8, width=32, height=24)
    noisy = seq.poses.copy()
    noisy[:, :3, 3] += np.random.default_rng(0).normal(scale=0.05, size=(8, 3)).astype(np.float32)
    v = ate_rmse(noisy, seq.poses)
    assert 0.01 < v < 0.2


def test_rpe():
    seq = cached_sequence(6, width=32, height=24)
    t, r = rpe(seq.poses, seq.poses)
    assert t < 1e-6 and r < 1e-5


def test_ply_writer(tmp_path):
    path = str(tmp_path / "mesh.ply")
    verts = np.random.default_rng(0).random((12, 3)).astype(np.float32)
    faces = np.arange(12).reshape(4, 3)
    colors = np.random.default_rng(1).random((12, 3))
    ply.write_ply(path, verts, colors, faces)
    data = open(path, "rb").read()
    assert b"element vertex 12" in data
    assert b"element face 4" in data
