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
