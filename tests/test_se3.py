"""Unit tests for SE(3)/SO(3) math — autodiff/numpy oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from bundlefusion_tpu.geometry import se3


def random_twists(rng, n, scale=1.0):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    w = (rng.standard_normal((64, 3)) * 1.5).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_so3_exp_is_rotation(rng):
    w = (rng.standard_normal((32, 3)) * 2.0).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_small_angle(rng):
    w = (rng.standard_normal((16, 3)) * 1e-6).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    # first-order: R ~ I + hat(w)
    expected = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1)) + np.asarray(
        se3.hat(jnp.asarray(w))
    )
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_so3_log_near_pi():
    axis = np.array([1.0, 0.0, 0.0], dtype=np.float32)
    w = axis * (np.pi - 1e-5)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, 64)
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = se3.se3_log(T)
    T2 = se3.se3_exp(xi2)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=2e-5)


def test_se3_inverse(rng):
    xi = random_twists(rng, 16)
    T = se3.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ se3.mat_inverse(T))
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_transform_points(rng):
    xi = random_twists(rng, 4)
    T = se3.se3_exp(jnp.asarray(xi))
    p = rng.standard_normal((4, 10, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(p)))
    Tn = np.asarray(T)
    expected = np.einsum("bij,bnj->bni", Tn[:, :3, :3], p) + Tn[:, None, :3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_kabsch_recovers_rigid_transform(rng):
    xi = random_twists(rng, 8, scale=0.5)
    T = se3.se3_exp(jnp.asarray(xi))
    src = rng.standard_normal((8, 40, 3)).astype(np.float32)
    dst = se3.transform_points(T, jnp.asarray(src))
    T_est = se3.kabsch(jnp.asarray(src), dst)
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-4)


def test_kabsch_weighted_ignores_outliers(rng):
    xi = random_twists(rng, 1, scale=0.3)[0]
    T = se3.se3_exp(jnp.asarray(xi))
    src = rng.standard_normal((30, 3)).astype(np.float32)
    dst = np.array(se3.transform_points(T, jnp.asarray(src)))
    dst[25:] += 5.0  # corrupt last 5
    w = np.ones(30, dtype=np.float32)
    w[25:] = 0.0
    T_est = se3.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(T_est), np.asarray(T), atol=1e-4)


def test_pose_distance():
    Ta = se3.se3_exp(jnp.zeros(6))
    w = jnp.array([0.2, 0.0, 0.0, 0.0, 0.0, 0.0])
    Tb = se3.se3_exp(w)
    ang, dist = se3.pose_distance(Ta, Tb)
    np.testing.assert_allclose(float(ang), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(dist), 0.0, atol=1e-6)


def test_umeyama_alignment(rng):
    xi = random_twists(rng, 1, scale=0.4)[0]
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    src = rng.standard_normal((50, 3)).astype(np.float32)
    dst = src @ T[:3, :3].T + T[:3, 3]
    s, R, t = se3.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-4)
    assert abs(float(s) - 1.0) < 1e-5


def test_se3_exp_matches_expm(rng):
    """se3_exp against the matrix exponential of the 4x4 twist matrix."""
    from scipy.linalg import expm

    xi = random_twists(rng, 10, scale=0.8)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    for i in range(10):
        M = np.zeros((4, 4))
        M[:3, :3] = np.asarray(se3.hat(jnp.asarray(xi[i, :3])))
        M[:3, 3] = xi[i, 3:]
        np.testing.assert_allclose(T[i], expm(M), atol=1e-4)
