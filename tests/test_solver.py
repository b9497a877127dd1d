"""Solver tests: hand Jacobians vs autodiff, PCG vs direct solve, and GN pose
recovery on synthetic data (BASELINE config 1/2 accuracy path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundlefusion_tpu.config import tiny_test_config
from bundlefusion_tpu.geometry import se3
from bundlefusion_tpu.ops.preprocess import preprocess_frames
from bundlefusion_tpu.solver import gn, residuals, system
from util import cached_sequence

CFG = tiny_test_config().bundling


def make_sparse_problem(rng, n_images=3, n_corr=64, noise=0.0):
    """Synthetic world points observed from several poses; exact correspondences."""
    xi = (rng.standard_normal((n_images, 6)) * 0.3).astype(np.float32)
    xi[0] = 0
    poses_gt = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    pts_w = rng.uniform(-1, 1, size=(n_corr, 3)).astype(np.float32) + [0, 0, 3.0]
    # every correspondence carries its own image pair (round-robin over pairs)
    pairs = [(a, b) for a in range(n_images) for b in range(a + 1, n_images)]
    pair_of = np.arange(n_corr, dtype=np.int32) % len(pairs)
    img_a = np.array([pairs[p][0] for p in pair_of], np.int32)
    img_b = np.array([pairs[p][1] for p in pair_of], np.int32)
    inv = np.linalg.inv(poses_gt)
    p_a = np.einsum("kij,kj->ki", inv[img_a, :3, :3], pts_w) + inv[img_a, :3, 3]
    p_b = np.einsum("kij,kj->ki", inv[img_b, :3, :3], pts_w) + inv[img_b, :3, 3]
    p_a += rng.normal(scale=noise, size=p_a.shape).astype(np.float32)
    corrs = residuals.SparseCorrs(
        img_a=jnp.asarray(img_a),
        img_b=jnp.asarray(img_b),
        p_a=jnp.asarray(p_a.astype(np.float32)),
        p_b=jnp.asarray(p_b.astype(np.float32)),
        weight=jnp.ones(n_corr, jnp.float32),
    )
    problem = gn.GNProblem(
        corrs=corrs,
        dense_pairs_a=jnp.zeros(1, jnp.int32),
        dense_pairs_b=jnp.zeros(1, jnp.int32),
        dense_pair_active=jnp.zeros(1, bool),
        free_mask=jnp.asarray(np.arange(n_images) > 0),
    )
    return poses_gt, problem


def test_sparse_jacobian_vs_autodiff(rng):
    poses_gt, problem = make_sparse_problem(rng)
    poses = jnp.asarray(poses_gt)

    def res_fn(xi_all):
        upd = se3.se3_exp(xi_all)
        p = jnp.einsum("nij,njk->nik", upd, poses)
        r, _, _ = residuals.sparse_residuals(p, problem.corrs)
        return r

    J_auto = jax.jacfwd(res_fn)(jnp.zeros((3, 6)))  # [R, 3, 3, 6]
    _, J_hand, _ = residuals.sparse_residuals(poses, problem.corrs)
    a = np.asarray(problem.corrs.img_a)
    b = np.asarray(problem.corrs.img_b)
    J_auto = np.asarray(J_auto)
    J_hand = np.asarray(J_hand)
    for k in range(J_hand.shape[0]):
        np.testing.assert_allclose(J_auto[k, :, a[k]], J_hand[k, :, :6], atol=1e-4)
        np.testing.assert_allclose(J_auto[k, :, b[k]], J_hand[k, :, 6:], atol=1e-4)


def test_pcg_matches_direct_solve(rng):
    n = 60
    A = rng.standard_normal((n, n)).astype(np.float32)
    H = A @ A.T + 0.5 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    res = system.pcg_solve(jnp.asarray(H), jnp.asarray(b), num_iters=200)
    x_direct = np.linalg.solve(H, b)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, atol=1e-2, rtol=1e-2)


def test_assemble_system_matches_bruteforce(rng):
    """Scattered pair-block assembly == dense accumulation from full Jacobians."""
    poses_gt, problem = make_sparse_problem(rng, n_images=3, n_corr=32)
    poses = jnp.asarray(poses_gt)
    JtJ, Jtr, _ = residuals.sparse_corr_blocks(poses, problem.corrs, 1.0)
    H, b = system.assemble_system(
        3, problem.corrs.img_a, problem.corrs.img_b, JtJ, Jtr,
        jnp.ones(3, bool), damping=0.0,
    )
    # brute force: full [R*3, 18] Jacobian
    r, J12, _ = residuals.sparse_residuals(poses, problem.corrs)
    a = np.asarray(problem.corrs.img_a)
    bidx = np.asarray(problem.corrs.img_b)
    R = r.shape[0]
    Jfull = np.zeros((R, 3, 18), np.float32)
    for k in range(R):
        Jfull[k, :, 6 * a[k] : 6 * a[k] + 6] = np.asarray(J12)[k, :, :6]
        Jfull[k, :, 6 * bidx[k] : 6 * bidx[k] + 6] = np.asarray(J12)[k, :, 6:]
    Jf = Jfull.reshape(-1, 18)
    rf = np.asarray(r).reshape(-1)
    np.testing.assert_allclose(np.asarray(H), Jf.T @ Jf, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), -(Jf.T @ rf), atol=1e-3)


def test_gn_sparse_recovers_poses(rng):
    poses_gt, problem = make_sparse_problem(rng, n_images=4, n_corr=96)
    # perturb initial poses
    xi_noise = (rng.standard_normal((4, 6)) * 0.05).astype(np.float32)
    xi_noise[0] = 0
    init = np.einsum("nij,njk->nik", np.asarray(se3.se3_exp(jnp.asarray(xi_noise))), poses_gt)
    solved, stats = gn.solve_gn(
        jnp.asarray(init), problem, None, None, CFG, gn_iters=4, pcg_iters=48, use_dense=False
    )
    for i in range(4):
        ang, dist = se3.pose_distance(jnp.asarray(poses_gt[i]), solved[i])
        assert float(ang) < 1e-3, f"pose {i} rot err {float(ang)}"
        assert float(dist) < 1e-3, f"pose {i} trans err {float(dist)}"
    # monotone decrease of the sparse energy
    s = np.asarray(stats.sparse_res_sum)
    assert s[-1] < s[0] * 1e-3


def test_gn_gauge_fixed_pose_unchanged(rng):
    poses_gt, problem = make_sparse_problem(rng, n_images=3)
    solved, _ = gn.solve_gn(
        jnp.asarray(poses_gt), problem, None, None, CFG, gn_iters=2, pcg_iters=24, use_dense=False
    )
    np.testing.assert_array_equal(np.asarray(solved[0]), poses_gt[0])


def test_prune_removes_corrupt_correspondences(rng):
    poses_gt, problem = make_sparse_problem(rng, n_images=3, n_corr=48)
    # corrupt 3 correspondences badly
    pb = np.array(problem.corrs.p_b)
    pb[:3] += 2.0
    problem = problem._replace(corrs=problem.corrs._replace(p_b=jnp.asarray(pb)))
    solved, new_problem, stats, removed = gn.solve_and_prune(
        jnp.asarray(poses_gt), problem, None, None, CFG,
        gn_iters=2, pcg_iters=24, use_dense=False, prune_rounds=2,
    )
    w = np.asarray(new_problem.corrs.weight)
    assert (w[:3] == 0).all(), "corrupt correspondences should be pruned"
    assert int(removed) >= 3
    # after pruning, solve should be accurate again
    for i in range(3):
        ang, dist = se3.pose_distance(jnp.asarray(poses_gt[i]), solved[i])
        assert float(dist) < 5e-3


@pytest.mark.slow
def test_dense_gn_two_frame_alignment():
    """BASELINE config 1: dense GN alignment of one synthetic frame pair
    starting from a perturbed pose must converge to GT."""
    seq = cached_sequence(4, width=128, height=96)
    cache_cam = seq.camera.scaled(64, 48)
    _, cache = preprocess_frames(
        jnp.asarray(seq.depth), jnp.asarray(seq.color), seq.camera, cache_cam
    )
    # two poses: frame 0 fixed at GT; frame 1 init perturbed from GT
    T0 = seq.poses[0]
    T1_gt = seq.poses[1]
    xi = np.array([0.01, -0.015, 0.01, 0.02, -0.02, 0.015], np.float32)
    T1_init = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ T1_gt
    poses = jnp.asarray(np.stack([T0, T1_init]))
    problem = gn.GNProblem(
        corrs=residuals.empty_corrs(8),
        dense_pairs_a=jnp.array([0], jnp.int32),
        dense_pairs_b=jnp.array([1], jnp.int32),
        dense_pair_active=jnp.array([True]),
        free_mask=jnp.array([False, True]),
    )
    c2 = jax.tree.map(lambda x: x[:2], cache)
    solved, stats = gn.solve_gn(
        poses, problem, c2, cache_cam, CFG, gn_iters=6, pcg_iters=24, use_dense=True
    )
    ang0, dist0 = se3.pose_distance(jnp.asarray(T1_gt), jnp.asarray(T1_init))
    ang, dist = se3.pose_distance(jnp.asarray(T1_gt), solved[1])
    # must improve substantially over the perturbed init and land close to GT
    assert float(dist) < 0.01, f"dense GN trans err {float(dist)} (init {float(dist0)})"
    assert float(ang) < np.deg2rad(0.5), f"dense GN rot err {np.rad2deg(float(ang))} deg"
