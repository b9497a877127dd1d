"""Gauss-Newton driver for sparse+dense bundle adjustment.

Rebuild of the outer loop in ``CUDASolverBundling/CUDASolverBundling.cpp ::
solve`` (SURVEY.md §3.3 hot loop 4): for each nonlinear iteration, rebuild the
dense system via projective association, add the sparse term, PCG-solve the
normal equations, apply se3 updates; afterwards find/prune max-residual
correspondences (``removeMaxResidualCUDA`` [M]).

The whole solve is one jitted program: Python loop over a *static* GN
iteration count (unrolled — each iteration is a big fused XLA computation; the
count is 2-3 in practice, matching the reference defaults).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from ..geometry import se3
from ..geometry.camera import CameraModel
from ..ops.preprocess import FrameCache
from .residuals import (
    SparseCorrs,
    dense_pair_blocks,
    sparse_corr_blocks,
    sparse_residuals,
)
from .system import assemble_system, pcg_solve


class SolveStats(NamedTuple):
    sparse_res_sum: jax.Array  # [iters] sum of squared sparse residual norms
    dense_depth_res: jax.Array  # [iters] mean squared dense depth residual
    dense_color_res: jax.Array  # [iters]
    pcg_final_rz: jax.Array  # [iters]
    final_res_norms: jax.Array  # [R] per-correspondence residual after solve


class GNProblem(NamedTuple):
    """Static description of one BA problem instance (all fixed-capacity).

    The sparse term is per-correspondence (img indices in `corrs`); the dense
    term runs over an explicit pair list (`dense_pairs_*`), typically all
    chunk pairs locally or nothing/keyframe-neighbor pairs globally.
    """

    corrs: SparseCorrs  # [R]
    dense_pairs_a: jax.Array  # [P] int32
    dense_pairs_b: jax.Array  # [P]
    dense_pair_active: jax.Array  # [P] bool
    free_mask: jax.Array  # [N] bool


def solve_gn(
    poses: jax.Array,  # [N, 4, 4] initial world-from-camera poses
    problem: GNProblem,
    caches: FrameCache | None,  # batched [N, ...]; None => sparse-only solve
    cache_cam: CameraModel | None,
    cfg: BundlingConfig,
    gn_iters: int,
    pcg_iters: int,
    use_dense: bool = True,
) -> tuple[jax.Array, SolveStats]:
    """Run GN and return (updated poses, stats).

    The GN outer loop is a `lax.scan` with a pose carry: the (large) system
    build + PCG body is traced/compiled ONCE regardless of iteration count —
    the reference similarly reuses one set of kernels per nonlinear iteration.
    """
    n = poses.shape[0]
    # per-iteration dense weight ramp (reference ramps weightDenseDepth/Color
    # across nonlinear iterations): sparse aligns first, dense refines late
    if cfg.dense_weight_ramp and gn_iters > 1:
        ramp = (jnp.arange(gn_iters, dtype=jnp.float32) + 1.0) / gn_iters
    else:
        ramp = jnp.ones(gn_iters, jnp.float32)

    def gn_iter(poses, scale):
        sJtJ, sJtr, res_norms = sparse_corr_blocks(poses, problem.corrs, cfg.weight_sparse)
        idx_a = problem.corrs.img_a
        idx_b = problem.corrs.img_b
        JtJ, Jtr = sJtJ, sJtr
        if use_dense and caches is not None:
            dJtJ, dJtr, dstats = dense_pair_blocks(
                poses,
                problem.dense_pairs_a,
                problem.dense_pairs_b,
                problem.dense_pair_active,
                caches,
                cache_cam,
                cfg,
                cfg.weight_dense_depth * scale,
                cfg.weight_dense_color * scale,
            )
            idx_a = jnp.concatenate([idx_a, problem.dense_pairs_a])
            idx_b = jnp.concatenate([idx_b, problem.dense_pairs_b])
            JtJ = jnp.concatenate([JtJ, dJtJ])
            Jtr = jnp.concatenate([Jtr, dJtr])
            nd = jnp.maximum(jnp.sum(dstats.num_valid_depth), 1)
            nc = jnp.maximum(jnp.sum(dstats.num_valid_color), 1)
            dd = jnp.sum(dstats.sum_sq_depth) / nd
            dc = jnp.sum(dstats.sum_sq_color) / nc
        else:
            dd = jnp.float32(0)
            dc = jnp.float32(0)

        H, b = assemble_system(n, idx_a, idx_b, JtJ, Jtr, problem.free_mask)
        sol = pcg_solve(H, b, pcg_iters)
        delta = sol.x.reshape(n, 6)
        # left-multiplicative se3 update on free poses only
        upd = se3.se3_exp(delta)
        new_poses = jnp.einsum("nij,njk->nik", upd, poses)
        poses = jnp.where(problem.free_mask[:, None, None], new_poses, poses)
        s = jnp.sum(problem.corrs.weight * res_norms**2)
        return poses, (s, dd, dc, sol.final_rz)

    poses, (s, dd, dc, rz) = jax.lax.scan(gn_iter, poses, ramp)

    _, _, final_norms = sparse_residuals(poses, problem.corrs)
    stats = SolveStats(
        sparse_res_sum=s,
        dense_depth_res=dd,
        dense_color_res=dc,
        pcg_final_rz=rz,
        final_res_norms=final_norms,
    )
    return poses, stats


def prune_max_residuals(
    corrs: SparseCorrs,
    res_norms: jax.Array,  # [R] from SolveStats.final_res_norms
    max_res_thresh: float,
    max_removals: int,
) -> tuple[SparseCorrs, jax.Array]:
    """Post-solve correspondence pruning (``removeMaxResidualCUDA`` analog).

    Zeroes the weight of up to `max_removals` worst correspondences whose
    residual exceeds the threshold. Returns (corrs, num_removed).
    """
    score = jnp.where(corrs.weight > 0, res_norms, -jnp.inf)
    top, idx = jax.lax.top_k(score, max_removals)
    remove = top > max_res_thresh
    new_weight = corrs.weight.at[idx].multiply(jnp.where(remove, 0.0, 1.0))
    return corrs._replace(weight=new_weight), jnp.sum(remove).astype(jnp.int32)


def solve_and_prune(
    poses: jax.Array,
    problem: GNProblem,
    caches: FrameCache | None,
    cache_cam: CameraModel | None,
    cfg: BundlingConfig,
    gn_iters: int,
    pcg_iters: int,
    use_dense: bool = True,
    prune_rounds: int = 1,
) -> tuple[jax.Array, GNProblem, SolveStats, jax.Array]:
    """solve -> prune -> (resolve) loop, as the reference runs per chunk/global
    step. Returns (poses, updated problem, stats, total_removed).

    The round loop is a `lax.scan` over the correspondence weights so the
    (large) solve graph is traced once regardless of `prune_rounds`.
    """

    def round_body(carry, _):
        poses, weight, removed_acc = carry
        prob = problem._replace(corrs=problem.corrs._replace(weight=weight))
        poses, stats = solve_gn(
            poses, prob, caches, cache_cam, cfg, gn_iters, pcg_iters, use_dense
        )
        corrs, removed = prune_max_residuals(
            prob.corrs, stats.final_res_norms, cfg.max_res_thresh, cfg.prune_iters
        )
        return (poses, corrs.weight, removed_acc + removed), stats

    (poses, weight, total_removed), stats_seq = jax.lax.scan(
        round_body,
        (poses, problem.corrs.weight, jnp.int32(0)),
        None,
        length=prune_rounds,
    )
    problem = problem._replace(corrs=problem.corrs._replace(weight=weight))
    stats = jax.tree.map(lambda x: x[-1], stats_seq)
    return poses, problem, stats, total_removed
