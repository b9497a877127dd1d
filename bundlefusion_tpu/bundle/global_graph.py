"""Inter-chunk (global) bundling: the keyframe graph.

Rebuild of the global half of ``SubmapManager`` (SURVEY.md §2.1, §3.3): every
chunk's keyframe — with the chunk's keys fused into it — is matched against
ALL previous keyframes (this one mechanism is simultaneously loop closure and
relocalization), surviving correspondences are appended to the global
fixed-capacity correspondence buffer, and a global BA over keyframe poses runs
continuously with max-residual pruning.

All state is a fixed-capacity pytree (capacities from BundlingConfig), so the
whole step is one compiled program regardless of how many keyframes exist.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from ..features import filters, matcher, sift
from ..geometry import se3
from ..geometry.camera import CameraModel
from ..ops.preprocess import FrameCache
from ..solver import gn, residuals


class GlobalGraph(NamedTuple):
    keys: sift.SiftKeys  # batched [K] fused keyframe key sets
    cache: FrameCache  # batched [K] keyframe caches (global dense verify / BA)
    poses: jax.Array  # [K, 4, 4] optimized keyframe world poses
    valid: jax.Array  # [K] bool — keyframe exists and is not invalidated
    corrs: residuals.SparseCorrs  # [Rg] keyframe-indexed correspondences
    corr_cursor: jax.Array  # int32 next write position
    corr_overflow: jax.Array  # int32 dropped correspondences (observability)


def make_graph(cfg: BundlingConfig, cache_h: int, cache_w: int) -> GlobalGraph:
    k = cfg.max_num_images
    kk = cfg.max_keys_per_image
    zeros = jnp.zeros
    keys = sift.SiftKeys(
        xy=zeros((k, kk, 2)),
        sigma=zeros((k, kk)),
        response=zeros((k, kk)),
        orientation=zeros((k, kk)),
        depth=zeros((k, kk)),
        p3d=zeros((k, kk, 3)),
        desc=zeros((k, kk, 128)),
        valid=zeros((k, kk), bool),
    )
    cache = FrameCache(
        depth=zeros((k, cache_h, cache_w)),
        points=zeros((k, cache_h, cache_w, 3)),
        normals=zeros((k, cache_h, cache_w, 3)),
        intensity=zeros((k, cache_h, cache_w)),
        grad=zeros((k, cache_h, cache_w, 2)),
    )
    return GlobalGraph(
        keys=keys,
        cache=cache,
        poses=jnp.broadcast_to(jnp.eye(4), (k, 4, 4)),
        valid=zeros((k,), bool),
        corrs=residuals.empty_corrs(cfg.max_residuals_global),
        corr_cursor=jnp.int32(0),
        corr_overflow=jnp.int32(0),
    )


@jax.jit
def add_keyframe(
    graph: GlobalGraph,
    k_idx: jax.Array,  # int32 keyframe slot
    keys: sift.SiftKeys,  # single (unbatched) fused key set
    cache: FrameCache,  # single keyframe cache
    init_pose: jax.Array,  # [4, 4]
    is_valid: jax.Array,  # bool
) -> GlobalGraph:
    set_at = lambda store, v: jax.tree.map(lambda s, x: s.at[k_idx].set(x), store, v)
    return graph._replace(
        keys=set_at(graph.keys, keys),
        cache=set_at(graph.cache, cache),
        poses=graph.poses.at[k_idx].set(init_pose),
        valid=graph.valid.at[k_idx].set(is_valid),
    )


class GlobalMatchResult(NamedTuple):
    any_valid: jax.Array  # bool — the new keyframe linked to the graph
    pair_valid: jax.Array  # [K] per previous keyframe
    transforms: jax.Array  # [K, 4, 4] relative kf_j-cam -> new-kf-cam
    inlier_counts: jax.Array  # [K]
    best_prev: jax.Array  # int32 index of the best-matching previous keyframe
    graph: GlobalGraph  # with correspondences appended


@functools.partial(jax.jit, static_argnames=("cache_cam", "cfg"))
def global_match(
    graph: GlobalGraph,
    k_idx: jax.Array,  # int32 index of the (already-added) new keyframe
    cache_cam: CameraModel,
    cfg: BundlingConfig,
) -> GlobalMatchResult:
    """Match keyframe `k_idx` against every previous keyframe, filter, and
    append surviving correspondences. One fused program over all K slots."""
    kmax = cfg.max_num_images
    prev_mask = (jnp.arange(kmax) < k_idx) & graph.valid
    new_keys = jax.tree.map(lambda x: x[k_idx], graph.keys)
    new_cache = jax.tree.map(lambda x: x[k_idx], graph.cache)

    # all-prev matching: [K] pairs (j, k_idx)
    pairs_a = jnp.arange(kmax, dtype=jnp.int32)

    def match_one(j):
        kj = jax.tree.map(lambda x: x[j], graph.keys)
        return matcher.match_pair(kj, new_keys, cfg)

    m = jax.vmap(match_one)(pairs_a)  # [K, M]
    pa = graph.keys.p3d[pairs_a[:, None], m.idx_i]  # [K, M, 3]
    pb = new_keys.p3d[m.idx_j]  # [K, M, 3]
    m = m._replace(valid=m.valid & prev_mask[:, None])

    def filt_one(j, pa_j, pb_j, m_j):
        cj = jax.tree.map(lambda x: x[j], graph.cache)
        return filters.filter_pair(
            pa_j, pb_j, m_j, cj, new_cache, cache_cam, cfg,
            cfg.min_matches_global, use_dense_verify=True,
        )

    res = jax.vmap(filt_one)(pairs_a, pa, pb, m)  # batched FilterResult
    pair_valid = res.pair_valid & prev_mask
    any_valid = jnp.any(pair_valid)
    best_prev = jnp.argmax(
        jnp.where(pair_valid, res.inlier_count, -1)
    ).astype(jnp.int32)

    # --- append correspondences (fixed-length block write at the cursor) ---
    fm = res.matches  # [K, Mf]
    mf = fm.valid.shape[1]
    ok = fm.valid & pair_valid[:, None]
    cand_pa = graph.keys.p3d[pairs_a[:, None], fm.idx_i].reshape(-1, 3)
    cand_pb = new_keys.p3d[fm.idx_j].reshape(-1, 3)
    cand_a = jnp.repeat(pairs_a, mf)
    cand_ok = ok.reshape(-1)
    append_cap = min(kmax * mf, 1024)
    score = jnp.where(cand_ok, 1.0, -jnp.inf)
    top, sel = jax.lax.top_k(score, append_cap)
    sel_ok = jnp.isfinite(top)
    n_new = jnp.sum(sel_ok).astype(jnp.int32)

    corrs = graph.corrs
    cap = corrs.capacity
    cursor = jnp.minimum(graph.corr_cursor, cap - append_cap)
    overflow = graph.corr_overflow + jnp.maximum(
        graph.corr_cursor + n_new - cap, 0
    ).astype(jnp.int32)

    def write(arr, vals):
        return jax.lax.dynamic_update_slice(arr, vals, (cursor,) + (0,) * (arr.ndim - 1))

    new_corrs = residuals.SparseCorrs(
        img_a=write(corrs.img_a, jnp.where(sel_ok, cand_a[sel], 0)),
        img_b=write(corrs.img_b, jnp.where(sel_ok, k_idx, 0)),
        p_a=write(corrs.p_a, jnp.where(sel_ok[:, None], cand_pa[sel], 0.0)),
        p_b=write(corrs.p_b, jnp.where(sel_ok[:, None], cand_pb[sel], 0.0)),
        weight=write(corrs.weight, sel_ok.astype(jnp.float32)),
    )
    graph = graph._replace(
        corrs=new_corrs,
        corr_cursor=jnp.minimum(cursor + n_new, cap),
        corr_overflow=overflow,
    )
    return GlobalMatchResult(
        any_valid=any_valid,
        pair_valid=pair_valid,
        transforms=res.transform,
        inlier_counts=res.inlier_count,
        best_prev=best_prev,
        graph=graph,
    )


@functools.partial(jax.jit, static_argnames=("cache_cam", "cfg"))
def global_solve(
    graph: GlobalGraph,
    cache_cam: CameraModel | None,
    cfg: BundlingConfig,
) -> tuple[GlobalGraph, gn.SolveStats, jax.Array]:
    """Global BA over keyframe poses + pruning. Keyframe 0 is the gauge.

    Keyframes that end up with no remaining correspondences are invalidated
    (the reference's post-opt frame invalidation) — their chunks will be
    de-integrated by the trajectory manager. Returns (graph, stats, removed).
    """
    kmax = cfg.max_num_images
    free = graph.valid & (jnp.arange(kmax) > 0)
    problem = gn.GNProblem(
        corrs=graph.corrs,
        dense_pairs_a=jnp.zeros(1, jnp.int32),
        dense_pairs_b=jnp.zeros(1, jnp.int32),
        dense_pair_active=jnp.zeros(1, bool),
        free_mask=free,
    )
    poses, problem, stats, removed = gn.solve_and_prune(
        graph.poses,
        problem,
        graph.cache if cfg.use_dense_global else None,
        cache_cam,
        cfg,
        gn_iters=cfg.global_gn_iters,
        pcg_iters=cfg.global_pcg_iters,
        use_dense=cfg.use_dense_global,
        prune_rounds=1,
    )
    # invalidate keyframes (except 0) that lost all correspondences
    corrs = problem.corrs
    w_ok = (corrs.weight > 0).astype(jnp.int32)
    has_corr = jnp.zeros(kmax, jnp.int32)
    has_corr = has_corr.at[corrs.img_a].max(w_ok)
    has_corr = has_corr.at[corrs.img_b].max(w_ok)
    new_valid = graph.valid & ((has_corr > 0) | (jnp.arange(kmax) == 0))
    return (
        graph._replace(poses=poses, corrs=corrs, valid=new_valid),
        stats,
        removed,
    )
