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
    # dense-term pair list for the global solve (s_useGlobalDenseOpt): pairs
    # of keyframes whose 80x60 caches overlap enough for projective dense
    # terms, appended as keyframes arrive (reference: BuildDenseSystem over
    # overlapping keyframe pairs, SURVEY.md §2.1 "BA kernels")
    dense_pairs_a: jax.Array  # [Pg] int32
    dense_pairs_b: jax.Array  # [Pg] int32
    dense_pair_on: jax.Array  # [Pg] bool — slot holds a live pair
    dense_cursor: jax.Array  # int32
    dense_overflow: jax.Array  # int32 dropped dense pairs


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
        dense_pairs_a=zeros((cfg.max_dense_pairs_global,), jnp.int32),
        dense_pairs_b=zeros((cfg.max_dense_pairs_global,), jnp.int32),
        dense_pair_on=zeros((cfg.max_dense_pairs_global,), bool),
        dense_cursor=jnp.int32(0),
        dense_overflow=jnp.int32(0),
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


@functools.partial(jax.jit, static_argnames=("cache_cam", "cfg", "against_all"))
def global_match(
    graph: GlobalGraph,
    k_idx: jax.Array,  # int32 index of the (already-added) new keyframe
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    against_all: bool = False,
) -> GlobalMatchResult:
    """Match keyframe `k_idx` against every previous keyframe, filter, and
    append surviving correspondences. One fused program over all K slots.

    With ``against_all=True`` the candidate set is every *valid* keyframe
    other than `k_idx` (not just earlier ones) — used to re-match stale
    invalidated keyframes after relocalization succeeds (the reference
    revalidates frames once the camera is found again, SURVEY.md §0 item 4).
    """
    kmax = cfg.max_num_images
    if against_all:
        prev_mask = (jnp.arange(kmax) != k_idx) & graph.valid
    else:
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
    # per-keyframe append budget: at most a quarter of the buffer, so the
    # standing set (loop closures accumulated so far) always keeps 3/4
    append_cap = min(kmax * mf, 1024, max(graph.corrs.capacity // 4, 128))
    score = jnp.where(cand_ok, 1.0, -jnp.inf)
    top, sel = jax.lax.top_k(score, append_cap)
    sel_ok = jnp.isfinite(top)
    n_new = jnp.sum(sel_ok).astype(jnp.int32)

    def _append(_):
        corrs = graph.corrs
        cap = corrs.capacity
        # --- compact + fair eviction before appending. Two sources of room:
        # (1) correspondences killed by max-residual pruning (weight == 0) are
        #     garbage rows, reclaimed for free;
        # (2) if live entries still exceed cap - append_cap, evict the most
        #     REDUNDANT ones: entries are ranked within their keyframe pair,
        #     and a global top-k on (-rank) keeps rank-0 of every pair before
        #     any pair's rank-1 — round-robin fairness, so no pair (loop
        #     closure!) ever loses its last correspondences while another
        #     hoards slots.
        # The new keyframe's append therefore ALWAYS fits; evictions counted.
        live = corrs.weight > 0
        pid = jnp.where(live, corrs.img_a * kmax + corrs.img_b, jnp.iinfo(jnp.int32).max)
        order1 = jnp.argsort(pid, stable=True)
        pid_s = pid[order1]
        idx = jnp.arange(cap, dtype=jnp.int32)
        first = jnp.concatenate([jnp.array([True]), pid_s[1:] != pid_s[:-1]])
        seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
        rank = idx - seg_start
        prio = jnp.where(live[order1], -rank.astype(jnp.float32), -jnp.inf)
        keep_n = cap - append_cap
        top1, sel1 = jax.lax.top_k(prio, keep_n)
        kept = jnp.isfinite(top1)
        rows = order1[sel1]
        gat = lambda x: x[rows]
        corrs = residuals.SparseCorrs(
            img_a=gat(corrs.img_a),
            img_b=gat(corrs.img_b),
            p_a=gat(corrs.p_a),
            p_b=gat(corrs.p_b),
            weight=jnp.where(kept, gat(corrs.weight), 0.0),
        )
        # pad the compacted buffer back to capacity (append region)
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((append_cap,) + x.shape[1:], x.dtype)]
        )
        corrs = jax.tree.map(pad, corrs)
        cursor = jnp.sum(kept).astype(jnp.int32)
        evicted = jnp.sum(live).astype(jnp.int32) - cursor
        overflow = graph.corr_overflow + jnp.maximum(evicted, 0)

        slots = cursor + jnp.arange(append_cap, dtype=jnp.int32)
        tgt = jnp.where(sel_ok, slots, cap)

        def write(arr, vals):
            return arr.at[tgt].set(vals, mode="drop")

        new_corrs = residuals.SparseCorrs(
            img_a=write(corrs.img_a, cand_a[sel]),
            img_b=write(corrs.img_b, jnp.full((append_cap,), 0, jnp.int32) + k_idx),
            p_a=write(corrs.p_a, cand_pa[sel]),
            p_b=write(corrs.p_b, cand_pb[sel]),
            weight=write(corrs.weight, jnp.ones(append_cap, jnp.float32)),
        )
        return new_corrs, cursor + n_new, overflow

    def _no_append(_):
        return graph.corrs, graph.corr_cursor, graph.corr_overflow

    # a keyframe with no surviving matches appends nothing — skipping the
    # compaction entirely keeps the standing correspondence set untouched
    # (no spurious evictions) and skips the sort/top_k work at runtime
    new_corrs, new_cursor, new_overflow = jax.lax.cond(
        n_new > 0, _append, _no_append, None
    )
    graph = graph._replace(
        corrs=new_corrs,
        corr_cursor=new_cursor,
        corr_overflow=new_overflow,
    )

    # --- append dense-term keyframe pairs (top overlapping prev keyframes).
    # dense_overlap_check (s_denseOverlapCheck analog) gates candidates on the
    # full 3-stage filter incl. dense verify; without it any pair with enough
    # Kabsch inliers joins the dense pair list.
    if cfg.dense_pairs_per_kf > 0:
        gate = pair_valid if cfg.dense_overlap_check else (
            (res.inlier_count >= cfg.min_matches_global) & prev_mask
        )
        dscore = jnp.where(gate, res.inlier_count.astype(jnp.float32), -jnp.inf)
        dtop, dsel = jax.lax.top_k(dscore, cfg.dense_pairs_per_kf)
        d_ok = jnp.isfinite(dtop)
        dn = jnp.sum(d_ok).astype(jnp.int32)
        dcap = graph.dense_pairs_a.shape[0]
        dslots = graph.dense_cursor + jnp.arange(cfg.dense_pairs_per_kf, dtype=jnp.int32)
        dtgt = jnp.where(d_ok & (dslots < dcap), dslots, dcap)
        graph = graph._replace(
            dense_pairs_a=graph.dense_pairs_a.at[dtgt].set(dsel, mode="drop"),
            dense_pairs_b=graph.dense_pairs_b.at[dtgt].set(
                jnp.full((cfg.dense_pairs_per_kf,), 0, jnp.int32) + k_idx, mode="drop"
            ),
            dense_pair_on=graph.dense_pair_on.at[dtgt].set(True, mode="drop"),
            dense_cursor=jnp.minimum(graph.dense_cursor + dn, dcap),
            dense_overflow=graph.dense_overflow
            + jnp.maximum(graph.dense_cursor + dn - dcap, 0).astype(jnp.int32),
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
    # dense pairs are appended once at match time; liveness is re-derived
    # every solve so invalidated keyframes drop out of the dense term
    dense_on = (
        graph.dense_pair_on
        & graph.valid[graph.dense_pairs_a]
        & graph.valid[graph.dense_pairs_b]
    )
    problem = gn.GNProblem(
        corrs=graph.corrs,
        dense_pairs_a=graph.dense_pairs_a,
        dense_pairs_b=graph.dense_pairs_b,
        dense_pair_active=dense_on,
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
    return _finish_global_solve(graph, poses, problem, cfg), stats, removed


def _finish_global_solve(graph, poses, problem, cfg):
    """Shared post-solve bookkeeping: store poses/pruned weights and
    invalidate keyframes (except 0) that lost all correspondences — the
    reference's post-opt frame invalidation."""
    kmax = cfg.max_num_images
    corrs = problem.corrs
    w_ok = (corrs.weight > 0).astype(jnp.int32)
    has_corr = jnp.zeros(kmax, jnp.int32)
    has_corr = has_corr.at[corrs.img_a].max(w_ok)
    has_corr = has_corr.at[corrs.img_b].max(w_ok)
    new_valid = graph.valid & ((has_corr > 0) | (jnp.arange(kmax) == 0))
    return graph._replace(poses=poses, corrs=corrs, valid=new_valid)


@functools.partial(jax.jit, static_argnames=("mesh", "cache_cam", "cfg"))
def global_solve_sharded(
    graph: GlobalGraph,
    mesh,  # jax.sharding.Mesh
    cache_cam: CameraModel | None,
    cfg: BundlingConfig,
) -> tuple[GlobalGraph, jax.Array]:
    """Multi-chip global BA (SURVEY.md §2.2 TP): identical semantics to
    `global_solve` — sparse + dense terms, weight ramp, pruning, keyframe
    invalidation — with the system assembly sharded over correspondences and
    the PCG row-sharded across the mesh. Returns (graph, removed)."""
    from ..parallel import sharded_ba

    kmax = cfg.max_num_images
    free = graph.valid & (jnp.arange(kmax) > 0)
    dense_on = (
        graph.dense_pair_on
        & graph.valid[graph.dense_pairs_a]
        & graph.valid[graph.dense_pairs_b]
    )
    problem = gn.GNProblem(
        corrs=graph.corrs,
        dense_pairs_a=graph.dense_pairs_a,
        dense_pairs_b=graph.dense_pairs_b,
        dense_pair_active=dense_on,
        free_mask=free,
    )
    poses, problem, removed = sharded_ba.solve_and_prune_sharded(
        mesh,
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
    return _finish_global_solve(graph, poses, problem, cfg), removed
