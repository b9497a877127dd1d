"""Intra-chunk (local) bundling: one fused program per chunk.

Rebuild of the local half of ``SubmapManager`` + the per-frame ``Bundler``
driver (SURVEY.md §2.1, §3.3): for the S+1 frames of a chunk — SIFT, all-pairs
matching, 3-stage filtering, sparse+dense local BA anchored at the chunk's
first frame (the keyframe), solve verification, and fusion of the chunk's keys
into the keyframe's global key set (``FuseToGlobalKey``).

Where the reference streams one frame at a time through the bundling GPU and
fires the chunk pipeline at chunk boundaries, here the whole chunk is a single
jitted computation over a [S+1, H, W] frame stack.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from ..features import filters, matcher, sift
from ..geometry.camera import CameraModel
from ..ops.preprocess import FrameCache, preprocess_frames
from ..solver import gn, residuals


class ChunkResult(NamedTuple):
    local_traj: jax.Array  # [S+1, 4, 4] frame i -> chunk (frame 0) coords
    chunk_valid: jax.Array  # scalar bool
    keyframe_keys: sift.SiftKeys  # fused keys, p3d in keyframe coords
    keyframe_cache: FrameCache  # frame 0's cache (for global dense verify)
    num_keys: jax.Array  # [S+1] int32
    num_matches: jax.Array  # [P] int32 filtered matches per pair
    pair_valid: jax.Array  # [P] bool
    solve_sparse_res: jax.Array  # [gn_iters]


def _chunk_pairs(num_frames: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    pairs = [(a, b) for a in range(num_frames) for b in range(a + 1, num_frames)]
    return (
        jnp.asarray([p[0] for p in pairs], jnp.int32),
        jnp.asarray([p[1] for p in pairs], jnp.int32),
    )


def fuse_keys_to_keyframe(
    keys: sift.SiftKeys,  # batched [S+1]
    local_traj: jax.Array,  # [S+1, 4, 4]
    frame_valid: jax.Array,  # [S+1] bool
    cfg: BundlingConfig,
    dedup_cell: float = 0.03,
) -> sift.SiftKeys:
    """``FuseToGlobalKey``: merge the chunk's keys into one keyframe key set.

    Key 3D positions move into keyframe coordinates via the optimized local
    trajectory; duplicates (same ~3 cm cell) keep the strongest response, with
    keyframe-native keys preferred. Fully vectorized sort-based dedup.
    """
    s1, cap = keys.valid.shape
    p_kf = jnp.einsum("fij,fkj->fki", local_traj[:, :3, :3], keys.p3d) + local_traj[
        :, None, :3, 3
    ]  # [S+1, K, 3]
    valid = keys.valid & frame_valid[:, None]

    flat = lambda x: x.reshape((s1 * cap,) + x.shape[2:])
    p = flat(p_kf)
    v = flat(valid)
    resp = flat(keys.response)
    # prefer frame-0 keys on ties (their descriptors view the scene from the
    # keyframe's own viewpoint, which is what global matching compares against)
    frame_idx = jnp.repeat(jnp.arange(s1), cap)
    prio = resp + jnp.where(frame_idx == 0, 10.0, 0.0)

    cell = jnp.floor(p / dedup_cell).astype(jnp.int32)
    cell_key = (
        (cell[:, 0] + 512)
        + (cell[:, 1] + 512) * 1024
        + (cell[:, 2] + 512) * 1024 * 1024
    )
    cell_key = jnp.where(v, cell_key, jnp.iinfo(jnp.int32).max)
    # sort by (cell, -priority); first element of each cell wins
    order = jnp.lexsort((-prio, cell_key))
    ck_sorted = cell_key[order]
    first = jnp.concatenate([jnp.array([True]), ck_sorted[1:] != ck_sorted[:-1]])
    keep = first & (ck_sorted != jnp.iinfo(jnp.int32).max)

    score = jnp.where(keep, prio[order], -jnp.inf)
    top, sel = jax.lax.top_k(score, cap)
    pick = order[sel]
    out_valid = jnp.isfinite(top)
    def g(x):
        fx = flat(x)[pick]
        keep = out_valid.reshape((-1,) + (1,) * (fx.ndim - 1))
        return jnp.where(keep, fx, jnp.zeros_like(fx))
    return sift.SiftKeys(
        xy=g(keys.xy),
        sigma=g(keys.sigma),
        response=g(keys.response),
        orientation=g(keys.orientation),
        depth=g(keys.depth),
        p3d=jnp.where(out_valid[:, None], p[pick], 0.0),
        desc=g(keys.desc),
        valid=out_valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cam", "cache_cam", "cfg", "sigma_d", "sigma_r", "filter_depth"),
)
def process_chunk(
    depth_raw: jax.Array,  # [S+1, H, W]
    color: jax.Array,  # [S+1, H, W, 3] RGB — or [S+1, H, W] LUMA (v2 wire)
    cam: CameraModel,
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    sigma_d: float = 2.0,
    sigma_r: float = 0.1,
    filter_depth: bool = True,
) -> ChunkResult:
    """The whole local pipeline for one chunk as a single XLA program.

    Accepts f32 (meters / [0,1]) or compact wire formats — uint16 depth in
    mm; color as RGB (ndim 4) or as a single LUMA plane (ndim 3, the v2
    wire: bundling consumes only intensity, so only Y is shipped).
    Conversion happens on device.
    """
    from ..ops.preprocess import preprocess_frames_y

    s1 = depth_raw.shape[0]
    if color.ndim == 3:  # v2 wire: luma plane
        frames, cache = preprocess_frames_y(
            depth_raw, color, cam, cache_cam,
            sigma_d=sigma_d, sigma_r=sigma_r, filter_depth=filter_depth,
        )
    else:
        if depth_raw.dtype == jnp.uint16:
            depth_raw = depth_raw.astype(jnp.float32) * 1e-3
        if color.dtype == jnp.uint8:
            color = color.astype(jnp.float32) * (1.0 / 255.0)
        frames, cache = preprocess_frames(
            depth_raw,
            color,
            cam,
            cache_cam,
            sigma_d=sigma_d,
            sigma_r=sigma_r,
            filter_depth=filter_depth,
        )
    keys = sift.detect_batch(frames.intensity, frames.depth, cam, cfg)

    pairs_a, pairs_b = _chunk_pairs(s1)
    m = matcher.match_all_pairs(keys, pairs_a, pairs_b, cfg)
    pa, pb = matcher.gather_match_points(keys, pairs_a, pairs_b, m)
    ca = jax.tree.map(lambda x: x[pairs_a], cache)
    cb = jax.tree.map(lambda x: x[pairs_b], cache)
    filt = filters.filter_pairs_batch(
        pa, pb, m, ca, cb, cache_cam, cfg, cfg.min_matches_local
    )

    # --- correspondences from filtered matches ---
    fm = filt.matches  # [P, Mf]
    p_m = fm.valid.shape[1]
    pa_f = keys.p3d[pairs_a[:, None], fm.idx_i]  # [P, Mf, 3]
    pb_f = keys.p3d[pairs_b[:, None], fm.idx_j]
    corrs = residuals.SparseCorrs(
        img_a=jnp.repeat(pairs_a, p_m),
        img_b=jnp.repeat(pairs_b, p_m),
        p_a=pa_f.reshape(-1, 3),
        p_b=pb_f.reshape(-1, 3),
        weight=(fm.valid & filt.pair_valid[:, None]).reshape(-1).astype(jnp.float32),
    )
    # cap the local sparse system at the configured residual capacity
    # (s_maxNumResidualsLocal analog): keep the best-descriptor-distance
    # correspondences; this also bounds the solver's per-chunk matmul sizes
    if corrs.weight.shape[0] > cfg.max_residuals_local:
        score = jnp.where(
            corrs.weight > 0, -(fm.dist.reshape(-1)), -jnp.inf
        )
        _, keep = jax.lax.top_k(score, cfg.max_residuals_local)
        corrs = jax.tree.map(lambda x: x[keep], corrs)
        corrs = corrs._replace(
            weight=jnp.where(jnp.isfinite(score[keep]), corrs.weight, 0.0)
        )

    # --- initial local poses: chain the pairwise filter transforms along
    # consecutive frames (T maps a-cam -> b-cam; frame i in chunk coords =
    # prod of inverses) ---
    consec_idx = jnp.asarray(
        [_pair_index(s1, i, i + 1) for i in range(s1 - 1)], jnp.int32
    )
    from ..geometry import se3 as se3m

    T_rel = filt.transform[consec_idx]  # [S, 4, 4] maps i-cam -> (i+1)-cam
    # local_traj[i] maps i-cam -> 0-cam: T0 = I; Ti = Ti-1 @ inv(T_rel[i-1])
    def chain(carry, Trel):
        nxt = carry @ se3m.mat_inverse(Trel)
        return nxt, nxt

    _, chained = jax.lax.scan(chain, jnp.eye(4), T_rel)
    init_traj = jnp.concatenate([jnp.eye(4)[None], chained], axis=0)

    # --- local BA (anchored at frame 0) ---
    problem = gn.GNProblem(
        corrs=corrs,
        dense_pairs_a=pairs_a,
        dense_pairs_b=pairs_b,
        dense_pair_active=filt.pair_valid,
        free_mask=jnp.arange(s1) > 0,
    )
    solved, problem, stats, _ = gn.solve_and_prune(
        init_traj,
        problem,
        cache,
        cache_cam,
        cfg,
        gn_iters=cfg.local_gn_iters,
        pcg_iters=cfg.local_pcg_iters,
        use_dense=cfg.use_dense_local,
        prune_rounds=2,
    )

    # --- chunk validity: the consecutive-frame chain must hold, and the
    # solved consecutive poses must pass dense verification (verifyOpt) ---
    chain_ok = jnp.all(filt.pair_valid[consec_idx])
    # batched opt-verification of all consecutive solved relative poses
    c_i = jax.tree.map(lambda x: x[:-1], cache)
    c_j = jax.tree.map(lambda x: x[1:], cache)
    T_ij = jnp.einsum(
        "nij,njk->nik", se3m.mat_inverse(solved[1:]), solved[:-1]
    )  # solved relative transform i -> i+1 camera coords
    v = jax.vmap(
        lambda ca_, cb_, T_: filters.dense_verify(ca_, cb_, T_, cache_cam, cfg)
    )(c_i, c_j, T_ij)
    # reference opt-verification (s_verifyOptErrThresh / s_verifyOptCorrThresh):
    # accept the solve only if the mean projective depth error stays below the
    # error threshold AND enough of the frame has verified correspondences
    opt_ok = jnp.all(
        (v.err < cfg.verify_opt_err_thresh) & (v.corr > cfg.verify_opt_corr_thresh)
    )
    chunk_valid = chain_ok & opt_ok

    keyframe_keys = fuse_keys_to_keyframe(
        keys, solved, jnp.ones(s1, bool) & chunk_valid, cfg
    )
    kf_cache = jax.tree.map(lambda x: x[0], cache)

    # NOTE: full-res ProcessedFrames and the per-frame caches are NOT outputs
    # — nothing downstream needs them (integration dequantizes the wire ring
    # on device), and returning them would materialize ~100 MB/chunk at
    # 640x480 that XLA otherwise never has to write out.
    return ChunkResult(
        local_traj=solved,
        chunk_valid=chunk_valid,
        keyframe_keys=keyframe_keys,
        keyframe_cache=kf_cache,
        num_keys=jnp.sum(keys.valid, axis=-1).astype(jnp.int32),
        num_matches=fm.count().astype(jnp.int32),
        pair_valid=filt.pair_valid,
        solve_sparse_res=stats.sparse_res_sum,
    )


def _pair_index(num_frames: int, a: int, b: int) -> int:
    """Index of pair (a, b), a<b, in the _chunk_pairs enumeration."""
    idx = 0
    for i in range(num_frames):
        for j in range(i + 1, num_frames):
            if (i, j) == (a, b):
                return idx
            idx += 1
    raise ValueError((a, b))
