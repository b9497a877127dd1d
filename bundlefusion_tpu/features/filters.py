"""The three-stage geometric correspondence filter.

Rebuild of ``SiftGPU/SIFTMatchFilter`` (SURVEY.md §2.1 "Match filtering"):

  1. :func:`kabsch_filter` — geometric consistency. The reference greedily
     grows a rigid transform over candidate matches with a device-side 3x3 SVD
     and rejects by 3D residual. Here: a fixed-iteration reweighted-trimming
     loop around the batched closed-form Kabsch solve — same fixed point
     (largest self-consistent rigid set), but branch-free and vmappable over
     pairs.
  2. :func:`surface_area_filter` — degeneracy check: PCA spread of the matched
     keys must cover enough surface area in both frames.
  3. :func:`dense_verify_filter` — warp the cached low-res frames with the
     candidate relative pose and require depth/normal/photometric agreement
     (``filterMatchesByDenseVerify``); reuses the same projective machinery as
     the dense BA term.

All filters are batched over pairs; a pair that fails has its matches zeroed
(valid=False), mirroring the reference's "match count zeroed" convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from ..geometry import se3
from ..geometry.camera import CameraModel, project
from ..ops.preprocess import FrameCache, bilinear_sample_matmul
from .matcher import PairMatches


class VerifyStats(NamedTuple):
    """Dense-verification statistics for one ordered frame pair."""

    ok_frac: jax.Array  # agreeing / projected
    overlap: jax.Array  # projected / valid
    err: jax.Array  # mean projective depth error over projected pixels
    corr: jax.Array  # agreeing / valid (verified-correspondence fraction)


class FilterResult(NamedTuple):
    matches: PairMatches  # filtered, fixed capacity [..., Mf]
    transform: jax.Array  # [..., 4, 4] relative transform a->b frame (T_ba: p_b = T @ p_a)
    pair_valid: jax.Array  # [...] bool — pair survived all filters
    inlier_count: jax.Array  # [...] int32


def kabsch_filter(
    pa: jax.Array,  # [M, 3] matched 3D points in frame a (camera space)
    pb: jax.Array,  # [M, 3] matched 3D points in frame b
    valid: jax.Array,  # [M] bool
    cfg: BundlingConfig,
    num_iters: int = 6,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Largest self-consistent rigid set via iterative trimming.

    Returns (T_ba [4,4], inlier mask [M], ok flag). T maps frame-a camera
    points onto frame-b camera points.
    """
    w0 = valid.astype(pa.dtype)

    def body(_, w):
        T = se3.kabsch(pa, pb, w)
        res = jnp.linalg.norm(se3.transform_points(T, pa) - pb, axis=-1)
        # soft trimming: keep matches under the residual threshold
        keep = (res < cfg.kabsch_max_res_thresh) & valid
        # guard: if everything got trimmed, fall back to original weights
        any_keep = jnp.any(keep)
        return jnp.where(any_keep, keep.astype(pa.dtype), w)

    w = jax.lax.fori_loop(0, num_iters, body, w0)
    T = se3.kabsch(pa, pb, w)
    res = jnp.linalg.norm(se3.transform_points(T, pa) - pb, axis=-1)
    inliers = (res < cfg.kabsch_max_res_thresh) & valid
    count = jnp.sum(inliers)
    ok = count >= cfg.kabsch_min_inliers
    return T, inliers, ok


def surface_area_filter(
    pa: jax.Array,  # [M, 3]
    pb: jax.Array,  # [M, 3]
    inliers: jax.Array,  # [M] bool
    cfg: BundlingConfig,
) -> jax.Array:
    """Degeneracy check (``filterMatchesBySurfaceArea``): the inlier points,
    projected onto their two principal axes, must span enough area in BOTH
    frames. Tiny 3x3 eigen-problems — negligible compute."""

    def spread(p):
        w = inliers.astype(p.dtype)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu = jnp.einsum("m,mi->i", w, p) / wsum
        d = (p - mu) * w[:, None]
        cov = d.T @ d / wsum
        evals = jnp.linalg.eigvalsh(cov)  # ascending
        # extent along the two dominant axes ~ sqrt(eigenvalue); area proxy
        return jnp.sqrt(jnp.maximum(evals[-1], 0.0)) * jnp.sqrt(
            jnp.maximum(evals[-2], 0.0)
        )

    return (spread(pa) > cfg.surf_area_pca_thresh) & (
        spread(pb) > cfg.surf_area_pca_thresh
    )


def dense_verify(
    cache_a: FrameCache,  # single-frame cache entries (no leading axis)
    cache_b: FrameCache,
    T_ba: jax.Array,  # [4, 4] maps a-camera points into b-camera space
    cam: CameraModel,  # cache-resolution intrinsics
    cfg: BundlingConfig,
) -> "VerifyStats":
    """Project frame a's cached points into frame b and measure agreement.

    Returns VerifyStats: fraction of projected pixels that agree in
    depth+normal+intensity, fraction of a's valid pixels that project into b
    at all, the mean projective depth error over projected pixels (the
    reference's opt-verification error, s_verifyOptErrThresh), and the
    fraction of valid pixels with a verified correspondence
    (s_verifyOptCorrThresh). Symmetrized by the caller if desired.
    """
    pts_a = cache_a.points.reshape(-1, 3)
    valid_a = cache_a.depth.reshape(-1) > 0.0
    pts_in_b = se3.transform_points(T_ba, pts_a)
    uv, proj_ok = project(cam, pts_in_b)
    # one separable-matmul gather for all 5 channels (MXU path; see
    # preprocess.bilinear_sample_matmul)
    stack_b = jnp.concatenate(
        [cache_b.depth[..., None], cache_b.normals, cache_b.intensity[..., None]],
        axis=-1,
    )
    samp, inb = bilinear_sample_matmul(stack_b, uv)
    depth_b = samp[:, 0]
    normal_b = samp[:, 1:4]
    inten_b = samp[:, 4]
    proj_ok = proj_ok & inb & valid_a & (depth_b > 0.0)

    dist = jnp.abs(pts_in_b[:, 2] - depth_b)
    n_a = se3.rotate_vectors(T_ba, cache_a.normals.reshape(-1, 3))
    nb_norm = normal_b / jnp.maximum(jnp.linalg.norm(normal_b, axis=-1, keepdims=True), 1e-9)
    ndot = jnp.sum(n_a * nb_norm, axis=-1)
    dint = jnp.abs(cache_a.intensity.reshape(-1) - inten_b)

    agree = (
        proj_ok
        & (dist < cfg.verify_dist_thresh)
        & (ndot > cfg.verify_normal_thresh)
        & (dint < cfg.verify_color_thresh)
    )
    n_valid = jnp.maximum(jnp.sum(valid_a), 1)
    n_proj = jnp.sum(proj_ok)
    ok_frac = jnp.sum(agree) / jnp.maximum(n_proj, 1)
    overlap = n_proj / n_valid
    err = jnp.sum(jnp.where(proj_ok, dist, 0.0)) / jnp.maximum(n_proj, 1)
    corr = jnp.sum(agree) / n_valid
    return VerifyStats(ok_frac=ok_frac, overlap=overlap, err=err, corr=corr)


def dense_verify_filter(
    cache_a: FrameCache,
    cache_b: FrameCache,
    T_ba: jax.Array,
    cam: CameraModel,
    cfg: BundlingConfig,
) -> jax.Array:
    """Symmetric pass/fail dense verification for one pair."""
    v_ab = dense_verify(cache_a, cache_b, T_ba, cam, cfg)
    v_ba = dense_verify(cache_b, cache_a, se3.mat_inverse(T_ba), cam, cfg)
    ok_frac = 0.5 * (v_ab.ok_frac + v_ba.ok_frac)
    overlap = 0.5 * (v_ab.overlap + v_ba.overlap)
    return (ok_frac > cfg.verify_ok_fraction) & (overlap > cfg.verify_min_overlap)


def filter_pair(
    pa: jax.Array,  # [M, 3]
    pb: jax.Array,  # [M, 3]
    matches: PairMatches,  # [M] capacity
    cache_a: FrameCache,
    cache_b: FrameCache,
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    min_matches: int,
    use_dense_verify: bool = True,
) -> FilterResult:
    """Run the full 3-stage filter for one pair. vmap over pairs at call site."""
    T, inliers, kabsch_ok = kabsch_filter(pa, pb, matches.valid, cfg)
    area_ok = surface_area_filter(pa, pb, inliers, cfg)
    if use_dense_verify:
        dense_ok = dense_verify_filter(cache_a, cache_b, T, cache_cam, cfg)
    else:
        dense_ok = jnp.array(True)
    count = jnp.sum(inliers)
    pair_ok = kabsch_ok & area_ok & dense_ok & (count >= min_matches)

    # compact inlier matches into the filtered capacity, best-distance first
    mf = cfg.max_matches_per_pair_filtered
    score = jnp.where(inliers & pair_ok, -matches.dist, -jnp.inf)
    top, sel = jax.lax.top_k(score, mf)
    fvalid = jnp.isfinite(top)
    filtered = PairMatches(
        idx_i=jnp.where(fvalid, matches.idx_i[sel], 0),
        idx_j=jnp.where(fvalid, matches.idx_j[sel], 0),
        dist=jnp.where(fvalid, matches.dist[sel], jnp.inf),
        valid=fvalid,
    )
    return FilterResult(
        matches=filtered,
        transform=jnp.where(pair_ok, T, jnp.eye(4, dtype=T.dtype)),
        pair_valid=pair_ok,
        inlier_count=count.astype(jnp.int32),
    )


def filter_pairs_batch(
    keys_p3d_a: jax.Array,  # [P, M, 3]
    keys_p3d_b: jax.Array,  # [P, M, 3]
    matches: PairMatches,  # batched [P, M]
    caches_a: FrameCache,  # batched [P, ...]
    caches_b: FrameCache,
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    min_matches: int,
    use_dense_verify: bool = True,
) -> FilterResult:
    fn = jax.vmap(
        lambda pa, pb, m, ca, cb: filter_pair(
            pa, pb, m, ca, cb, cache_cam, cfg, min_matches, use_dense_verify
        )
    )
    return fn(keys_p3d_a, keys_p3d_b, matches, caches_a, caches_b)
