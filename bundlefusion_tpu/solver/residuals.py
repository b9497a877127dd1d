"""Residuals and hand Jacobians for sparse+dense bundle adjustment.

Rebuild of the reference's solver equation headers
(``CUDASolverBundling/SolverBundlingEquations(.Lie).h`` — sparse 3D-3D term;
``SolverBundlingDenseUtil.h`` — dense point-to-plane depth + photometric
terms; SURVEY.md §2.1 "BA kernels"). Only the Lie (se3) parameterization is
implemented (the reference's ``USE_LIE_SPACE`` path); Euler is dropped.

Convention: pose T maps camera points to world; the GN update perturbs on the
left, T' = exp(xi) T with twist xi = (omega, upsilon). For a world point
p = T p_cam the derivative is  d p / d xi = [ -hat(p) | I3 ]  (3x6).

Everything is built around *pairs* (a, b) of images: each term contributes a
12-column Jacobian row block ([6 for pose a | 6 for pose b]), accumulated into
per-pair JtJ [P, 12, 12] / Jtr [P, 12] via batched matmuls (MXU) or
segment_sum (deterministic — replaces the reference's float atomics, SURVEY.md
§5 "Race detection"). The assembly into the global system lives in
``system.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BundlingConfig
from ..geometry import se3
from ..geometry.camera import CameraModel, project
from ..ops.preprocess import FrameCache, bilinear_sample_matmul


class SparseCorrs(NamedTuple):
    """Fixed-capacity sparse 3D-3D correspondence store.

    The rebuild of the reference's ``EntryJ`` correspondence buffer
    (``SIFTImageManager`` residual entries): camera-space endpoints of matched
    keys plus the two image indices, one entry per correspondence.
    weight == 0 disables a slot.
    """

    img_a: jax.Array  # [R] int32 image index of endpoint a
    img_b: jax.Array  # [R] int32 image index of endpoint b
    p_a: jax.Array  # [R, 3] camera-space point in image a
    p_b: jax.Array  # [R, 3] camera-space point in image b
    weight: jax.Array  # [R] float32 (0 = empty/pruned slot)

    @property
    def capacity(self) -> int:
        return self.img_a.shape[0]


def empty_corrs(capacity: int) -> SparseCorrs:
    return SparseCorrs(
        img_a=jnp.zeros(capacity, jnp.int32),
        img_b=jnp.zeros(capacity, jnp.int32),
        p_a=jnp.zeros((capacity, 3), jnp.float32),
        p_b=jnp.zeros((capacity, 3), jnp.float32),
        weight=jnp.zeros(capacity, jnp.float32),
    )


def point_jacobian(p_world: jax.Array) -> jax.Array:
    """d(p_world)/d(twist) = [-hat(p) | I] : [..., 3] -> [..., 3, 6]."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p_world.dtype), p_world.shape[:-1] + (3, 3))
    return jnp.concatenate([-se3.hat(p_world), eye], axis=-1)


# ---------------------------------------------------------------------------
# Sparse 3D-3D term
# ---------------------------------------------------------------------------


def sparse_residuals(
    poses: jax.Array,  # [N, 4, 4]
    corrs: SparseCorrs,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Residuals r_k = T_a p_a - T_b p_b and 12-col Jacobians.

    Returns (r [R, 3], J [R, 3, 12], res_norm [R]).
    """
    Ta = poses[corrs.img_a]
    Tb = poses[corrs.img_b]
    pa_w = se3.transform_points(Ta, corrs.p_a)
    pb_w = se3.transform_points(Tb, corrs.p_b)
    r = pa_w - pb_w
    Ja = point_jacobian(pa_w)  # [R, 3, 6]
    Jb = -point_jacobian(pb_w)
    J = jnp.concatenate([Ja, Jb], axis=-1)  # [R, 3, 12]
    return r, J, jnp.linalg.norm(r, axis=-1)


def sparse_corr_blocks(
    poses: jax.Array,
    corrs: SparseCorrs,
    weight_sparse: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-correspondence normal-equation blocks from the sparse term.

    Returns (JtJ [R, 12, 12], Jtr [R, 12], res_norm [R]); assembly scatters
    them by (img_a, img_b) — same machinery as the dense pair blocks.
    """
    r, J, rn = sparse_residuals(poses, corrs)
    w = corrs.weight * weight_sparse
    JtJ_k = jnp.einsum("kri,krj->kij", J, J * w[:, None, None])  # [R, 12, 12]
    Jtr_k = jnp.einsum("kri,kr->ki", J, r * w[:, None])  # [R, 12]
    return JtJ_k, Jtr_k, rn


# ---------------------------------------------------------------------------
# Dense terms (point-to-plane depth + photometric)
# ---------------------------------------------------------------------------


class DenseStats(NamedTuple):
    num_valid_depth: jax.Array  # [P] int32 pixels contributing to depth term
    num_valid_color: jax.Array  # [P]
    sum_sq_depth: jax.Array  # [P] float32
    sum_sq_color: jax.Array  # [P]


def _dense_pair_system(
    Ta: jax.Array,
    Tb: jax.Array,
    cache_a: FrameCache,  # single frame
    cache_b: FrameCache,
    cam: CameraModel,  # cache-resolution intrinsics
    cfg: BundlingConfig,
    weight_depth: float,
    weight_color: float,
):
    """The rebuild of ``SolverBundling.cu :: BuildDenseSystem`` for one pair.

    Projective data association from a's cached pixels into b, then
    point-to-plane depth + photometric residuals with analytic Jacobians,
    reduced to (JtJ [12,12], Jtr [12], stats) with one matmul.
    """
    h, w = cache_a.depth.shape
    pts_a = cache_a.points.reshape(-1, 3)  # [M, 3] a-camera space
    valid_a = cache_a.depth.reshape(-1) > 0.0

    Tb_inv = se3.mat_inverse(Tb)
    Rb_inv = Tb_inv[:3, :3]
    p_aw = se3.transform_points(Ta, pts_a)  # world
    p_in_b = se3.transform_points(Tb_inv, p_aw)  # b-camera
    uv, proj_ok = project(cam, p_in_b)

    # --- samples from b: all 10 channels in ONE separable matmul gather ---
    stack_b = jnp.concatenate(
        [
            cache_b.points,
            cache_b.normals,
            cache_b.intensity[..., None],
            cache_b.grad,
            cache_b.depth[..., None],
        ],
        axis=-1,
    )  # [h, w, 10]
    samp, inb = bilinear_sample_matmul(stack_b, uv)
    q_b = samp[:, 0:3]  # b-camera points
    n_b = samp[:, 3:6]
    i_b = samp[:, 6]
    g_b = samp[:, 7:9]  # (gx, gy)
    d_b = samp[:, 9]

    n_b_norm = jnp.linalg.norm(n_b, axis=-1, keepdims=True)
    n_b = n_b / jnp.maximum(n_b_norm, 1e-9)
    q_w = se3.transform_points(Tb, q_b)
    n_w = se3.rotate_vectors(Tb, n_b)

    diff = p_aw - q_w
    dist = jnp.linalg.norm(diff, axis=-1)
    n_a_w = se3.rotate_vectors(Ta, cache_a.normals.reshape(-1, 3))
    ndot = jnp.sum(n_a_w * n_w, axis=-1)

    assoc_ok = (
        valid_a
        & proj_ok
        & inb
        & (d_b > 0.0)
        & (n_b_norm[:, 0] > 0.5)
        & (dist < cfg.dense_dist_thresh)
        & (ndot > cfg.dense_normal_thresh)
    )

    # --- depth point-to-plane: r = n_w . (p_aw - q_w) ---
    # a side: dr = n_w.(w x p_aw + v) = w.(p_aw x n_w) + n_w.v
    r_d = jnp.sum(n_w * diff, axis=-1)
    Jd_a = jnp.concatenate([jnp.cross(p_aw, n_w), n_w], axis=-1)
    # b side: dr = diff.(w x n_w) - n_w.(w x q_w + v) = w.(n_w x diff - q_w x n_w) - n_w.v
    Jd_b = jnp.concatenate(
        [jnp.cross(n_w, diff) - jnp.cross(q_w, n_w), -n_w], axis=-1
    )
    J_d = jnp.concatenate([Jd_a, Jd_b], axis=-1)  # [M, 12]
    w_d = jnp.where(assoc_ok, weight_depth, 0.0)

    # --- photometric: r = I_a - I_b(pi(h)), h = p_in_b ---
    i_a = cache_a.intensity.reshape(-1)
    r_c = i_a - i_b
    z = jnp.maximum(p_in_b[:, 2], 1e-6)
    # dpi/dh [M, 2, 3]
    dpi = jnp.stack(
        [
            jnp.stack([cam.fx / z, jnp.zeros_like(z), -cam.fx * p_in_b[:, 0] / (z * z)], axis=-1),
            jnp.stack([jnp.zeros_like(z), cam.fy / z, -cam.fy * p_in_b[:, 1] / (z * z)], axis=-1),
        ],
        axis=-2,
    )
    # dh/dxi_a = Rb_inv @ [-hat(p_aw) | I]
    dh_da = jnp.einsum("ij,mjk->mik", Rb_inv, point_jacobian(p_aw))  # [M, 3, 6]
    g_dpi = jnp.einsum("mc,mck->mk", g_b, dpi)  # [M, 3] image-gradient chain
    Jc_a = -jnp.einsum("mk,mkj->mj", g_dpi, dh_da)  # [M, 6]
    Jc_b = -Jc_a
    J_c = jnp.concatenate([Jc_a, Jc_b], axis=-1)  # [M, 12]
    grad_mag = jnp.linalg.norm(g_b, axis=-1)
    color_ok = (
        assoc_ok
        & (jnp.abs(r_c) < cfg.dense_color_thresh)
        & (grad_mag > cfg.dense_color_grad_min)
    )
    w_c = jnp.where(color_ok, weight_color, 0.0)

    # --- reduce to normal equations: one [12, M] x [M, 12] matmul each ---
    JtJ = jnp.einsum("mi,m,mj->ij", J_d, w_d, J_d) + jnp.einsum(
        "mi,m,mj->ij", J_c, w_c, J_c
    )
    Jtr = jnp.einsum("mi,m->i", J_d, w_d * r_d) + jnp.einsum("mi,m->i", J_c, w_c * r_c)
    stats = DenseStats(
        num_valid_depth=jnp.sum(assoc_ok).astype(jnp.int32),
        num_valid_color=jnp.sum(color_ok).astype(jnp.int32),
        sum_sq_depth=jnp.sum(jnp.where(assoc_ok, r_d * r_d, 0.0)),
        sum_sq_color=jnp.sum(jnp.where(color_ok, r_c * r_c, 0.0)),
    )
    return JtJ, Jtr, stats


def dense_pair_blocks(
    poses: jax.Array,  # [N, 4, 4]
    pairs_a: jax.Array,  # [P]
    pairs_b: jax.Array,  # [P]
    pair_active: jax.Array,  # [P] bool — skip contributions of inactive pairs
    caches: FrameCache,  # batched [N, ...]
    cache_cam: CameraModel,
    cfg: BundlingConfig,
    weight_depth: float,
    weight_color: float,
) -> tuple[jax.Array, jax.Array, DenseStats]:
    """Dense normal-equation blocks for every active pair (vmapped).

    Returns (JtJ [P, 12, 12], Jtr [P, 12], stats). The per-pair reductions are
    batched [P, M, 12] matmuls — the MXU centerpiece the survey calls out.
    """
    ca = jax.tree.map(lambda x: x[pairs_a], caches)
    cb = jax.tree.map(lambda x: x[pairs_b], caches)
    fn = jax.vmap(
        lambda Ta, Tb, c1, c2: _dense_pair_system(
            Ta, Tb, c1, c2, cache_cam, cfg, weight_depth, weight_color
        )
    )
    JtJ, Jtr, stats = fn(poses[pairs_a], poses[pairs_b], ca, cb)
    act = pair_active.astype(JtJ.dtype)
    return (
        JtJ * act[:, None, None],
        Jtr * act[:, None],
        DenseStats(
            stats.num_valid_depth * pair_active,
            stats.num_valid_color * pair_active,
            stats.sum_sq_depth * act,
            stats.sum_sq_color * act,
        ),
    )
