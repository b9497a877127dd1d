"""TSDF raycasting for live preview / model views.

Rebuild of ``CUDARayCastSDF.cu`` + ``RayCastSDFUtil.h`` (SURVEY.md §2.1
"Raycaster", §3.2 hot loop 2). The reference bounds each ray with a DX11
rasterization of block AABBs ("ray interval splatting"); a graphics API has no
TPU analog, so the same bounds come from compute:

  phase 1 (splat): scatter-min/max every block's projected depth interval into
    a coarse pixel-tile grid (:func:`splat_intervals`);
  phase 2 (fine): march only inside the tile's [near, far] at a fraction of
    the truncation with trilinear TSDF sampling, detect the +/- zero crossing,
    and refine by linear interpolation.

Everything is a fixed-iteration `fori_loop` over masked lanes — divergence
becomes predication, which is what the VPU wants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import AppConfig
from ..geometry import se3
from ..geometry.camera import CameraModel, project
from .blocks import BLOCK, INVALID_KEY, BlockTable, sample_trilinear


class RaycastResult(NamedTuple):
    depth: jax.Array  # [H, W] float32 (0 = miss)
    normal: jax.Array  # [H, W, 3]
    color: jax.Array  # [H, W, 3]
    hit: jax.Array  # [H, W] bool
    splat_truncated: jax.Array  # int32 — tile coverage dropped by the splat
    # window cap (blocks closer than the derived span limit lose far tiles;
    # rays there may miss geometry — counted, like every capacity edge)


def splat_span(cam: CameraModel, cfg: AppConfig, tile: int = 16, cap: int = 8) -> int:
    """Static per-axis tile span of the splat scatter window, derived from the
    worst-case projected block footprint (block bounding sphere at depth_min).
    Capped to bound the unrolled scatter; the residual truncation beyond the
    cap is what ``splat_intervals`` counts."""
    import math

    rad = 0.5 * BLOCK * cfg.voxel_size * math.sqrt(3.0)
    pr_max = rad * max(cam.fx, cam.fy) / max(cfg.depth_min, 1e-3)
    needed = int(math.ceil(2.0 * pr_max / tile)) + 1
    return max(2, min(needed, cap))


def splat_intervals(
    table: BlockTable,
    pose_c2w: jax.Array,
    cam: CameraModel,
    cfg: AppConfig,
    tile: int = 16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-tile ray interval bounds from block AABB projection.

    The compute-only replacement for the reference's DX11 ray-interval
    splatting (``DX11RayIntervalSplatting`` + HLSL shaders — the one
    CUDA<->graphics interop in its hot path): project every active block's
    bounding sphere, scatter-min/max camera depth into a [H/tile, W/tile]
    grid. Rays then march only inside [near, far] of their tile.

    Returns (near [th, tw], far [th, tw], truncated_tiles int32) in camera-z;
    far==0 marks empty. ``truncated_tiles`` counts block-tile coverage dropped
    by the bounded scatter window (see :func:`splat_span`).
    """
    from .blocks import unpack_key

    th = -(-cam.height // tile)
    tw = -(-cam.width // tile)
    coords = unpack_key(table.key_of_slot)
    ext = BLOCK * cfg.voxel_size
    ctr = (coords.astype(jnp.float32) + 0.5) * ext
    w2c = se3.mat_inverse(pose_c2w)
    p_cam = se3.transform_points(w2c, ctr)  # [C, 3]
    z = p_cam[:, 2]
    rad = 0.5 * ext * jnp.sqrt(3.0)
    act = (table.key_of_slot != INVALID_KEY) & (z > rad)
    zs = jnp.where(act, z, 1.0)
    uv, _ = project(cam, p_cam)
    # projected radius in pixels (conservative)
    pr = rad * cam.fx / zs
    u0 = jnp.clip(((uv[:, 0] - pr) / tile).astype(jnp.int32), 0, tw - 1)
    u1 = jnp.clip(((uv[:, 0] + pr) / tile).astype(jnp.int32), 0, tw - 1)
    v0 = jnp.clip(((uv[:, 1] - pr) / tile).astype(jnp.int32), 0, th - 1)
    v1 = jnp.clip(((uv[:, 1] + pr) / tile).astype(jnp.int32), 0, th - 1)
    on_screen = act & (uv[:, 0] + pr > 0) & (uv[:, 0] - pr < cam.width) & (
        uv[:, 1] + pr > 0
    ) & (uv[:, 1] - pr < cam.height)

    near = jnp.full((th, tw), jnp.inf, jnp.float32)
    far = jnp.zeros((th, tw), jnp.float32)
    # blocks span few tiles; bounded unrolled scatter over the covered window,
    # sized from the worst-case footprint the config admits (capped)
    max_span = splat_span(cam, cfg, tile)
    sentinel = th * tw
    for dv in range(max_span):
        for du in range(max_span):
            tu = jnp.minimum(u0 + du, u1)
            tv = jnp.minimum(v0 + dv, v1)
            flat = jnp.where(
                on_screen & (u0 + du <= u1) & (v0 + dv <= v1), tv * tw + tu, sentinel
            )
            near = near.reshape(-1).at[flat].min(z - rad, mode="drop").reshape(th, tw)
            far = far.reshape(-1).at[flat].max(z + rad, mode="drop").reshape(th, tw)
    near = jnp.where(jnp.isfinite(near), jnp.maximum(near, cfg.depth_min), 0.0)
    span_u = u1 - u0 + 1
    span_v = v1 - v0 + 1
    dropped = span_u * span_v - jnp.minimum(span_u, max_span) * jnp.minimum(
        span_v, max_span
    )
    truncated = jnp.sum(jnp.where(on_screen, dropped, 0)).astype(jnp.int32)
    return near, far, truncated


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def raycast(
    table: BlockTable,
    pose_c2w: jax.Array,  # [4, 4] camera-to-world of the view
    cam: CameraModel,
    cfg: AppConfig,
) -> RaycastResult:
    h, w = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dirs_cam = jnp.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)], axis=-1)
    R = pose_c2w[:3, :3]
    origin = pose_c2w[:3, 3]
    dirs = jnp.einsum("ij,hwj->hwi", R, dirs_cam)
    inv_norm = 1.0 / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_n = dirs * inv_norm

    t_min = cfg.depth_min
    block_step = BLOCK * cfg.voxel_size * 0.8

    # --- phase 1: per-tile ray intervals from block AABB splatting (the
    # compute-only stand-in for the reference's DX11 interval rasterization) ---
    tile = 16
    near, far, splat_trunc = splat_intervals(table, pose_c2w, cam, cfg, tile=tile)
    tv = (v / tile).astype(jnp.int32)
    tu = (u / tile).astype(jnp.int32)
    near_px = near[tv, tu]  # camera-z bounds per pixel
    far_px = far[tv, tu]
    ray_scale = 1.0 / inv_norm[..., 0]  # t (unit-ray dist) = z * |dirs_cam|
    t = jnp.maximum(near_px * ray_scale - block_step, t_min)
    t_far = far_px * ray_scale + block_step
    empty = far_px <= 0.0

    # --- phase 2: fine march with trilinear TSDF, find zero crossing ---
    fine_step = cfg.truncation * cfg.raycast_step_scale

    def fine(_, carry):
        t, prev_sdf, prev_t, hit_t, hit = carry
        p = (origin + dirs_n * t[..., None]).reshape(-1, 3)
        sdf, _, valid = sample_trilinear(table, p, cfg.voxel_size)
        sdf = sdf.reshape(h, w)
        valid = valid.reshape(h, w) & ~empty & (t <= t_far)
        crossing = valid & jnp.isfinite(prev_sdf) & (prev_sdf > 0) & (sdf <= 0) & ~hit
        # linear interpolation of the crossing point
        denom = prev_sdf - sdf
        alpha = jnp.where(jnp.abs(denom) > 1e-9, prev_sdf / jnp.maximum(denom, 1e-9), 0.0)
        t_cross = prev_t + alpha * (t - prev_t)
        hit_t = jnp.where(crossing, t_cross, hit_t)
        hit = hit | crossing
        # adaptive stepping: far from surface move by |sdf| (sphere-trace-like),
        # but at least a fraction of a voxel, at most a block
        step = jnp.clip(jnp.abs(sdf), cfg.voxel_size, block_step)
        step = jnp.where(valid, jnp.minimum(step, fine_step), fine_step)
        prev_sdf = jnp.where(valid, sdf, prev_sdf)
        prev_t = jnp.where(valid, t, prev_t)
        done = hit | empty | (t > t_far)
        t = jnp.where(done, t, t + step)
        return t, prev_sdf, prev_t, hit_t, hit

    init = (
        t,
        jnp.full((h, w), jnp.inf, jnp.float32),  # prev sdf
        t,
        jnp.zeros((h, w), jnp.float32),
        jnp.zeros((h, w), bool),
    )
    _, _, _, hit_t, hit = jax.lax.fori_loop(0, cfg.raycast_max_steps, fine, init)

    # --- shade: normals from SDF central differences, color trilinear ---
    p_hit = origin + dirs_n * hit_t[..., None]
    eps = cfg.voxel_size
    grads = []
    for axis in range(3):
        off = jnp.zeros(3, jnp.float32).at[axis].set(eps)
        s_p, _, _ = sample_trilinear(table, (p_hit + off).reshape(-1, 3), cfg.voxel_size)
        s_m, _, _ = sample_trilinear(table, (p_hit - off).reshape(-1, 3), cfg.voxel_size)
        grads.append((s_p - s_m).reshape(h, w))
    nrm = jnp.stack(grads, axis=-1)
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    normal = jnp.where((nn > 1e-9) & jnp.isfinite(nn), nrm / jnp.maximum(nn, 1e-9), 0.0)
    _, color, cvalid = sample_trilinear(table, p_hit.reshape(-1, 3), cfg.voxel_size)
    color = jnp.where(hit[..., None], color.reshape(h, w, 3), 0.0)

    # hit_t is distance along the unit ray; camera-z depth = t / |dirs_cam|
    depth_out = jnp.where(hit, hit_t * inv_norm[..., 0], 0.0)
    return RaycastResult(
        depth=depth_out, normal=normal, color=color, hit=hit,
        splat_truncated=splat_trunc,
    )


def shade_preview(result: RaycastResult, light_dir=(0.3, -0.5, 0.8)) -> jax.Array:
    """Simple lambertian shading of a raycast for PNG preview dumps — the
    headless stand-in for the reference's DX11PhongLighting view."""
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    lam = jnp.clip(jnp.abs(jnp.einsum("hwc,c->hw", result.normal, l)), 0.15, 1.0)
    img = result.color * lam[..., None]
    return jnp.where(result.hit[..., None], img, 0.1)
